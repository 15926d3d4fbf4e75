package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** [EXT] Bounded-heap top-k aggregation — the map-side pre-reduction
  * under batch similarity search.
  *
  * Why it exists: the obvious per-group top-k (window `row_number`
  * then `rk <= k`) shuffles EVERY scored row to the group's reducer
  * before any row is discarded — for batch kNN that is |corpus| ×
  * |queries| rows through the exchange. This aggregator keeps a
  * size-k min-heap per group in the partial (map-side) aggregate, so
  * the exchange carries at most k rows per (group × partition):
  * the shuffle is bounded by k × partitions, independent of corpus
  * size — the same partial-agg contract as `max()`, generalized to
  * the k best.
  *
  * Determinism: ordering is (score DESC, id ASC) — ties cannot
  * reorder across partitionings. Null scores are skipped in
  * `reduce`, so zero-norm cosine rows (null by the [[Kernels.cosine]]
  * contract) never occupy a heap slot. `finish` emits the heap
  * sorted, so downstream `posexplode` ranks 1..k deterministically.
  *
  * The heap buffer rides Kryo like [[CappedCollect]]'s: live JVM
  * object per group under hash aggregation, serialized only on
  * spill / partial-agg exchange.
  */
object TopKHeap {

  /** One retained candidate. */
  final case class Scored(score: Double, id: Long)

  /** Binary min-heap on (score ASC, id DESC) — the root is the
    * WORST retained candidate, so a better arrival replaces it in
    * O(log k) with zero allocation.
    */
  final class Heap(val k: Int) extends Serializable {
    val scores = new Array[Double](k)
    val ids = new Array[Long](k)
    var n = 0

    // heap order: a is "worse" than b (closer to eviction)
    private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
      sa < sb || (sa == sb && ia > ib)

    private def siftDown(i0: Int): Unit = {
      var i = i0
      while (true) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < n && worse(scores(l), ids(l), scores(m), ids(m))) m = l
        if (r < n && worse(scores(r), ids(r), scores(m), ids(m))) m = r
        if (m == i) return
        val ts = scores(i); scores(i) = scores(m); scores(m) = ts
        val ti = ids(i); ids(i) = ids(m); ids(m) = ti
        i = m
      }
    }

    def offer(s: Double, id: Long): Unit =
      if (n < k) {
        scores(n) = s; ids(n) = id; n += 1
        if (n == k) { // heapify once, when full
          var i = k / 2 - 1
          while (i >= 0) { siftDown(i); i -= 1 }
        }
      } else if (worse(scores(0), ids(0), s, id)) {
        scores(0) = s; ids(0) = id; siftDown(0)
      }
  }

  final class TopKAgg(k: Int)
      extends Aggregator[(java.lang.Double, Long), Heap, Seq[Scored]] {
    def zero: Heap = new Heap(k)
    def reduce(h: Heap, a: (java.lang.Double, Long)): Heap = {
      if (a._1 != null) h.offer(a._1, a._2)
      h
    }
    def merge(x: Heap, y: Heap): Heap = {
      var i = 0
      while (i < y.n) { x.offer(y.scores(i), y.ids(i)); i += 1 }
      x
    }
    def finish(h: Heap): Seq[Scored] =
      (0 until h.n).map(i => Scored(h.scores(i), h.ids(i)))
        .sortBy(s => (-s.score, s.id))
    def bufferEncoder: Encoder[Heap] = Encoders.kryo[Heap]
    def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** array<struct<score,id>> of the k best rows per group, sorted
    * (score DESC, id ASC); null scores ignored.
    */
  def topK(score: Column, id: Column, k: Int): Column = {
    require(k > 0, s"k must be positive: $k")
    udaf(new TopKAgg(k),
      Encoders.tuple(Encoders.DOUBLE, Encoders.scalaLong)).apply(score, id)
  }

  /** One retained candidate of [[minK]]. */
  final case class KeyedId(key: Long, id: Long)

  /** Binary max-heap on (key DESC, id DESC): the root is the LARGEST
    * retained (key, id), evicted when a smaller one arrives — keeps
    * the k smallest. Long keys, not double: a 60-bit hash does not
    * survive a double mantissa, and hash-order selection must be
    * exact.
    */
  final class MinHeap(val k: Int) extends Serializable {
    val keys = new Array[Long](k)
    val ids = new Array[Long](k)
    var n = 0

    private def worse(ka: Long, ia: Long, kb: Long, ib: Long): Boolean =
      ka > kb || (ka == kb && ia > ib)

    private def siftDown(i0: Int): Unit = {
      var i = i0
      while (true) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < n && worse(keys(l), ids(l), keys(m), ids(m))) m = l
        if (r < n && worse(keys(r), ids(r), keys(m), ids(m))) m = r
        if (m == i) return
        val tk = keys(i); keys(i) = keys(m); keys(m) = tk
        val ti = ids(i); ids(i) = ids(m); ids(m) = ti
        i = m
      }
    }

    def offer(key: Long, id: Long): Unit =
      if (n < k) {
        keys(n) = key; ids(n) = id; n += 1
        if (n == k) {
          var i = k / 2 - 1
          while (i >= 0) { siftDown(i); i -= 1 }
        }
      } else if (worse(keys(0), ids(0), key, id)) {
        keys(0) = key; ids(0) = id; siftDown(0)
      }
  }

  final class MinKAgg(k: Int)
      extends Aggregator[(Long, Long), MinHeap, Seq[KeyedId]] {
    def zero: MinHeap = new MinHeap(k)
    def reduce(h: MinHeap, a: (Long, Long)): MinHeap = { h.offer(a._1, a._2); h }
    def merge(x: MinHeap, y: MinHeap): MinHeap = {
      var i = 0
      while (i < y.n) { x.offer(y.keys(i), y.ids(i)); i += 1 }
      x
    }
    def finish(h: MinHeap): Seq[KeyedId] =
      (0 until h.n).map(i => KeyedId(h.keys(i), h.ids(i)))
        .sortBy(s => (s.key, s.id))
    def bufferEncoder: Encoder[MinHeap] = Encoders.kryo[MinHeap]
    def outputEncoder: Encoder[Seq[KeyedId]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[KeyedId]]()
  }

  /** array<struct<key,id>> of the k smallest (key, id) rows per group,
    * sorted ascending — EXACT over the full long range (the selection
    * key is typically a 60-bit hash).
    */
  def minK(key: Column, id: Column, k: Int): Column = {
    require(k > 0, s"k must be positive: $k")
    udaf(new MinKAgg(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)).apply(key, id)
  }
}
