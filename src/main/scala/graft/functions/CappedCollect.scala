package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** [EXT] Size-capped list aggregation — the bounded-memory building
  * block under the LSH/jaccard bucket expansions.
  *
  * Why it exists: `collect_list` builds the ENTIRE group in its
  * aggregation buffer before any size filter can drop it, so one hot
  * key (a boilerplate shingle, a degenerate band over near-constant
  * docs) holds O(group) memory on a single executor — the classic
  * 100 TB OOM. This aggregator keeps the exact group COUNT but stops
  * retaining elements past `cap`: groups over the cap are dropped by
  * the caller's existing `n <= cap` filter anyway, so results are
  * bit-identical to collect_list-then-filter while the buffer is
  * bounded at cap+1 elements. One shuffle, no second counting pass,
  * no branch recompute.
  *
  * Buffers ride Kryo (object-hash aggregation keeps them as live JVM
  * objects per group; serialization only on spill/partial-agg
  * exchange). Element order is partition-dependent, exactly like
  * collect_list — callers sort (the pair kernels sort by id).
  */
object CappedCollect {

  /** (exact group size, elements retained up to the cap). */
  final case class Capped(n: Long, ids: Seq[Long])

  /** As [[Capped]], with an aligned payload list. */
  final case class Capped2(n: Long, ids: Seq[Long], ns: Seq[Int])

  final class Buf(var n: Long, val ids: ArrayBuffer[Long],
      val ns: ArrayBuffer[Int]) extends Serializable

  final class LongAgg(cap: Int) extends Aggregator[Long, Buf, Capped] {
    def zero: Buf = new Buf(0L, new ArrayBuffer[Long], null)
    def reduce(b: Buf, a: Long): Buf = {
      b.n += 1
      if (b.ids.length <= cap) b.ids += a
      b
    }
    def merge(x: Buf, y: Buf): Buf = {
      x.n += y.n
      // long arithmetic: cap + 1 overflows Int at cap = Int.MaxValue
      val room = (cap.toLong + 1L - x.ids.length).min(Int.MaxValue).toInt
      if (room > 0) x.ids ++= y.ids.take(room)
      x
    }
    def finish(b: Buf): Capped = Capped(b.n, b.ids.toSeq)
    def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    def outputEncoder: Encoder[Capped] = Encoders.product[Capped]
  }

  final class PairAgg(cap: Int) extends Aggregator[(Long, Int), Buf, Capped2] {
    def zero: Buf = new Buf(0L, new ArrayBuffer[Long], new ArrayBuffer[Int])
    def reduce(b: Buf, a: (Long, Int)): Buf = {
      b.n += 1
      if (b.ids.length <= cap) { b.ids += a._1; b.ns += a._2 }
      b
    }
    def merge(x: Buf, y: Buf): Buf = {
      x.n += y.n
      val room = (cap.toLong + 1L - x.ids.length).min(Int.MaxValue).toInt
      if (room > 0) { x.ids ++= y.ids.take(room); x.ns ++= y.ns.take(room) }
      x
    }
    def finish(b: Buf): Capped2 = Capped2(b.n, b.ids.toSeq, b.ns.toSeq)
    def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    def outputEncoder: Encoder[Capped2] = Encoders.product[Capped2]
  }

  /** As [[Capped]], with an aligned LONG payload list. */
  final case class Capped2L(n: Long, ids: Seq[Long], hs: Seq[Long])

  final class BufLL(var n: Long, val ids: ArrayBuffer[Long],
      val hs: ArrayBuffer[Long]) extends Serializable

  final class PairLongAgg(cap: Int) extends Aggregator[(Long, Long), BufLL, Capped2L] {
    def zero: BufLL = new BufLL(0L, new ArrayBuffer[Long], new ArrayBuffer[Long])
    def reduce(b: BufLL, a: (Long, Long)): BufLL = {
      b.n += 1
      if (b.ids.length <= cap) { b.ids += a._1; b.hs += a._2 }
      b
    }
    def merge(x: BufLL, y: BufLL): BufLL = {
      x.n += y.n
      val room = (cap.toLong + 1L - x.ids.length).min(Int.MaxValue).toInt
      if (room > 0) { x.ids ++= y.ids.take(room); x.hs ++= y.hs.take(room) }
      x
    }
    def finish(b: BufLL): Capped2L = Capped2L(b.n, b.ids.toSeq, b.hs.toSeq)
    def bufferEncoder: Encoder[BufLL] = Encoders.kryo[BufLL]
    def outputEncoder: Encoder[Capped2L] = Encoders.product[Capped2L]
  }

  /** struct(n, ids): exact count + up to cap+1 retained longs. */
  def cappedLongList(c: Column, cap: Int): Column =
    udaf(new LongAgg(cap), Encoders.scalaLong).apply(c)

  /** struct(n, ids, hs): as above with an index-aligned long payload. */
  def cappedLongPairList(id: Column, payload: Column, cap: Int): Column =
    udaf(new PairLongAgg(cap), Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .apply(id, payload)

  /** struct(n, ids, ns): as above with an index-aligned int payload. */
  def cappedPairList(id: Column, payload: Column, cap: Int): Column =
    udaf(new PairAgg(cap), Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt))
      .apply(id, payload)
}
