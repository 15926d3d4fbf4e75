package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graft.{expr => exprBridge}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** [EXT] Mergeable-sketch AGGREGATE functions (SURVEY §4 custom-work
  * item 3): the HyperLogLog and count–min sketches of
  * [[graft.ops.Sketch]] packaged as `TypedImperativeAggregate`s, so
  * `GROUP BY source` yields ONE SKETCH PER GROUP in a single pass —
  * the table-level ops need one job per slice, the aggregate form
  * sketches a thousand sources at once with sketch-sized (not
  * key-sized) shuffle rows, the shape a 100 TB per-source cardinality/
  * frequency report needs.
  *
  * The aggregation state IS the output: `hll_sketch_agg` emits the
  * m-byte register vector, `cm_sketch_agg` the depth×width counter
  * array, and the companion `*_merge_agg` aggregates fold STORED
  * states (per-day, per-shard) into the state of the union — the
  * datasketches-style build/store/merge lifecycle. Register semantics
  * are bit-identical to [[graft.ops.Sketch.hllRegisters]] /
  * [[graft.ops.Sketch.countMinTable]] (same md5 hex60, same salts,
  * same ρ arithmetic; SketchAggSpec pins state ≡ relational table),
  * so a stored state can be audited against the relational path and
  * both agree with the DuckDB-replayable hashing contract.
  *
  * Buffers are primitive arrays (m bytes / depth·width longs),
  * serialize is a flat copy, and partial aggregation applies — Spark
  * merges per-partition states map-side, the exchange carries one
  * state per (group × partition).
  */
object SketchAgg {

  // ---- static kernels (StaticInvoke entry points) -------------------

  /** (n_nonzero, sum_q) of an HLL register state: sum_q = Σ_j
    * ⌊2^40 / 2^ρ_j⌋ over ALL registers (empty ⇒ 2^40) — exactly
    * [[graft.ops.Sketch.hllReport]]'s quantized harmonic sum.
    */
  def hllSummary(state: Array[Byte], p: Int): ArrayData = {
    // shape guard: a state reported with the wrong p would scale the
    // harmonic sum by the wrong alpha·m² and silently mis-estimate —
    // the one thing a sketch estimate must never do (cmEstimate's
    // guard, mirrored)
    require(state.length == (1 << p),
      s"HLL state has ${state.length} registers but p=$p implies ${1 << p} — " +
        "built with a different p than it is being reported with")
    val Q = 1L << 40
    var nz = 0L
    var sum = 0L
    var i = 0
    while (i < state.length) {
      val rho = state(i) & 0xff
      if (rho > 0) nz += 1
      sum += (Q >> rho)
      i += 1
    }
    new GenericArrayData(Array(nz, sum))
  }

  /** Count–min point estimate from a state array: min over the depth
    * rows of the counter `key` hashes to — the same salted-hex60 cells
    * [[graft.ops.Sketch.countMinTable]] builds.
    */
  def cmEstimate(state: ArrayData, depth: Int, width: Int, key: UTF8String): Long = {
    // shape guard: a state probed with the wrong width would read
    // arbitrary in-bounds cells and could UNDERSHOOT — the one thing
    // a count-min estimate must never do
    require(state.numElements() == depth * width,
      s"CM state length ${state.numElements()} != $depth x $width — " +
        "probed with a different shape than it was built with")
    var est = Long.MaxValue
    var i = 0
    while (i < depth) {
      val c = (Kernels.hex60String("cm" + i + ":" + key.toString) % width).toInt
      val v = state.getLong(i * width + c)
      if (v < est) est = v
      i += 1
    }
    est
  }

  // the two merge operations, ONE implementation each — the build
  // aggregates, the stored-state aggregates, and their merge sides all
  // call these, so the paths can never diverge
  private def maxBytesInto(into: Array[Byte], from: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < into.length) {
      if ((from(i) & 0xff) > (into(i) & 0xff)) into(i) = from(i)
      i += 1
    }
    into
  }
  private def addLongsInto(into: Array[Long], from: Int => Long): Array[Long] = {
    var i = 0
    while (i < into.length) { into(i) += from(i); i += 1 }
    into
  }
  private def orBytesInto(into: Array[Byte], from: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < into.length) { into(i) = (into(i) | from(i)).toByte; i += 1 }
    into
  }

  // ---- Bloom filter ---------------------------------------------------

  /** Bit position of hash `i` for `key` in an m-bit filter — the same
    * salted-hex60 convention as the count–min rows ("cm$i:"), salt
    * "bl$i:", so the oracle can replay every bit relationally.
    */
  private def bloomBit(i: Int, key: String, m: Int): Int =
    (Kernels.hex60String("bl" + i + ":" + key) % m).toInt

  /** All k bits of `key` set in the state? No false negatives ever;
    * false positives at the documented (1 - e^{-kn/m})^k rate
    * (Bloom 1970, CACM 13(7)).
    */
  def bloomContains(state: Array[Byte], m: Int, k: Int, key: UTF8String): Boolean = {
    // shape guard: a state probed with the wrong m would read wrong
    // bit positions and could report a FALSE NEGATIVE — the one thing
    // a bloom membership probe must never do
    require(state.length.toLong * 8 == m,
      s"bloom state has ${state.length * 8} bits but m=$m — " +
        "probed with a different m than it was built with")
    val s = key.toString
    var i = 0
    while (i < k) {
      val b = bloomBit(i, s, m)
      if ((state(b >>> 3) & (1 << (b & 7))) == 0) return false
      i += 1
    }
    true
  }

  /** (n_set, fill_ppm) of an m-bit state: population count and the
    * integer-exact parts-per-million fill ratio.
    */
  def bloomSummary(state: Array[Byte], m: Int): ArrayData = {
    require(state.length.toLong * 8 == m,
      s"bloom state has ${state.length * 8} bits but m=$m — " +
        "reported with a different m than it was built with")
    var n = 0L
    var i = 0
    while (i < state.length) {
      n += java.lang.Integer.bitCount(state(i) & 0xff)
      i += 1
    }
    new GenericArrayData(Array(n, n * 1000000L / m))
  }

  // ---- HyperLogLog --------------------------------------------------

  /** State: 2^p bytes, register j holding max ρ seen (0 = empty). */
  case class HllSketchAgg(child: Expression, p: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with ImplicitCastInputTypes with UnaryLike[Expression] {
    require(p >= 4 && p <= 16, s"need 4 <= p <= 16: $p")
    private val wBits = 60 - p
    private val wMask = (1L << wBits) - 1

    override def createAggregationBuffer(): Array[Byte] = new Array[Byte](1 << p)

    override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
      val v = child.eval(input)
      if (v != null) {
        val h = Kernels.hex60String(v.asInstanceOf[UTF8String].toString)
        val reg = (h >>> wBits).toInt
        val w = h & wMask
        val rho =
          (if (w > 0) wBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
           else wBits + 1).toByte
        if ((buf(reg) & 0xff) < (rho & 0xff)) buf(reg) = rho
      }
      buf
    }

    override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] =
      maxBytesInto(b1, b2)

    override def eval(buf: Array[Byte]): Any = buf.clone()
    override def serialize(buf: Array[Byte]): Array[Byte] = buf
    override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def prettyName: String = "hll_sketch_agg"
    override def withNewMutableAggBufferOffset(o: Int): HllSketchAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): HllSketchAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): HllSketchAgg =
      copy(child = newChild)
  }

  /** Fold STORED m-byte HLL states (register-wise max) into the state
    * of the union — build daily, merge on demand.
    */
  case class HllMergeAgg(child: Expression, p: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with ImplicitCastInputTypes with UnaryLike[Expression] {
    require(p >= 4 && p <= 16, s"need 4 <= p <= 16: $p")
    override def createAggregationBuffer(): Array[Byte] = new Array[Byte](1 << p)
    override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
      val v = child.eval(input)
      if (v != null) {
        val st = v.asInstanceOf[Array[Byte]]
        require(st.length == buf.length,
          s"HLL state length ${st.length} != 2^$p — built with a different p")
        maxBytesInto(buf, st): Unit
      }
      buf
    }
    override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] =
      maxBytesInto(b1, b2)
    override def eval(buf: Array[Byte]): Any = buf.clone()
    override def serialize(buf: Array[Byte]): Array[Byte] = buf
    override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def inputTypes: Seq[DataType] = Seq(BinaryType)
    override def prettyName: String = "hll_merge_agg"
    override def withNewMutableAggBufferOffset(o: Int): HllMergeAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): HllMergeAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): HllMergeAgg =
      copy(child = newChild)
  }

  // ---- count–min ----------------------------------------------------

  /** State: depth×width longs, row-major; cell (i, c) counts keys whose
    * salted hash lands there.
    */
  case class CmSketchAgg(child: Expression, depth: Int, width: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with ImplicitCastInputTypes with UnaryLike[Expression] {
    require(depth >= 1 && depth <= 16, s"need 1 <= depth <= 16: $depth")
    require(width >= 2, s"need width >= 2: $width")
    // product bound: depth*width is Int-indexed and one buffer per
    // in-flight group — past 2^24 cells (128 MiB) the state is no
    // longer a "sketch" and the Int arithmetic could wrap
    require(depth.toLong * width <= (1L << 24),
      s"depth x width = ${depth.toLong * width} exceeds 2^24 cells")

    override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val key = v.asInstanceOf[UTF8String].toString
        var i = 0
        while (i < depth) {
          val c = (Kernels.hex60String("cm" + i + ":" + key) % width).toInt
          buf(i * width + c) += 1
          i += 1
        }
      }
      buf
    }

    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
      addLongsInto(b1, b2)

    override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())
    override def serialize(buf: Array[Long]): Array[Byte] = SketchAgg.longsToBytes(buf)
    override def deserialize(bytes: Array[Byte]): Array[Long] = SketchAgg.bytesToLongs(bytes)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def prettyName: String = "cm_sketch_agg"
    override def withNewMutableAggBufferOffset(o: Int): CmSketchAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): CmSketchAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): CmSketchAgg =
      copy(child = newChild)
  }

  /** Fold STORED count–min states (cell-wise add) — the aggregate form
    * of [[graft.ops.Sketch.countMinMerge]].
    */
  case class CmMergeAgg(child: Expression, depth: Int, width: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with ImplicitCastInputTypes with UnaryLike[Expression] {
    require(depth >= 1 && depth <= 16, s"need 1 <= depth <= 16: $depth")
    require(width >= 2, s"need width >= 2: $width")
    require(depth.toLong * width <= (1L << 24),
      s"depth x width = ${depth.toLong * width} exceeds 2^24 cells")
    override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)
    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val st = v.asInstanceOf[ArrayData]
        require(st.numElements() == buf.length,
          s"CM state length ${st.numElements()} != $depth x $width")
        addLongsInto(buf, st.getLong): Unit
      }
      buf
    }
    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
      addLongsInto(b1, b2)
    override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())
    override def serialize(buf: Array[Long]): Array[Byte] = SketchAgg.longsToBytes(buf)
    override def deserialize(bytes: Array[Byte]): Array[Long] = SketchAgg.bytesToLongs(bytes)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
    override def prettyName: String = "cm_merge_agg"
    override def withNewMutableAggBufferOffset(o: Int): CmMergeAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): CmMergeAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): CmMergeAgg =
      copy(child = newChild)
  }

  /** State: m/8 bytes, bit b at byte b>>>3 mask 1<<(b&7); `update`
    * sets the k salted-hex60 bits of each key. The build-side half of
    * the decontamination prefilter: sketch the benchmark once, probe
    * the corpus map-side.
    */
  case class BloomSketchAgg(child: Expression, m: Int, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with ImplicitCastInputTypes with UnaryLike[Expression] {
    require(m >= 64 && m % 8 == 0 && m <= (1 << 26),
      s"need 64 <= m <= 2^26 and m % 8 == 0: $m")
    require(k >= 1 && k <= 16, s"need 1 <= k <= 16: $k")
    override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m / 8)
    override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
      val v = child.eval(input)
      if (v != null) {
        val key = v.asInstanceOf[UTF8String].toString
        var i = 0
        while (i < k) {
          val b = bloomBit(i, key, m)
          buf(b >>> 3) = (buf(b >>> 3) | (1 << (b & 7))).toByte
          i += 1
        }
      }
      buf
    }
    override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] =
      orBytesInto(b1, b2)
    override def eval(buf: Array[Byte]): Any = buf.clone()
    override def serialize(buf: Array[Byte]): Array[Byte] = buf
    override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def prettyName: String = "bloom_sketch_agg"
    override def withNewMutableAggBufferOffset(o: Int): BloomSketchAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): BloomSketchAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): BloomSketchAgg =
      copy(child = newChild)
  }

  /** Fold STORED m-bit bloom states (bitwise OR) into the filter of
    * the union — build per-shard/per-day, merge on demand; OR is
    * exactly set union, so the merged filter is bit-identical to one
    * built over the union.
    */
  case class BloomMergeAgg(child: Expression, m: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with ImplicitCastInputTypes with UnaryLike[Expression] {
    require(m >= 64 && m % 8 == 0 && m <= (1 << 26),
      s"need 64 <= m <= 2^26 and m % 8 == 0: $m")
    override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m / 8)
    override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
      val v = child.eval(input)
      if (v != null) {
        val st = v.asInstanceOf[Array[Byte]]
        require(st.length == buf.length,
          s"bloom state has ${st.length * 8} bits but m=$m — " +
            "built with a different m")
        orBytesInto(buf, st): Unit
      }
      buf
    }
    override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] =
      orBytesInto(b1, b2)
    override def eval(buf: Array[Byte]): Any = buf.clone()
    override def serialize(buf: Array[Byte]): Array[Byte] = buf
    override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def inputTypes: Seq[DataType] = Seq(BinaryType)
    override def prettyName: String = "bloom_merge_agg"
    override def withNewMutableAggBufferOffset(o: Int): BloomMergeAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): BloomMergeAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): BloomMergeAgg =
      copy(child = newChild)
  }

  // ---- KMV (bottom-k / k-minimum-values) ----------------------------

  /** Bounded bottom-k state: the k smallest DISTINCT 60-bit key hashes
    * seen so far. A sorted long set capped at k — update is O(log k),
    * the exchange carries ≤ k longs per (group × partition), and the
    * stored state doubles as (a) a deterministic uniform key sample
    * and (b) the KMV distinct-count estimator input (Bar-Yossef et
    * al. 2002). Same hex60 hashing as q200's [[graft.functions
    * .TopKHeap.minK]] path, so a stored state is replayable in the
    * oracle with `QUALIFY row_number() OVER (ORDER BY h) <= k`.
    */
  private def kmvTrim(buf: java.util.TreeSet[java.lang.Long], k: Int): Unit =
    while (buf.size > k) { buf.pollLast(): Unit }

  /** `GROUP BY g` → sorted array of the k min distinct hex60 hashes. */
  case class KmvSketchAgg(child: Expression, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with ImplicitCastInputTypes with UnaryLike[Expression] {
    require(k >= 1 && k <= 4096, s"need 1 <= k <= 4096: $k")
    override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
      new java.util.TreeSet[java.lang.Long]()
    override def update(buf: java.util.TreeSet[java.lang.Long],
        input: InternalRow): java.util.TreeSet[java.lang.Long] = {
      val v = child.eval(input)
      if (v != null) {
        val h = Kernels.hex60String(v.asInstanceOf[UTF8String].toString)
        // skip the insert when the buffer is full and h can't displace
        // anything — keeps the steady-state update allocation-free
        if (buf.size < k || h < buf.last()) { buf.add(h); kmvTrim(buf, k) }
      }
      buf
    }
    override def merge(b1: java.util.TreeSet[java.lang.Long],
        b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
      b1.addAll(b2)
      kmvTrim(b1, k)
      b1
    }
    override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
      val out = new Array[Long](buf.size)
      val it = buf.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      new GenericArrayData(out)
    }
    override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
      val out = new Array[Long](buf.size)
      val it = buf.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      SketchAgg.longsToBytes(out)
    }
    override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
      val buf = new java.util.TreeSet[java.lang.Long]()
      SketchAgg.bytesToLongs(bytes).foreach(h => buf.add(h): Unit)
      buf
    }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def prettyName: String = "kmv_sketch_agg"
    override def withNewMutableAggBufferOffset(o: Int): KmvSketchAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KmvSketchAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
      copy(child = newChild)
  }

  /** Fold STORED bottom-k states (set union, re-trim to k) into the
    * state of the union — the global bottom-k is always a subset of
    * the union of per-shard bottom-ks, so merged ≡ one-pass
    * bit-for-bit (the HLL/CM/bloom merge-equivalence property, and
    * what closes the r10 lifecycle gap: per-shard KMV states now fold
    * without re-reading keys).
    */
  case class KmvMergeAgg(child: Expression, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with ImplicitCastInputTypes with UnaryLike[Expression] {
    require(k >= 1 && k <= 4096, s"need 1 <= k <= 4096: $k")
    override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
      new java.util.TreeSet[java.lang.Long]()
    override def update(buf: java.util.TreeSet[java.lang.Long],
        input: InternalRow): java.util.TreeSet[java.lang.Long] = {
      val v = child.eval(input)
      if (v != null) {
        val st = v.asInstanceOf[ArrayData]
        // a stored state LARGER than k would mean it was built with a
        // bigger k — folding it would still be sound (we re-trim), but
        // the estimator contract (h_k = k-th min) differs per k, so
        // reject the mismatch loudly like the other shape guards
        require(st.numElements() <= k,
          s"KMV state has ${st.numElements()} values but k=$k — " +
            "built with a larger k than it is being merged with")
        var i = 0
        while (i < st.numElements()) { buf.add(st.getLong(i)): Unit; i += 1 }
        kmvTrim(buf, k)
      }
      buf
    }
    override def merge(b1: java.util.TreeSet[java.lang.Long],
        b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
      b1.addAll(b2)
      kmvTrim(b1, k)
      b1
    }
    override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
      val out = new Array[Long](buf.size)
      val it = buf.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      new GenericArrayData(out)
    }
    override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
      val out = new Array[Long](buf.size)
      val it = buf.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      SketchAgg.longsToBytes(out)
    }
    override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
      val buf = new java.util.TreeSet[java.lang.Long]()
      SketchAgg.bytesToLongs(bytes).foreach(h => buf.add(h): Unit)
      buf
    }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
    override def prettyName: String = "kmv_merge_agg"
    override def withNewMutableAggBufferOffset(o: Int): KmvMergeAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KmvMergeAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): KmvMergeAgg =
      copy(child = newChild)
  }

  // ---- Moments (mergeable power-sum sketch) --------------------------

  /** Exact integer power-sum state `[n, Σx, Σx², Σx³, Σx⁴]` — the
    * moments-sketch lifecycle (Gan et al., "Moment-Based Quantile
    * Sketches", VLDB 2018) with EXACT integer sums instead of float
    * accumulation, so per-shard states are hash-stable and the merge
    * is plain elementwise addition: merged ≡ one-pass bit-for-bit
    * regardless of row or shard order (float power sums would round
    * differently per addition order — the reason the state holds
    * BigIntegers and the report does all its IEEE arithmetic from the
    * finished sums). The hot loop stays allocation-free: per-partition
    * longs accumulate until the Σx⁴ headroom check fires, then flush
    * into the BigInteger carries (Σx⁴ dominates every other sum in
    * magnitude — x⁴ ≥ |x|³, x², |x| for all integer x — so one guard
    * bounds all four).
    */
  private[graft] final class MomentsBuf {
    var n: Long = 0L
    var l1, l2, l3, l4 = 0L
    var b1, b2, b3, b4: java.math.BigInteger = java.math.BigInteger.ZERO
    def flush(): Unit = {
      if (l1 != 0L) { b1 = b1.add(java.math.BigInteger.valueOf(l1)); l1 = 0L }
      if (l2 != 0L) { b2 = b2.add(java.math.BigInteger.valueOf(l2)); l2 = 0L }
      if (l3 != 0L) { b3 = b3.add(java.math.BigInteger.valueOf(l3)); l3 = 0L }
      if (l4 != 0L) { b4 = b4.add(java.math.BigInteger.valueOf(l4)); l4 = 0L }
    }
  }
  // per-row long fast path is sound while |x| < 40000 (x⁴ ≤ 2.56e18)
  // and the pending Σx⁴ stays below FLUSH_AT (6e18 + 2.56e18 < 2⁶³−1)
  private val MOMENTS_FAST_X = 40000L
  private val MOMENTS_FLUSH_AT = 6000000000000000000L

  /** Largest |x| whose x⁴ fits decimal(38,0) (⌊10^9.5⌋): a single
    * bigger input (epoch-nano/micro timestamps are the classic one)
    * guarantees the aggregation would run to completion and only then
    * die in an opaque Decimal ArithmeticException at eval time — fail
    * fast at the input instead, naming the bound.
    */
  private[graft] val MOMENTS_MAX_X = 3162277660L

  private def momentsCheckX(x: Long): Unit =
    if (x > MOMENTS_MAX_X || x < -MOMENTS_MAX_X)
      throw new IllegalArgumentException(
        s"moments sketch input $x exceeds ±$MOMENTS_MAX_X (its 4th power " +
          "overflows the decimal(38,0) state — epoch-nano/micro " +
          "timestamp? pre-scale the column to coarser units)")

  private def momentsUpdate(buf: MomentsBuf, x: Long): Unit = {
    momentsCheckX(x)
    buf.n += 1L
    if (x > -MOMENTS_FAST_X && x < MOMENTS_FAST_X) {
      val x2 = x * x
      if (buf.l4 > MOMENTS_FLUSH_AT) buf.flush()
      buf.l1 += x; buf.l2 += x2; buf.l3 += x2 * x; buf.l4 += x2 * x2
    } else {
      val b = java.math.BigInteger.valueOf(x)
      val b2 = b.multiply(b)
      buf.b1 = buf.b1.add(b)
      buf.b2 = buf.b2.add(b2)
      buf.b3 = buf.b3.add(b2.multiply(b))
      buf.b4 = buf.b4.add(b2.multiply(b2))
    }
  }

  private def momentsMergeBuf(a: MomentsBuf, b: MomentsBuf): MomentsBuf = {
    a.flush(); b.flush()
    a.n += b.n
    a.b1 = a.b1.add(b.b1); a.b2 = a.b2.add(b.b2)
    a.b3 = a.b3.add(b.b3); a.b4 = a.b4.add(b.b4)
    a
  }

  /** 10^38 − 1: the largest magnitude decimal(38,0) holds. */
  private val DEC38_MAX = new java.math.BigInteger("9" * 38)

  private def momentsEval(buf: MomentsBuf): GenericArrayData = {
    buf.flush()
    def d(b: java.math.BigInteger) = {
      // per-input magnitude is bounded (momentsCheckX), but enough
      // large values can still push a SUM past 38 digits — report it
      // as what it is instead of an opaque Decimal ArithmeticException
      if (b.abs.compareTo(DEC38_MAX) > 0)
        throw new ArithmeticException(
          s"moments power sum $b overflows the decimal(38,0) state " +
            "(too many large inputs) — pre-scale the column to " +
            "coarser units")
      Decimal(scala.math.BigDecimal(new java.math.BigDecimal(b)), 38, 0)
    }
    new GenericArrayData(Array[Any](
      d(java.math.BigInteger.valueOf(buf.n)),
      d(buf.b1), d(buf.b2), d(buf.b3), d(buf.b4)))
  }

  private def momentsSerialize(buf: MomentsBuf): Array[Byte] = {
    buf.flush()
    val parts = Array(buf.b1, buf.b2, buf.b3, buf.b4).map(_.toByteArray)
    val bb = java.nio.ByteBuffer.allocate(8 + parts.map(4 + _.length).sum)
    bb.putLong(buf.n)
    parts.foreach { p => bb.putInt(p.length); bb.put(p) }
    bb.array()
  }

  private def momentsDeserialize(bytes: Array[Byte]): MomentsBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new MomentsBuf
    buf.n = bb.getLong()
    def next(): java.math.BigInteger = {
      val p = new Array[Byte](bb.getInt()); bb.get(p)
      new java.math.BigInteger(p)
    }
    buf.b1 = next(); buf.b2 = next(); buf.b3 = next(); buf.b4 = next()
    buf
  }

  private val momentsStateType: ArrayType =
    ArrayType(DecimalType(38, 0), containsNull = false)

  /** `GROUP BY g` → one `[n, Σx, Σx², Σx³, Σx⁴]` state per group
    * (array<decimal(38,0)>, NULL inputs skipped). The state IS the
    * oracle surface: every element is an exact integer a SQL replay
    * computes with plain `count`/`sum` — no estimator arithmetic to
    * trust — and [[momentsSummary]] derives mean/variance/skewness/
    * kurtosis/tail bounds from the finished sums only.
    */
  case class MomentsSketchAgg(child: Expression,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MomentsBuf]
    with ImplicitCastInputTypes with UnaryLike[Expression] {
    override def createAggregationBuffer(): MomentsBuf = new MomentsBuf
    override def update(buf: MomentsBuf, input: InternalRow): MomentsBuf = {
      val v = child.eval(input)
      if (v != null) momentsUpdate(buf, v.asInstanceOf[Long])
      buf
    }
    override def merge(b1: MomentsBuf, b2: MomentsBuf): MomentsBuf =
      momentsMergeBuf(b1, b2)
    override def eval(buf: MomentsBuf): Any = momentsEval(buf)
    override def serialize(buf: MomentsBuf): Array[Byte] = momentsSerialize(buf)
    override def deserialize(bytes: Array[Byte]): MomentsBuf =
      momentsDeserialize(bytes)
    override def dataType: DataType = momentsStateType
    override def nullable: Boolean = false
    override def inputTypes: Seq[DataType] = Seq(LongType)
    override def prettyName: String = "moments_sketch_agg"
    override def withNewMutableAggBufferOffset(o: Int): MomentsSketchAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): MomentsSketchAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): MomentsSketchAgg =
      copy(child = newChild)
  }

  /** WEIGHTED moments build — `(x, w)` contributes `w` to n and
    * `w·xᵏ` to each sum, exactly (BigInteger path whenever w ≠ 1; the
    * allocation-free long fast path still serves w = 1 rows). The
    * state is identical in type and semantics to
    * [[MomentsSketchAgg]]'s, so it folds with the SAME
    * [[MomentsMergeAgg]] and reads with the same report. The use is
    * the q134 domain trick at sketch level: aggregate `GROUP BY g, v
    * → count` first, then sketch the (v, count) DOMAIN — bit-identical
    * to sketching the raw rows, with the input bounded by value
    * cardinality instead of corpus size. Negative weights fail
    * loudly; w = 0 and NULL x/w rows contribute nothing.
    */
  case class MomentsWSketchAgg(left: Expression, right: Expression,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MomentsBuf]
    with ImplicitCastInputTypes
    with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {
    override def createAggregationBuffer(): MomentsBuf = new MomentsBuf
    override def update(buf: MomentsBuf, input: InternalRow): MomentsBuf = {
      val xv = left.eval(input)
      val wv = right.eval(input)
      if (xv != null && wv != null) {
        val w = wv.asInstanceOf[Long]
        require(w >= 0L, s"moments weight must be >= 0, got $w")
        val x = xv.asInstanceOf[Long]
        if (w == 1L) momentsUpdate(buf, x)
        else if (w > 0L) {
          momentsCheckX(x)
          val bw = java.math.BigInteger.valueOf(w)
          val b = java.math.BigInteger.valueOf(x)
          val b2 = b.multiply(b)
          buf.n = Math.addExact(buf.n, w)
          buf.b1 = buf.b1.add(b.multiply(bw))
          buf.b2 = buf.b2.add(b2.multiply(bw))
          buf.b3 = buf.b3.add(b2.multiply(b).multiply(bw))
          buf.b4 = buf.b4.add(b2.multiply(b2).multiply(bw))
        }
      }
      buf
    }
    override def merge(b1: MomentsBuf, b2: MomentsBuf): MomentsBuf =
      momentsMergeBuf(b1, b2)
    override def eval(buf: MomentsBuf): Any = momentsEval(buf)
    override def serialize(buf: MomentsBuf): Array[Byte] = momentsSerialize(buf)
    override def deserialize(bytes: Array[Byte]): MomentsBuf =
      momentsDeserialize(bytes)
    override def dataType: DataType = momentsStateType
    override def nullable: Boolean = false
    override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
    override def prettyName: String = "moments_wsketch_agg"
    override def withNewMutableAggBufferOffset(o: Int): MomentsWSketchAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): MomentsWSketchAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(newLeft: Expression,
        newRight: Expression): MomentsWSketchAgg =
      copy(left = newLeft, right = newRight)
  }

  /** Fold STORED moments states (elementwise integer addition — the
    * merge is exact, so per-day/per-shard profiles combine into the
    * union's profile without touching the rows again).
    */
  case class MomentsMergeAgg(child: Expression,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MomentsBuf]
    with ImplicitCastInputTypes with UnaryLike[Expression] {
    override def createAggregationBuffer(): MomentsBuf = new MomentsBuf
    override def update(buf: MomentsBuf, input: InternalRow): MomentsBuf = {
      val v = child.eval(input)
      if (v != null) {
        val st = v.asInstanceOf[ArrayData]
        require(st.numElements() == 5,
          s"moments state has ${st.numElements()} elements, expected 5 " +
            "[n, s1, s2, s3, s4]")
        def big(i: Int): java.math.BigInteger =
          st.getDecimal(i, 38, 0).toJavaBigDecimal.toBigIntegerExact()
        buf.n = Math.addExact(buf.n, big(0).longValueExact())
        buf.b1 = buf.b1.add(big(1)); buf.b2 = buf.b2.add(big(2))
        buf.b3 = buf.b3.add(big(3)); buf.b4 = buf.b4.add(big(4))
      }
      buf
    }
    override def merge(b1: MomentsBuf, b2: MomentsBuf): MomentsBuf =
      momentsMergeBuf(b1, b2)
    override def eval(buf: MomentsBuf): Any = momentsEval(buf)
    override def serialize(buf: MomentsBuf): Array[Byte] = momentsSerialize(buf)
    override def deserialize(bytes: Array[Byte]): MomentsBuf =
      momentsDeserialize(bytes)
    override def dataType: DataType = momentsStateType
    override def nullable: Boolean = false
    override def inputTypes: Seq[DataType] = Seq(momentsStateType)
    override def prettyName: String = "moments_merge_agg"
    override def withNewMutableAggBufferOffset(o: Int): MomentsMergeAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): MomentsMergeAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): MomentsMergeAgg =
      copy(child = newChild)
  }

  // ---- Log-histogram (mergeable quantile sketch) ---------------------

  /** Deterministic base-2 log-histogram over NON-NEGATIVE longs — the
    * DDSketch idea (Masson et al., VLDB 2019) with integer bit-length
    * bucketing instead of a float log, so the bucket of a value is a
    * pure integer function both engines compute identically:
    * x < 16 maps to its own exact bucket (b = x); otherwise, with
    * k = 63 − nlz(x) the value's bit length − 1, each power-of-two
    * range [2ᵏ, 2ᵏ⁺¹) splits into 16 equal sub-ranges —
    * b = 16k + (x − 2ᵏ) >> (k − 4). Relative bucket width is 2⁻⁴, so
    * every reported quantile carries a guaranteed ≤ 6.25% bracket
    * ([lo, hi] bounds, both integers). 1008 buckets cover the full
    * long range; the state is a dense counter array that merges by
    * elementwise addition — merged ≡ one-pass bit-for-bit, the same
    * stored-state lifecycle as the HLL/CM/bloom/KMV/moments siblings.
    */
  private[graft] val LogHistBuckets = 1008

  /** Bucket index of a value (fails loudly on negatives — the sketch
    * is for magnitudes: lengths, counts, latencies, byte sizes).
    */
  def logHistBucket(x: Long): Int = {
    require(x >= 0L, s"loghist_sketch_agg input must be >= 0, got $x")
    if (x < 16L) x.toInt
    else {
      val k = 63 - java.lang.Long.numberOfLeadingZeros(x)
      (16 * k + ((x - (1L << k)) >> (k - 4))).toInt
    }
  }

  /** Inclusive [lo, hi] value bounds of a bucket. */
  def logHistBounds(b: Int): (Long, Long) =
    if (b < 16) (b.toLong, b.toLong)
    else {
      val k = b / 16
      val lo = (1L << k) + ((b % 16).toLong << (k - 4))
      (lo, lo + (1L << (k - 4)) - 1L)
    }

  /** [n, p50_lo, p50_hi, p90_lo, p90_hi, p99_lo, p99_hi, max_lo,
    * max_hi] from a stored state: rank r_p = ⌈n·p/100⌉ (integer
    * arithmetic), quantile bucket = first bucket whose cumulative
    * count reaches r_p, reported as its integer bounds — everything
    * here is exact integer math a SQL replay reproduces with a
    * windowed cumulative sum. Empty state reports all zeros.
    */
  def logHistSummary(state: ArrayData): ArrayData = {
    require(state.numElements() == LogHistBuckets,
      s"loghist state has ${state.numElements()} buckets, " +
        s"expected $LogHistBuckets")
    var n = 0L
    var maxB = -1
    var i = 0
    while (i < LogHistBuckets) {
      val c = state.getLong(i)
      // addExact: the weighted build accepts arbitrary long weights, so
      // total mass CAN exceed 2⁶³ — fail loudly, never report quantile
      // brackets computed from a silently wrapped total
      if (c > 0L) { n = Math.addExact(n, c); maxB = i }
      i += 1
    }
    if (n == 0L)
      return new GenericArrayData(Array(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
    def bucketAtRank(r: Long): Int = {
      var cum = 0L
      var j = 0
      while (j < LogHistBuckets) {
        cum += state.getLong(j)
        if (cum >= r) return j
        j += 1
      }
      maxB
    }
    val out = new Array[Long](9)
    out(0) = n
    var oi = 1
    Array(50L, 90L, 99L).foreach { p =>
      // ⌈n·p/100⌉ without the n·p product (n up to ~9.2e18 would wrap
      // at p ≥ 2 long before n itself overflows): split n = 100q + s,
      // then ⌈(100q + s)·p/100⌉ = q·p + ⌈s·p/100⌉ exactly, with
      // q·p ≤ (2⁶³/100)·99 < 2⁶³ and s·p ≤ 99·99
      val r = (n / 100L) * p + ((n % 100L) * p + 99L) / 100L
      val (lo, hi) = logHistBounds(bucketAtRank(r))
      out(oi) = lo; out(oi + 1) = hi; oi += 2
    }
    val (mlo, mhi) = logHistBounds(maxB)
    out(7) = mlo; out(8) = mhi
    new GenericArrayData(out)
  }

  /** `GROUP BY g` → one 1008-bucket counter array per group (NULL
    * inputs skipped, negatives rejected loudly).
    */
  case class LogHistSketchAgg(child: Expression,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with ImplicitCastInputTypes with UnaryLike[Expression] {
    override def createAggregationBuffer(): Array[Long] =
      new Array[Long](LogHistBuckets)
    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) buf(logHistBucket(v.asInstanceOf[Long])) += 1L
      buf
    }
    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < LogHistBuckets) { b1(i) += b2(i); i += 1 }
      b1
    }
    override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)
    override def serialize(buf: Array[Long]): Array[Byte] =
      SketchAgg.longsToBytes(buf)
    override def deserialize(bytes: Array[Byte]): Array[Long] =
      SketchAgg.bytesToLongs(bytes)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def inputTypes: Seq[DataType] = Seq(LongType)
    override def prettyName: String = "loghist_sketch_agg"
    override def withNewMutableAggBufferOffset(o: Int): LogHistSketchAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): LogHistSketchAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): LogHistSketchAgg =
      copy(child = newChild)
  }

  /** WEIGHTED log-histogram build — `(x, w)` adds `w` to x's bucket.
    * Same state type as [[LogHistSketchAgg]], so it folds with the
    * same [[LogHistMergeAgg]] and reads with the same report; the
    * domain-trick companion of [[MomentsWSketchAgg]] (sketch the
    * `GROUP BY v → count` domain, bit-identical to the raw rows).
    * Negative weights fail loudly; w = 0 and NULL rows are no-ops.
    */
  case class LogHistWSketchAgg(left: Expression, right: Expression,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with ImplicitCastInputTypes
    with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {
    override def createAggregationBuffer(): Array[Long] =
      new Array[Long](LogHistBuckets)
    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val xv = left.eval(input)
      val wv = right.eval(input)
      if (xv != null && wv != null) {
        val w = wv.asInstanceOf[Long]
        require(w >= 0L, s"loghist weight must be >= 0, got $w")
        if (w > 0L) {
          val b = logHistBucket(xv.asInstanceOf[Long])
          buf(b) = Math.addExact(buf(b), w) // arbitrary weights: no silent wrap
        }
      }
      buf
    }
    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < LogHistBuckets) { b1(i) = Math.addExact(b1(i), b2(i)); i += 1 }
      b1
    }
    override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)
    override def serialize(buf: Array[Long]): Array[Byte] =
      SketchAgg.longsToBytes(buf)
    override def deserialize(bytes: Array[Byte]): Array[Long] =
      SketchAgg.bytesToLongs(bytes)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
    override def prettyName: String = "loghist_wsketch_agg"
    override def withNewMutableAggBufferOffset(o: Int): LogHistWSketchAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): LogHistWSketchAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(newLeft: Expression,
        newRight: Expression): LogHistWSketchAgg =
      copy(left = newLeft, right = newRight)
  }

  /** Fold stored log-histogram states (elementwise addition). */
  case class LogHistMergeAgg(child: Expression,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with ImplicitCastInputTypes with UnaryLike[Expression] {
    override def createAggregationBuffer(): Array[Long] =
      new Array[Long](LogHistBuckets)
    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val st = v.asInstanceOf[ArrayData]
        require(st.numElements() == LogHistBuckets,
          s"loghist state has ${st.numElements()} buckets, " +
            s"expected $LogHistBuckets")
        var i = 0
        // addExact: folded states may carry weighted-build mass, so a
        // combined counter CAN exceed 2⁶³ — fail loudly, not wrap
        while (i < LogHistBuckets) {
          buf(i) = Math.addExact(buf(i), st.getLong(i)); i += 1
        }
      }
      buf
    }
    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < LogHistBuckets) { b1(i) = Math.addExact(b1(i), b2(i)); i += 1 }
      b1
    }
    override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)
    override def serialize(buf: Array[Long]): Array[Byte] =
      SketchAgg.longsToBytes(buf)
    override def deserialize(bytes: Array[Byte]): Array[Long] =
      SketchAgg.bytesToLongs(bytes)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
    override def prettyName: String = "loghist_merge_agg"
    override def withNewMutableAggBufferOffset(o: Int): LogHistMergeAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): LogHistMergeAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): LogHistMergeAgg =
      copy(child = newChild)
  }

  /** (k_used, h_k, est_distinct) from a stored bottom-k state:
    * est = (k−1)·2⁶⁰ ÷ h_k when the state is full (integer-exact,
    * 128-bit intermediate so k > 8 cannot overflow), exact count
    * when under-full — q200's arithmetic verbatim. An empty state
    * reports (0, 0, 0).
    */
  def kmvSummary(state: ArrayData, k: Int): ArrayData = {
    val used = state.numElements()
    require(used <= k,
      s"KMV state has $used values but k=$k — " +
        "built with a larger k than it is being reported with")
    val hk = if (used == 0) 0L else state.getLong(used - 1)
    val est =
      if (used < k || hk <= 0L) used.toLong // hk==0 only at k=1 with a key hashing to exactly 0 — exact count, never divide
      else (BigInt(k - 1) * (BigInt(1) << 60) / BigInt(hk)).toLong
    new GenericArrayData(Array(used.toLong, hk, est))
  }

  /** [mean, var_pop, skew, kurt_excess, cantelli_p99] from a stored
    * moments state — every double derives from the EXACT integer sums
    * through a fixed sequence of IEEE-754 operations (divisions,
    * left-associated polynomial terms, `sqrt`), so a SQL replay that
    * mirrors the same expression shapes reproduces each value
    * bit-for-bit (sums below 2⁵³ convert to double exactly in any
    * engine; division/multiply/subtract/sqrt are all correctly
    * rounded). Guards: an empty state reports zeros; a zero/negative
    * variance (constant column, or cancellation at extreme scale)
    * reports skew = kurt = 0 and cantelli_p99 = mean. cantelli_p99 is
    * the one-sided Cantelli bound μ + σ√99: AT MOST 1% of mass can
    * exceed it, whatever the distribution — the distribution-free
    * tail cut a 100 TB outlier filter needs from 5 numbers per group.
    */
  def momentsSummary(state: ArrayData): ArrayData = {
    require(state.numElements() == 5,
      s"moments state has ${state.numElements()} elements, expected 5")
    def big(i: Int): java.math.BigInteger =
      state.getDecimal(i, 38, 0).toJavaBigDecimal.toBigIntegerExact()
    val n = big(0).longValueExact()
    if (n == 0L)
      return new GenericArrayData(Array(0.0, 0.0, 0.0, 0.0, 0.0))
    val nd = n.toDouble
    val mean = big(1).doubleValue() / nd
    val p2 = big(2).doubleValue() / nd
    val p3 = big(3).doubleValue() / nd
    val p4 = big(4).doubleValue() / nd
    val v = p2 - mean * mean
    if (v <= 0.0)
      return new GenericArrayData(Array(mean, v, 0.0, 0.0, mean))
    val sd = Math.sqrt(v)
    val skew = (p3 - 3.0 * mean * p2 + 2.0 * mean * mean * mean) / (v * sd)
    val kurt = (p4 - 4.0 * mean * p3 + 6.0 * mean * mean * p2 -
      3.0 * mean * mean * mean * mean) / (v * v) - 3.0
    val cant = mean + Math.sqrt(v * 99.0)
    new GenericArrayData(Array(mean, v, skew, kurt, cant))
  }

  private[functions] def longsToBytes(a: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(a.length * 8)
    bb.asLongBuffer().put(a)
    bb.array()
  }
  private[functions] def bytesToLongs(b: Array[Byte]): Array[Long] = {
    val out = new Array[Long](b.length / 8)
    java.nio.ByteBuffer.wrap(b).asLongBuffer().get(out)
    out
  }

  // ---- Column wrappers ----------------------------------------------

  private def ex(c: Column) = exprBridge.expression(c)

  /** `GROUP BY g` → one m-byte HLL register state per group. */
  def hllSketch(key: Column, p: Int = 8): Column =
    exprBridge.column(HllSketchAgg(ex(key.cast("string")), p).toAggregateExpression())

  /** Fold stored HLL states into the union's state. */
  def hllMerge(state: Column, p: Int = 8): Column =
    exprBridge.column(HllMergeAgg(ex(state), p).toAggregateExpression())

  /** Cardinality report struct from a stored state — column-for-column
    * [[graft.ops.Sketch.hllReport]]: (m, n_nonzero, sum_q, est). Built
    * as a pure catalyst tree so the SQL temp-function registration can
    * reuse it verbatim (Column-API `struct` lowers through the
    * ColumnNode converter, which an expression-level builder must not
    * depend on).
    */
  private def hllReportExpr(state: Expression, p: Int): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, CreateNamedStruct, Divide, GetArrayItem, Literal, Multiply}
    require(p >= 4 && p <= 16, s"need 4 <= p <= 16: $p")
    val m = 1L << p
    val Q = 1L << 40
    val s = StaticInvoke(
      SketchAgg.getClass, ArrayType(LongType, containsNull = false), "hllSummary",
      Seq(state, Literal(p)), Seq(BinaryType, IntegerType))
    // same tree shape as Sketch.hllReport's closing arithmetic:
    // (alpha·m² * Q_double) / sum_q_double — one shared double division
    val est = Divide(
      Multiply(Literal(graft.ops.Sketch.alphaFor(m) * m * m),
        Cast(Literal(Q), DoubleType)),
      Cast(GetArrayItem(s, Literal(1)), DoubleType))
    CreateNamedStruct(Seq(
      Literal("m"), Literal(m),
      Literal("n_nonzero"), GetArrayItem(s, Literal(0)),
      Literal("sum_q"), GetArrayItem(s, Literal(1)),
      Literal("est"), est))
  }

  def hllReportOf(state: Column, p: Int = 8): Column =
    exprBridge.column(hllReportExpr(ex(state), p))

  /** `GROUP BY g` → one depth×width count–min counter array per group. */
  def cmSketch(key: Column, depth: Int = 4, width: Int = 1024): Column =
    exprBridge.column(
      CmSketchAgg(ex(key.cast("string")), depth, width).toAggregateExpression())

  /** Fold stored count–min states into the union's state. */
  def cmMerge(state: Column, depth: Int = 4, width: Int = 1024): Column =
    exprBridge.column(CmMergeAgg(ex(state), depth, width).toAggregateExpression())

  /** Point frequency estimate from a stored state (never undershoots). */
  def cmEstimateOf(state: Column, key: Column, depth: Int = 4, width: Int = 1024): Column =
    exprBridge.column(StaticInvoke(
      SketchAgg.getClass, LongType, "cmEstimate",
      Seq(ex(state), ex(lit(depth)), ex(lit(width)), ex(key.cast("string"))),
      Seq(ArrayType(LongType), IntegerType, IntegerType, StringType)))

  /** `GROUP BY g` → one m-bit bloom filter (as m/8 bytes) per group. */
  def bloomSketch(key: Column, m: Int = 8192, k: Int = 3): Column =
    exprBridge.column(
      BloomSketchAgg(ex(key.cast("string")), m, k).toAggregateExpression())

  /** Fold stored bloom states (bitwise OR = set union). */
  def bloomMerge(state: Column, m: Int = 8192): Column =
    exprBridge.column(BloomMergeAgg(ex(state), m).toAggregateExpression())

  private def bloomContainsExpr(state: Expression, key: Expression,
      m: Int, k: Int): Expression =
    StaticInvoke(
      SketchAgg.getClass, BooleanType, "bloomContains",
      Seq(state,
        org.apache.spark.sql.catalyst.expressions.Literal(m),
        org.apache.spark.sql.catalyst.expressions.Literal(k),
        key),
      Seq(BinaryType, IntegerType, IntegerType, StringType))

  /** Membership probe against a stored state (no false negatives). */
  def bloomContainsOf(state: Column, key: Column, m: Int = 8192, k: Int = 3): Column =
    exprBridge.column(bloomContainsExpr(ex(state), ex(key.cast("string")), m, k))

  /** struct(m, n_set, fill_ppm) from a stored state — integer-exact. */
  private def bloomReportExpr(state: Expression, m: Int): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{CreateNamedStruct, GetArrayItem, Literal}
    val s = StaticInvoke(
      SketchAgg.getClass, ArrayType(LongType, containsNull = false), "bloomSummary",
      Seq(state, Literal(m)), Seq(BinaryType, IntegerType))
    CreateNamedStruct(Seq(
      Literal("m"), Literal(m.toLong),
      Literal("n_set"), GetArrayItem(s, Literal(0)),
      Literal("fill_ppm"), GetArrayItem(s, Literal(1))))
  }

  def bloomReportOf(state: Column, m: Int = 8192): Column =
    exprBridge.column(bloomReportExpr(ex(state), m))

  /** `GROUP BY g` → sorted array of the k min distinct hex60 hashes. */
  def kmvSketch(key: Column, k: Int = 64): Column =
    exprBridge.column(
      KmvSketchAgg(ex(key.cast("string")), k).toAggregateExpression())

  /** Fold stored bottom-k states (union, re-trim to k). */
  def kmvMerge(state: Column, k: Int = 64): Column =
    exprBridge.column(KmvMergeAgg(ex(state), k).toAggregateExpression())

  /** struct(k, k_used, h_k, est_distinct) from a stored state.
    *
    * The summary StaticInvoke appears once per struct field (3×, same
    * shape as the HLL/bloom report builders): correctness is
    * unaffected, and the repeated invoke is collapsed by Spark's
    * subexpression elimination (codegen and interpreted paths both
    * CSE deterministic non-commutable expressions); these builders
    * also only ever run on POST-AGGREGATION rows — one per group —
    * never in a per-row hot path.
    */
  private def kmvReportExpr(state: Expression, k: Int): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{CreateNamedStruct, GetArrayItem, Literal}
    require(k >= 1 && k <= 4096, s"need 1 <= k <= 4096: $k")
    val s = StaticInvoke(
      SketchAgg.getClass, ArrayType(LongType, containsNull = false), "kmvSummary",
      Seq(state, Literal(k)), Seq(ArrayType(LongType), IntegerType))
    CreateNamedStruct(Seq(
      Literal("k"), Literal(k.toLong),
      Literal("k_used"), GetArrayItem(s, Literal(0)),
      Literal("h_k"), GetArrayItem(s, Literal(1)),
      Literal("est_distinct"), GetArrayItem(s, Literal(2))))
  }

  def kmvReportOf(state: Column, k: Int = 64): Column =
    exprBridge.column(kmvReportExpr(ex(state), k))

  /** `GROUP BY g` → one `[n, Σx, Σx², Σx³, Σx⁴]` moments state per
    * group (exact integer sums; the input casts to long).
    */
  def momentsSketch(x: Column): Column =
    exprBridge.column(MomentsSketchAgg(ex(x.cast("long"))).toAggregateExpression())

  /** Fold stored moments states (exact elementwise addition). */
  def momentsMerge(state: Column): Column =
    exprBridge.column(MomentsMergeAgg(ex(state)).toAggregateExpression())

  /** struct(n, mean, var_pop, skew, kurt_excess, cantelli_p99) from a
    * stored moments state — [[momentsSummary]]'s arithmetic contract,
    * one field per array slot (the repeated StaticInvoke collapses
    * under Spark CSE like the HLL/bloom/KMV report builders, and only
    * ever runs on post-aggregation rows).
    */
  private def momentsReportExpr(state: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, CreateNamedStruct, GetArrayItem, Literal}
    val s = StaticInvoke(
      SketchAgg.getClass, ArrayType(DoubleType, containsNull = false),
      "momentsSummary", Seq(state), Seq(momentsStateType))
    CreateNamedStruct(Seq(
      Literal("n"), Cast(GetArrayItem(state, Literal(0)), LongType),
      Literal("mean"), GetArrayItem(s, Literal(0)),
      Literal("var_pop"), GetArrayItem(s, Literal(1)),
      Literal("skew"), GetArrayItem(s, Literal(2)),
      Literal("kurt_excess"), GetArrayItem(s, Literal(3)),
      Literal("cantelli_p99"), GetArrayItem(s, Literal(4))))
  }

  def momentsReportOf(state: Column): Column =
    exprBridge.column(momentsReportExpr(ex(state)))

  /** Weighted moments build over a (value, weight) pair — the domain
    * trick: sketch `GROUP BY v → count` instead of raw rows.
    */
  def momentsSketchW(x: Column, w: Column): Column =
    exprBridge.column(MomentsWSketchAgg(ex(x.cast("long")),
      ex(w.cast("long"))).toAggregateExpression())

  /** Weighted log-histogram build over a (value, weight) pair. */
  def logHistSketchW(x: Column, w: Column): Column =
    exprBridge.column(LogHistWSketchAgg(ex(x.cast("long")),
      ex(w.cast("long"))).toAggregateExpression())

  /** `GROUP BY g` → one 1008-bucket log-histogram per group (input
    * casts to long; must be non-negative).
    */
  def logHistSketch(x: Column): Column =
    exprBridge.column(LogHistSketchAgg(ex(x.cast("long"))).toAggregateExpression())

  /** Fold stored log-histogram states (elementwise addition). */
  def logHistMerge(state: Column): Column =
    exprBridge.column(LogHistMergeAgg(ex(state)).toAggregateExpression())

  /** struct(n, p50_lo, p50_hi, p90_lo, p90_hi, p99_lo, p99_hi,
    * max_lo, max_hi) from a stored state — [[logHistSummary]]'s
    * integer-exact rank arithmetic, one field per array slot.
    */
  private def logHistReportExpr(state: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{CreateNamedStruct, GetArrayItem, Literal}
    val s = StaticInvoke(
      SketchAgg.getClass, ArrayType(LongType, containsNull = false),
      "logHistSummary", Seq(state), Seq(ArrayType(LongType)))
    val names = Seq("n", "p50_lo", "p50_hi", "p90_lo", "p90_hi",
      "p99_lo", "p99_hi", "max_lo", "max_hi")
    CreateNamedStruct(names.zipWithIndex.flatMap { case (nm, i) =>
      Seq(Literal(nm), GetArrayItem(s, Literal(i)))
    })
  }

  def logHistReportOf(state: Column): Column =
    exprBridge.column(logHistReportExpr(ex(state)))

  // ---- SQL surface --------------------------------------------------

  private def intArg(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal")
    e.eval().asInstanceOf[Number].intValue()
  }

  /** The SQL function set, one builder list shared by BOTH
    * registration paths — the startup `SparkSessionExtensions` hook
    * ([[graft.GraftExtensions]]) and the live-session
    * [[registerSql]] — so the two can never drift:
    * `SELECT g, hll_sketch_agg(k, 8) FROM t GROUP BY g`,
    * `hll_merge_agg(state, 8)`, `cm_sketch_agg(k, 4, 1024)`,
    * `cm_merge_agg(state, 4, 1024)`, `cm_state_est(state, k, 4, 1024)`,
    * `hll_state_report(state, 8)`. The analyzer wraps returned
    * AggregateFunctions in a Complete AggregateExpression, same as the
    * built-in registry's aggregates.
    */
  val sqlFunctions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "hll_sketch_agg" -> ((args: Seq[Expression]) =>
      HllSketchAgg(args.head,
        if (args.size > 1) intArg(args(1), "p") else 8)),
    "hll_merge_agg" -> ((args: Seq[Expression]) =>
      HllMergeAgg(args.head,
        if (args.size > 1) intArg(args(1), "p") else 8)),
    "cm_sketch_agg" -> ((args: Seq[Expression]) =>
      CmSketchAgg(args.head,
        if (args.size > 1) intArg(args(1), "depth") else 4,
        if (args.size > 2) intArg(args(2), "width") else 1024)),
    "cm_merge_agg" -> ((args: Seq[Expression]) =>
      CmMergeAgg(args.head,
        if (args.size > 1) intArg(args(1), "depth") else 4,
        if (args.size > 2) intArg(args(2), "width") else 1024)),
    "cm_state_est" -> ((args: Seq[Expression]) => {
      require(args.size >= 2,
        "cm_state_est(state, key[, depth[, width]]) needs at least (state, key)")
      StaticInvoke(
        SketchAgg.getClass, LongType, "cmEstimate",
        Seq(args.head,
          org.apache.spark.sql.catalyst.expressions.Literal(
            if (args.size > 2) intArg(args(2), "depth") else 4),
          org.apache.spark.sql.catalyst.expressions.Literal(
            if (args.size > 3) intArg(args(3), "width") else 1024),
          args(1)),
        Seq(ArrayType(LongType), IntegerType, IntegerType, StringType))
    }),
    // struct(m, n_nonzero, sum_q, est) from a stored HLL state:
    // `SELECT hll_state_report(st, 8).est FROM states`
    "hll_state_report" -> ((args: Seq[Expression]) =>
      hllReportExpr(args.head,
        if (args.size > 1) intArg(args(1), "p") else 8)),
    "bloom_sketch_agg" -> ((args: Seq[Expression]) =>
      BloomSketchAgg(args.head,
        if (args.size > 1) intArg(args(1), "m") else 8192,
        if (args.size > 2) intArg(args(2), "k") else 3)),
    "bloom_merge_agg" -> ((args: Seq[Expression]) =>
      BloomMergeAgg(args.head,
        if (args.size > 1) intArg(args(1), "m") else 8192)),
    "bloom_state_contains" -> ((args: Seq[Expression]) => {
      require(args.size >= 2,
        "bloom_state_contains(state, key[, m[, k]]) needs at least (state, key)")
      bloomContainsExpr(args.head, args(1),
        if (args.size > 2) intArg(args(2), "m") else 8192,
        if (args.size > 3) intArg(args(3), "k") else 3)
    }),
    "bloom_state_report" -> ((args: Seq[Expression]) =>
      bloomReportExpr(args.head,
        if (args.size > 1) intArg(args(1), "m") else 8192)),
    "kmv_sketch_agg" -> ((args: Seq[Expression]) =>
      KmvSketchAgg(args.head,
        if (args.size > 1) intArg(args(1), "k") else 64)),
    "kmv_merge_agg" -> ((args: Seq[Expression]) =>
      KmvMergeAgg(args.head,
        if (args.size > 1) intArg(args(1), "k") else 64)),
    "kmv_state_report" -> ((args: Seq[Expression]) =>
      kmvReportExpr(args.head,
        if (args.size > 1) intArg(args(1), "k") else 64)),
    "moments_sketch_agg" -> ((args: Seq[Expression]) =>
      MomentsSketchAgg(args.head)),
    "moments_merge_agg" -> ((args: Seq[Expression]) =>
      MomentsMergeAgg(args.head)),
    "moments_state_report" -> ((args: Seq[Expression]) =>
      momentsReportExpr(args.head)),
    "loghist_sketch_agg" -> ((args: Seq[Expression]) =>
      LogHistSketchAgg(args.head)),
    "loghist_merge_agg" -> ((args: Seq[Expression]) =>
      LogHistMergeAgg(args.head)),
    "loghist_state_report" -> ((args: Seq[Expression]) =>
      logHistReportExpr(args.head)),
    "moments_wsketch_agg" -> ((args: Seq[Expression]) => {
      require(args.size == 2, "moments_wsketch_agg(x, w) needs (x, w)")
      MomentsWSketchAgg(args.head, args(1))
    }),
    "loghist_wsketch_agg" -> ((args: Seq[Expression]) => {
      require(args.size == 2, "loghist_wsketch_agg(x, w) needs (x, w)")
      LogHistWSketchAgg(args.head, args(1))
    }))

  /** Install [[sqlFunctions]] into an already-running session. */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit =
    sqlFunctions.foreach { case (name, b) =>
      exprBridge.registerTempFunction(spark, name, b)
    }
}
