package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextKernels

/** [EXT] PORTABLE probabilistic sketches — cardinality (HyperLogLog)
  * and frequency (count–min) summaries whose every intermediate is an
  * integer derived from the shared md5-based hex60 hash, so Spark and
  * a SQL oracle build bit-identical register states. At 100 TB these
  * are the bounded-memory answers to "how many distinct" and "how
  * often" — a full distinct is a corpus-wide shuffle, a sketch is one
  * map-side pass + a register-domain aggregation (the register count,
  * not the data, bounds every shuffle).
  *
  * Spark's built-ins (`approx_count_distinct`, HLL++ with its own
  * xxhash/bias tables) are NOT replayable in another engine; these
  * deliberately trade their bias corrections for engine-exact
  * repltestability — the estimate's integer numerator/denominator are
  * emitted alongside so the oracle compares exact longs and the one
  * double division is shared.
  *
  * Public algorithms: Flajolet–Fuset–Gandouet–Meunier, "HyperLogLog"
  * (AofA 2007); Cormode–Muthukrishnan, "An improved data stream
  * summary: the count-min sketch" (J. Algorithms 2005).
  */
object Sketch {

  /** Rank of the highest set bit via the `bin()` string both engines
    * share (no floats): bin(w) has no leading zeros, so its LENGTH is
    * ⌊log₂ w⌋ + 1 for w > 0.
    */
  private def msbLen(w: Column): Column =
    when(w > 0, length(bin(w)).cast("long")).otherwise(lit(0L))

  /** HyperLogLog register state over `keyCol`: 2^p registers indexed
    * by the TOP p bits of the 60-bit hash; each holds max ρ(w) where
    * w = the remaining 60−p bits and ρ = leading-zero count + 1
    * (computed integer-only via [[msbLen]]). Registers that saw no
    * key are omitted (their ρ is 0) — [[hllReport]] accounts for them
    * arithmetically.
    *
    * Output: (reg, rho) — one row per NON-EMPTY register, reg in
    * [0, 2^p), rho ≥ 1.
    */
  def hllRegisters(df: DataFrame, keyCol: String, p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"need 4 <= p <= 16: $p")
    val h = TextKernels.hex60(col(keyCol).cast("string"))
    val wBits = 60 - p
    df.filter(col(keyCol).isNotNull)
      .select(shiftright(h, wBits).as("reg"),
        (h.bitwiseAND(lit((1L << wBits) - 1))).as("w"))
      .select(col("reg"), (lit(wBits + 1) - msbLen(col("w"))).as("rho"))
      .groupBy(col("reg")).agg(max(col("rho")).as("rho"))
  }

  /** One-row HLL cardinality report. The raw-estimate harmonic sum is
    * quantized EXACTLY: S = Σ_j ⌊2^40 / 2^ρ_j⌋ over all 2^p registers
    * (empty ones contribute 2^40), an order-independent long, so both
    * engines agree on it bit-for-bit; the classic estimate
    * E = α_m·m²·2^40 / S is then ONE double division of identical
    * integers (α_m folded into the numerator as the published
    * constant). No small/large-range corrections — they need ln(),
    * which engines round differently; for the |S| ≫ m regime a
    * curation pipeline sizes (billions of keys into ≤ 65k registers)
    * the raw estimator is the published one. Relative error ≈
    * 1.04/√m (~6.5% at p = 8).
    *
    * Output: (m, n_nonzero, sum_q, est) — the first three exact longs
    * (the oracle-comparable state), est the shared double.
    */
  /** Published α_m per the HLL paper: fixed constants for the small
    * register counts, the asymptotic formula from m = 128 up. Shared
    * with the aggregate-function surface
    * ([[graft.functions.SketchAgg]]) so the two can never disagree.
    */
  private[graft] def alphaFor(m: Long): Double = m match {
    case 16L => 0.673
    case 32L => 0.697
    case 64L => 0.709
    case _   => 0.7213 / (1.0 + 1.079 / m)
  }

  def hllReport(df: DataFrame, keyCol: String, p: Int = 8): DataFrame = {
    val m = 1L << p
    val alpha = alphaFor(m)
    val Q = 1L << 40
    hllRegisters(df, keyCol, p)
      .agg(count(lit(1)).as("n_nonzero"),
        sum(expr(s"shiftright(${Q}L, cast(rho as int))")).as("__s_obs"))
      .select(lit(m).as("m"), col("n_nonzero"),
        (coalesce(col("__s_obs"), lit(0L)) +
          (lit(m) - coalesce(col("n_nonzero"), lit(0L))) * Q).as("sum_q"))
      .withColumn("est",
        lit(alpha * m * m) * lit(Q).cast("double") / col("sum_q").cast("double"))
  }

  /** Merge HLL register tables built over DIFFERENT data slices into
    * the register table of their union — registers combine by MAX,
    * the HLL mergeability property (the union's register saw the max ρ
    * either slice saw). Counterpart of [[countMinMerge]]; the
    * aggregate-function form is
    * [[graft.functions.SketchAgg.hllMerge]].
    */
  def hllMerge(tables: Seq[DataFrame]): DataFrame = {
    require(tables.nonEmpty, "need at least one register table")
    tables.reduce(_ unionByName _)
      .groupBy(col("reg")).agg(max(col("rho")).as("rho"))
  }

  /** Count–min counter table over `keyCol`: `depth` independent hash
    * rows (salted hex60) × `width` columns; each counter is the count
    * of keys landing in its cell. One scan, one aggregation keyed on
    * the (row, col) register domain (depth × width cells, never the
    * key space).
    *
    * Output: (row, col, cnt) — non-empty cells only.
    */
  def countMinTable(df: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 1 && depth <= 16, s"need 1 <= depth <= 16: $depth")
    require(width >= 2, s"need width >= 2: $width")
    val rows = (0 until depth).map { i =>
      struct(lit(i.toLong).as("row"),
        pmod(TextKernels.hex60(concat(lit(s"cm$i:"),
          col(keyCol).cast("string"))), lit(width.toLong)).as("col"))
    }
    df.filter(col(keyCol).isNotNull)
      .select(explode(array(rows: _*)).as("rc"))
      .groupBy(col("rc.row").as("row"), col("rc.col").as("col"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge count–min tables built over DIFFERENT data slices (shards,
    * days, batches) into the table of their union — counters add
    * cell-wise, which is the property that makes the sketch a
    * distributed summary: build per-partition/per-day, keep the tiny
    * (depth×width) tables, merge on demand; estimates from the merged
    * table are exactly the estimates a single pass over the combined
    * data would give (spec-pinned).
    */
  def countMinMerge(tables: Seq[DataFrame]): DataFrame = {
    require(tables.nonEmpty, "need at least one sketch table")
    tables.reduce(_ unionByName _)
      .groupBy(col("row"), col("col"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Count–min accuracy audit: the exact top-`k` keys (count desc, key
    * asc) joined against their sketch estimates — est = min over the
    * depth rows of the counter the key hashes to. The sketch NEVER
    * underestimates (est ≥ exact, a hard invariant the spec pins);
    * the overshoot column is the collision mass the width/depth choice
    * admits.
    *
    * The top-k exact counts and the k×depth probe joins are all
    * register- or k-bounded; only the two counting scans touch the
    * corpus.
    *
    * Output: (key, exact, est, overshoot = est − exact).
    */
  def countMinAudit(df: DataFrame, keyCol: String, k: Int = 20,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    require(k >= 1, s"need k >= 1: $k")
    val table = countMinTable(df, keyCol, depth, width)
    val exact = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("exact"))
    // global top-k as orderBy+limit — Spark plans TakeOrderedAndProject
    // (per-partition heaps merged at the driver), never a
    // one-partition sort of the whole key domain
    val top = exact.orderBy(col("exact").desc, col("key").asc).limit(k)
    val probes = top.select(col("key"), col("exact"),
      explode(array((0 until depth).map { i =>
        struct(lit(i.toLong).as("row"),
          pmod(TextKernels.hex60(concat(lit(s"cm$i:"), col("key"))),
            lit(width.toLong)).as("col"))
      }: _*)).as("rc"))
      .select(col("key"), col("exact"),
        col("rc.row").as("row"), col("rc.col").as("col"))
    probes
      .join(table, Seq("row", "col"))
      .groupBy(col("key"), col("exact"))
      .agg(min(col("cnt")).as("est"))
      .withColumn("overshoot", col("est") - col("exact"))
  }

  /** Equi-join SIZE estimation from two count–min sketches (the
    * Alon–Gibbons–Matias–Szegedy inner-product application the CM
    * paper formalizes): |A ⋈ B| = Σ_k f_A(k)·f_B(k) is estimated by
    * `min over rows i of Σ_col cmA[i][col]·cmB[i][col]` — an
    * OVERestimate, tightening as width grows. This is the
    * bounded-memory answer to "how big is this join going to be"
    * that a pipeline asks before committing to a shuffle strategy —
    * each side is sketched in one scan, the inner product runs on the
    * depth×width register domain, and the sketches are mergeable
    * across partitions/batches by addition.
    *
    * Products and sums accumulate as decimal(38,0) (two 100 TB-side
    * counters can multiply past long range); the emitted longs are
    * range-guarded like [[graft.ops.Graph.modularity]]'s numerator.
    * The exact join size is computed alongside (one count per side +
    * an equi-join of the two per-key count tables — NOT the join
    * itself) so the output is a self-contained accuracy audit.
    *
    * Output: one row (exact_size, est_size, overshoot) — est ≥ exact
    * always (the CM invariant, spec-pinned).
    */
  def joinSizeEstimate(a: DataFrame, aKey: String, b: DataFrame, bKey: String,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    val dec = "decimal(38,0)"
    val ta = countMinTable(a.select(col(aKey).as("k")), "k", depth, width)
    val tb = countMinTable(b.select(col(bKey).as("k")), "k", depth, width)
    // a sketch row whose cells never overlap has inner product 0 — the
    // min must SEE that 0 (it is the tightest bound), so the per-row
    // products land on an explicit 0..depth-1 spine before the fold
    val ips = ta.as("a").join(tb.as("b"), Seq("row", "col"))
      .groupBy(col("row"))
      .agg(sum(col("a.cnt").cast(dec) * col("b.cnt")).as("ip"))
    val est = a.sparkSession.range(depth).select(col("id").as("row"))
      .join(ips, Seq("row"), "left")
      .agg(min(coalesce(col("ip"), lit(0).cast(dec))).as("est_d"))
    val fa = a.filter(col(aKey).isNotNull)
      .groupBy(col(aKey).cast("string").as("k")).agg(count(lit(1)).as("ca"))
    val fb = b.filter(col(bKey).isNotNull)
      .groupBy(col(bKey).cast("string").as("k")).agg(count(lit(1)).as("cb"))
    val exact = fa.join(fb, Seq("k"))
      .agg(coalesce(sum(col("ca").cast(dec) * col("cb")),
        lit(0).cast(dec)).as("exact_d"))
    exact.crossJoin(broadcast(est))
      .select(
        when(abs(col("exact_d")) <= lit(Long.MaxValue),
          col("exact_d").cast("long")).as("exact_size"),
        when(abs(col("est_d")) <= lit(Long.MaxValue),
          col("est_d").cast("long")).as("est_size"),
        when(abs(col("est_d") - col("exact_d")) <= lit(Long.MaxValue),
          (col("est_d") - col("exact_d")).cast("long")).as("overshoot"))
  }
}
