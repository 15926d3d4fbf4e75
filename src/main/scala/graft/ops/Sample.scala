package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextKernels
import graft.util.Pin.PinOps

/** [EXT] Deterministic sampling for training-data curation.
  *
  * `stratifiedByHash` keeps the first `n` rows per stratum in md5-hash
  * order of the id — a balanced per-class subsample that is a pure
  * function of the data: reproducible across engines, runs, cluster
  * sizes, and partitionings (unlike `sampleBy`, whose RNG draw depends
  * on partition layout). The hash order is effectively uniform-random
  * but frozen, so the sample is unbiased w.r.t. any column not
  * correlated with md5(id).
  *
  * Shape: selection runs as a bounded min-k heap partial aggregate
  * ([[graft.functions.TopKHeap.minK]]) over (hash, id) — each map
  * task pre-reduces every stratum to ≤ n candidates, so the exchange
  * carries n × strata × partitions SLIM rows and a hot stratum never
  * concentrates its full row set on one reducer (the window-rank
  * formulation would sort a whole stratum in one partition). The
  * picked id set (n × strata — small by the definition of a sample)
  * broadcasts back as a semi-join, so the big table itself is never
  * shuffled at all.
  */
object Sample {

  /** `idCol` must cast losslessly to long (the heap selects on
    * (60-bit hash, id) pairs of longs).
    *
    * The pick-list semi-join matches on (stratum, id), not the id
    * alone: ids need only be unique WITHIN a stratum — an id that
    * repeats across strata must not drag its other-stratum rows into
    * the sample.
    */
  def stratifiedByHash(
      df: DataFrame, stratumCols: Seq[String], idCol: String,
      n: Int): DataFrame = {
    val h = TextKernels.hex60(col(idCol).cast("string"))
    val picked = df
      .select(stratumCols.map(col) :+ h.as("__h") :+
        col(idCol).cast("long").as("__id"): _*)
      .groupBy(stratumCols.map(col): _*)
      .agg(graft.functions.TopKHeap.minK(col("__h"), col("__id"), n).as("__sel"))
      .select(stratumCols.map(c => col(c).as(s"__s_$c")) :+
        explode(col("__sel.id")).as("__pid"): _*)
    // null-safe stratum equality: a NULL stratum is a group like any
    // other and its picks must match back
    val cond = stratumCols.map(c => df(c) <=> col(s"__s_$c"))
      .reduce(_ && _) && (df(idCol).cast("long") === col("__pid"))
    df.join(broadcast(picked), cond, "left_semi")
  }

  /** Mixture (per-class rate) sampling: keep a row when its id hash
    * lands under the class's rate — the data-mixing knob (upsample
    * high-quality sources, downsample boilerplate ones) as a pure
    * function of the data. Entirely map-side: no shuffle, no RNG, the
    * same row keeps/drops identically on every engine, run, and
    * partitioning. Rates are in [0, 1]; classes absent from the map
    * use `defaultRate`.
    */
  def mixtureByHash(
      df: DataFrame, classCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame =
    df.filter(mixtureKeeps(classCol, idCol, rates, defaultRate))

  /** The [[mixtureByHash]] keep VERDICT as a Column — exposed so
    * composite reports (the attrition funnel) can classify rows by the
    * exact same hash/threshold decision the sampler applies, defined
    * once.
    */
  def mixtureKeeps(classCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0): Column = {
    val M = 1000000L
    val bucket = pmod(TextKernels.hex60(col(idCol).cast("string")), lit(M))
    val threshold = rates.foldLeft(lit((defaultRate * M).toLong)) {
      case (acc, (cls, rate)) =>
        when(col(classCol) === cls, lit((rate * M).toLong)).otherwise(acc)
    }
    bucket < threshold
  }

  /** Weight-proportional systematic sampling: lay every row's integer
    * weight end-to-end along a line in `idCol` order, then take the
    * rows covering the `k` evenly spaced points `step, 2·step, …`
    * (`step = totalWeight div k`). Classic PPS sampling — a row's
    * selection probability is proportional to its weight, heavy rows
    * can be hit more than once (`n_hits`) — and, like the other
    * samplers here, a pure INTEGER function of the data: no RNG, no
    * floats, reproducible on any engine or partitioning.
    *
    * The cumulative weight is the global prefix sum, computed
    * distributed via [[Sweep.runningSum]] (never a one-partition
    * sort); the total and step derive in-plan from a 1-row aggregate
    * broadcast. Row i is hit once per multiple of `step` inside
    * `(cum_i - w_i, cum_i]`, i.e.
    * `min(cum_i div step, k) - min((cum_i - w_i) div step, k)`.
    *
    * Rows with non-positive weight are excluded (zero-weight rows can
    * never be hit; the guard also keeps the prefix sum monotone), and
    * so are NULL-id rows (no position on the line) — consistently in
    * BOTH the line and the total, or the step would be derived from
    * more mass than the line holds and the tail points would select
    * nothing.
    *
    * `idCol` must be UNIQUE (it is the position on the line): duplicate
    * ids collapse into one combined-weight row in the prefix sum —
    * dedup or synthesize a unique id first.
    */
  def weightedSystematic(
      df: DataFrame, idCol: String, weightCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val eligible = col(weightCol) > 0 && col(idCol).isNotNull
    val pos = df.filter(eligible)
      .select(col(idCol).cast("long"), col(weightCol).cast("long"))
    // total weight as a driver scalar (the sanctioned watermark-read
    // class, like Sweep's own bounds) — folding `step` to a literal
    // keeps the sweep lineage out of a second in-plan aggregate
    // total and the sweep's bucket bounds in ONE cheap scalar job over
    // the raw columns, so the sweep's bounds pass never re-executes
    // the (potentially expensive) weight lineage
    val scalars = df.agg(
      sum(when(eligible, col(weightCol)).cast("long")),
      min(col(idCol).cast("long")), max(col(idCol).cast("long"))).head()
    if (scalars.isNullAt(0))
      return pos.select(col(idCol), col(weightCol).as("w"), lit(0L).as("n_hits"))
        .limit(0)
    val total = scalars.getLong(0)
    val step = math.max(total / k, 1L)
    Sweep.runningSum(pos, idCol, weightCol,
        bounds = Some((scalars.getLong(1), scalars.getLong(2))))
      .select(col("t").as(idCol), col("d").as("w"), col("running"))
      .withColumn("n_hits",
        least(expr(s"running div ${step}L"), lit(k.toLong)) -
          least(expr(s"(running - w) div ${step}L"), lit(k.toLong)))
      .filter(col("n_hits") > 0)
      .select(col(idCol), col("w"), col("n_hits"))
  }

  /** Group-aware k-fold assignment — the leakage-free split: every row
    * of a GROUP (user, session, document family) lands in the same
    * fold, so examples correlated through their group can never sit on
    * both sides of a train/eval boundary (the group-k-fold contract;
    * q38's row-level hash split cannot give it). Fold =
    * `hex60(salt ‖ group) mod k` — map-side, RNG-free, stable across
    * engines/runs/partitionings, and independent of every column but
    * the group key, so the split is unbiased w.r.t. anything not
    * correlated with the hash.
    *
    * Null groups form one group of their own: the hashed key is
    * `"0"` for null and `"1" ‖ value` otherwise — a prefix code, so
    * no real group value can collide with the null group.
    */
  def groupFolds(df: DataFrame, groupCol: String, k: Int,
      seed: Long = 0L): DataFrame = {
    require(k >= 2, s"need k >= 2 folds: $k")
    val key = when(col(groupCol).isNull, lit("0"))
      .otherwise(concat(lit("1"), col(groupCol).cast("string")))
    df.withColumn("fold",
      pmod(TextKernels.hex60(concat(lit(s"gf$seed:"), key)), lit(k.toLong)))
  }

  /** The audit a split ships with: per fold, how many groups and rows
    * it holds (balanced folds and no group straddling — the latter is
    * structural, the former is what this measures). Two stacked hash
    * aggregations over (fold, group) — never a distinct Expand.
    * Output: (fold, n_groups, n_rows).
    */
  def groupFoldReport(df: DataFrame, groupCol: String, k: Int,
      seed: Long = 0L): DataFrame =
    groupFolds(df, groupCol, k, seed)
      .groupBy(col("fold"), col(groupCol))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col("fold"))
      .agg(count(lit(1)).as("n_groups"), sum(col("__n")).as("n_rows"))

  /** Temperature-scaled mixture quotas: allocate a `budget` of
    * training examples across sources proportionally to
    * `count^(1/2)` — the α=0.5 temperature reweighting multilingual /
    * multi-source pretraining uses to damp head sources and boost tail
    * ones — with exact largest-remainder apportionment so the quotas
    * sum to EXACTLY `budget`.
    *
    * Determinism: the weight is `floor(sqrt(n) · 2²⁰)` — sqrt is
    * IEEE-correctly-rounded and ×2²⁰ only shifts the exponent, so the
    * weight is the same integer on every engine; every sum thereafter
    * is integer (order-independent), and the only floats in the output
    * are single divisions of exact longs. Apportionment: each source
    * gets `(w·budget) div W` plus one of the `budget − Σfloor`
    * leftovers, awarded by (remainder desc, source asc) rank.
    *
    * Shape: one count aggregation over the corpus; everything after
    * runs on |sources| rows (window over a single tiny partition).
    *
    * Output: (classCol, n_docs, w, share, quota).
    */
  def temperatureQuota(
      df: DataFrame, classCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val counts = df.groupBy(col(classCol))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w", floor(sqrt(col("n_docs").cast("double")) * (1L << 20)))
    val all = Window.partitionBy()
    // NULLS LAST: match the ANSI/DuckDB collation on the tie-break
    // (Spark's bare asc is nulls-first) — see proportionalSample
    val byRem = Window.partitionBy()
      .orderBy(col("rem").desc, col(classCol).asc_nulls_last)
    counts
      .withColumn("total_w", sum(col("w")).over(all))
      // w·budget in DECIMAL(38,0): both factors can be ~1e11 at corpus
      // scale, so the product must not be a long multiply
      .withColumn("base",
        expr(s"(CAST(w AS DECIMAL(38,0)) * ${budget}L) div total_w"))
      .withColumn("rem",
        expr(s"CAST((CAST(w AS DECIMAL(38,0)) * ${budget}L) % total_w AS BIGINT)"))
      .withColumn("deficit", lit(budget) - sum(col("base")).over(all))
      .withColumn("quota",
        col("base") + when(row_number().over(byRem) <= col("deficit"), 1L)
          .otherwise(0L))
      .select(col(classCol), col("n_docs"), col("w"),
        (col("w").cast("double") / col("total_w").cast("double")).as("share"),
        col("quota"))
  }

  /** Leakage-safe train/validation/test split: the split is a pure
    * function of the dedup CLUSTER key (`clusterCol` — e.g. the
    * near-dup survivor's keep_id), never of the row — so
    * near-duplicates can never straddle splits, which is the
    * train/test contamination channel group-wise splitting exists to
    * close (a per-document split leaks every duplicated passage from
    * train into test). Deterministic and engine-portable like every
    * sampler here: bucket = hex60(salt ‖ cluster) mod `den`, split i
    * = first cumulative cut the bucket falls under (`cuts` are
    * strictly increasing numerators over `den`; buckets ≥ the last
    * cut land in split `cuts.size`). Entirely map-side — no shuffle,
    * no RNG; adds a `split` column.
    *
    * Example: `cuts = Seq(900, 950), den = 1000` → split 0 (train)
    * holds ~90% of CLUSTERS, split 1 (valid) ~5%, split 2 (test) ~5%
    * — proportions are over clusters, not documents, by design: a
    * giant near-dup cluster belongs wholly to one side.
    */
  def leakageSafeSplit(df: DataFrame, clusterCol: String,
      cuts: Seq[Int], den: Int = 1000,
      salt: String = "split"): DataFrame = {
    require(cuts.nonEmpty, "need at least one cut point")
    require(cuts == cuts.sorted && cuts.distinct == cuts,
      s"cuts must be strictly increasing: $cuts")
    require(cuts.head > 0 && cuts.last < den,
      s"cuts must lie strictly inside (0, $den): $cuts")
    val bucket = TextKernels.hex60(
      concat(lit(salt), col(clusterCol).cast("string"))) % den
    val split = cuts.zipWithIndex.foldRight(lit(cuts.size.toLong): Column) {
      case ((cut, i), rest) => when(bucket < cut, lit(i.toLong)).otherwise(rest)
    }
    df.withColumn("split", split)
  }

  /** Contamination audit over a [[leakageSafeSplit]]-tagged corpus:
    * how many of the TEST split's distinct word n-grams also occur in
    * the TRAIN split — the overlap an eval owner measures before
    * trusting held-out numbers (near-dup-safe splitting removes
    * document-level leakage; common n-grams still straddle, and this
    * quantifies how much). One row:
    * (n_test_grams, n_contaminated, contamination_ppm), the ratio an
    * exact integer division.
    *
    * Shape at scale: the standard decontamination explode — n-grams
    * hash to fixed-width 60-bit keys, distinct per (gram, split)
    * map-side-combines before the one shuffle keyed on the gram, and
    * the per-gram presence fold is two booleans; no doc×doc term
    * anywhere. (q112/q201 run the same shape against an external
    * benchmark; this audits the split against itself.)
    */
  def splitContamination(tagged: DataFrame, textCol: String,
      trainSplit: Long, testSplit: Long, n: Int = 8): DataFrame = {
    require(n >= 1, s"n-gram order must be positive: $n")
    require(trainSplit != testSplit, "train and test must differ")
    // compiled single-pass n-gram digests: Kernels.shingleHashes60
    // emits each doc's DISTINCT window hex60s in one pass (already
    // per-doc deduped, so the distinct shuffle receives fewer rows),
    // where the former HOF form allocated a window string per token
    // position and hashed it as a separate expression. Same global
    // (split, gh) set: the kernel hashes the identical
    // space-joined token windows. Docs shorter than n tokens emit
    // nothing (the kernel's whole-text fallback row is gated off).
    val toks = TextKernels.tokens(col(textCol))
    val grams = tagged
      .filter(col("split").isin(trainSplit, testSplit))
      .select(col("split"),
        when(size(toks) >= n,
          graft.functions.Kernels.shingleHashes60Of(col(textCol), n))
          .otherwise(array().cast("array<long>")).as("gs"))
      .select(col("split"), explode(col("gs")).as("gh"))
      .distinct()
    grams.groupBy(col("gh"))
      .agg(max(when(col("split") === trainSplit, 1).otherwise(0)).as("in_train"),
        max(when(col("split") === testSplit, 1).otherwise(0)).as("in_test"))
      .agg(sum(col("in_test")).cast("long").as("n_test_grams"),
        sum(col("in_train") * col("in_test")).cast("long").as("n_contaminated"))
      .withColumn("contamination_ppm", expr(
        """CASE WHEN n_test_grams > 0
             THEN CAST((1000000 * CAST(n_contaminated AS DECIMAL(38,0)))
               DIV CAST(n_test_grams AS DECIMAL(38,0)) AS BIGINT)
             ELSE CAST(0 AS BIGINT) END"""))
  }

  /** Proportionally allocated stratified sample: split `budget` rows
    * across strata ∝ stratum size with exact largest-remainder
    * apportionment (quotas sum to EXACTLY the budget — the q119 rule,
    * here at α=1), then take each stratum's quota as the rows with the
    * SMALLEST salted id hashes — deterministic bottom-k, the same
    * frozen-uniform draw as [[stratifiedByHash]] but with a per-stratum
    * k the data decides. The eval-set builder's sampler: proportions
    * match the corpus, membership is a pure function of the data.
    *
    * Output: one row per sampled id —
    * (`stratumCol`, `idCol`, rank 1..quota in hash order, n_rows,
    * quota).
    *
    * Shape at scale: selection is the bounded min-k heap partial
    * aggregate ([[graft.functions.TopKHeap.minK]]) sized at the LARGEST
    * stratum quota — each map task pre-reduces every stratum to
    * ≤ max-quota candidates, so the exchange carries
    * max-quota × strata × partitions slim (hash, id) pairs and a hot
    * stratum never window-sorts its full row set on one reducer;
    * per-stratum trims to the exact quota happen on the exploded
    * ≤ budget-row result against the broadcast |strata|-row quota
    * table. The two driver-side values (max quota; the quota table is
    * joined, not collected) are 1-row/bounded aggregates — the
    * accepted collect class.
    *
    * `idCol` must cast losslessly to long and be unique within its
    * stratum (the heap selects (60-bit hash, id) long pairs).
    *
    * The source scans exactly twice — once for the stratum counts
    * (the |strata|-row quota frame is [[graft.util.Pin.cut]] before
    * the max-quota action, so neither that action nor the broadcast
    * join re-executes the counting scan) and once for the heap pass.
    */
  def proportionalSample(df: DataFrame, stratumCol: String, idCol: String,
      budget: Long, salt: String = "psample"): DataFrame = {
    require(budget > 0 && budget <= Int.MaxValue,
      s"budget must be in (0, 2^31): $budget")
    val counts = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_rows"))
    val all = Window.partitionBy()
    // NULLS LAST on the stratum tie-break: Spark's bare asc sorts
    // nulls first while the ANSI/DuckDB `ORDER BY ... ASC` the oracle
    // runs places them last — with a null stratum key tied on
    // remainder the +1 quota would land on a different stratum
    val byRem = Window.partitionBy()
      .orderBy(col("rem").desc, col(stratumCol).asc_nulls_last)
    // exact largest-remainder apportionment in decimal(38,0) — the
    // n_rows × budget product can pass 2^63 at corpus scale
    val quotas = counts
      .withColumn("total", sum(col("n_rows")).over(all))
      .withColumn("base",
        expr(s"CAST((CAST(n_rows AS DECIMAL(38,0)) * ${budget}L) div total AS BIGINT)"))
      .withColumn("rem",
        expr(s"CAST((CAST(n_rows AS DECIMAL(38,0)) * ${budget}L) % total AS BIGINT)"))
      .withColumn("deficit", lit(budget) - sum(col("base")).over(all))
      .withColumn("quota",
        col("base") + when(row_number().over(byRem) <= col("deficit"), 1L)
          .otherwise(0L))
      .select(col(stratumCol), col("n_rows"), col("quota"))
      // pin the |strata|-row quota frame: the max action below and the
      // broadcast join both read it, and without the cut each would
      // re-execute the source counting scan (cheap to pin at any
      // scale — two longs per stratum)
      .cutLineage
    val maxQRow = quotas.agg(max(col("quota"))).head
    // empty input: no strata, no quotas — an empty result in the
    // output schema (budget > 0 otherwise forces max quota ≥ 1)
    if (maxQRow.isNullAt(0))
      return df.select(col(stratumCol), col(idCol).cast("long").as(idCol),
        lit(0L).as("rank"), lit(0L).as("n_rows"), lit(0L).as("quota"))
        .filter(lit(false))
    val maxQ = maxQRow.getLong(0)
    val h = TextKernels.hex60(concat(lit(salt), col(idCol).cast("string")))
    df.select(col(stratumCol), h.as("__h"), col(idCol).cast("long").as("__id"))
      .groupBy(col(stratumCol))
      .agg(graft.functions.TopKHeap.minK(
        col("__h"), col("__id"), maxQ.toInt).as("__sel"))
      .select(col(stratumCol), posexplode(col("__sel")).as(Seq("__i", "__t")))
      .join(broadcast(quotas), Seq(stratumCol))
      .filter(col("__i") < col("quota"))
      .select(col(stratumCol), col("__t.id").as(idCol),
        (col("__i") + 1).cast("long").as("rank"),
        col("n_rows"), col("quota"))
  }

  /** Epoch-capped mixture allocation: the data-mixture table a
    * pretraining run is configured from (reference semantics: the
    * published up/down-sampling-with-epoch-caps recipe — give each
    * source its target share of the token budget, but never ask a
    * source for more than `maxEpochsPpm`/10⁶ passes over what it has;
    * budget a capped source can't absorb flows to the uncapped ones
    * in proportion to their shares).
    *
    * The redistribution is solved in CLOSED FORM, not iteratively:
    * sort sources by cap/share ascending — the capped set is always a
    * prefix of that order — and a source is capped iff
    * `cap·(S − preShare) ≤ share·(B − preCap)` held at every point up
    * to and including it (a running-AND window), where preCap/preShare
    * are prefix sums over the sorted predecessors. Uncapped sources
    * then split the residual budget by exact largest-remainder
    * apportionment (the [[proportionalSample]] rule), so allocations
    * sum to EXACTLY `min(budget, Σ cap)`. The sort key is
    * ⌊cap·10¹²/share⌋: with shares bounded by 10⁶ ppm, two distinct
    * true ratios differ by ≥ 10⁻¹², so the scaled floors order
    * exactly as the rationals do; equal ratios tie-break on the class
    * name. The largest-remainder +1 can never breach a cap: an
    * uncapped source has share·B′/S′ < cap strictly, so
    * ⌊share·B′/S′⌋ + 1 ≤ cap.
    *
    * All arithmetic runs in DECIMAL(38,0) — cap×S products pass 2⁶³
    * at 100 TB token counts — and every step is integer-exact, so
    * both engines derive the identical table.
    *
    * Classes absent from `sharesPpm` (or with share 0) take no part
    * in the water-fill and report alloc 0; shares implicitly
    * renormalize over the classes PRESENT in the data (S = Σ share of
    * observed classes).
    *
    * Shape at scale: ONE corpus pass aggregates per-class weights;
    * everything after runs on the pinned |classes|-row frame
    * (windows over it are the bounded-frame class, same as
    * [[proportionalSample]]'s quota table).
    *
    * Output: (classCol, avail, share_ppm, cap, capped, alloc,
    * epochs_ppm) — epochs_ppm = ⌊alloc·10⁶/avail⌋, null when the
    * class has no mass or takes no part (share 0).
    */
  def mixtureAllocate(df: DataFrame, classCol: String, weight: Column,
      sharesPpm: Map[String, Long], budget: Long,
      maxEpochsPpm: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(maxEpochsPpm > 0, s"maxEpochsPpm must be positive: $maxEpochsPpm")
    require(sharesPpm.values.forall(s => s >= 0 && s <= 1000000L),
      "shares are ppm in [0, 1e6]")
    val M = 1000000L
    val shareExpr = sharesPpm.foldLeft(lit(0L)) { case (acc, (cls, p)) =>
      when(col(classCol) === lit(cls), lit(p)).otherwise(acc)
    }
    // the one corpus pass; the |classes|-row result is pinned so the
    // participant/zero split below never re-reads the source
    val counts = df.groupBy(col(classCol))
      .agg(sum(weight).cast("long").as("avail"))
      .withColumn("share_ppm", shareExpr)
      .withColumn("cap", expr(
        s"CAST((CAST(avail AS DECIMAL(38,0)) * ${maxEpochsPpm}L) div ${M}L AS BIGINT)"))
      .cutLineage
    val zeros = counts.filter(col("share_ppm") <= 0L)
      .select(col(classCol), col("avail"), col("share_ppm"), col("cap"),
        lit(false).as("capped"), lit(0L).as("alloc"),
        lit(null).cast("long").as("epochs_ppm"))
    val parts = counts.filter(col("share_ppm") > 0L)
      .withColumn("rkey", expr(
        "CAST(CAST(cap AS DECIMAL(38,0)) * 1000000000000 div share_ppm AS DECIMAL(38,0))"))
    // the windows run over the pinned |classes|-row frame, never the
    // corpus; the partition key is a constant-by-value non-foldable
    // expression (pmod(share_ppm, 1) ≡ 0 — share_ppm > 0 here) so the
    // single partition is DECLARED and WindowExec's "No Partition
    // Defined" warning stays reserved for accidental O(data) funnels
    // (the Sweep rule)
    val onePart = pmod(col("share_ppm"), lit(1))
    val byRatio = Window.partitionBy(onePart)
      .orderBy(col("rkey").asc, col(classCol).asc_nulls_last)
    val pre = byRatio.rowsBetween(Window.unboundedPreceding, -1)
    val upto = byRatio.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(onePart)
    val leveled = parts
      .withColumn("pre_cap", coalesce(sum(col("cap")).over(pre), lit(0L)))
      .withColumn("pre_share", coalesce(sum(col("share_ppm")).over(pre), lit(0L)))
      .withColumn("s_all", sum(col("share_ppm")).over(all))
      .withColumn("cond", expr(
        s"""CAST(cap AS DECIMAL(38,0)) * (s_all - pre_share)
            <= CAST(share_ppm AS DECIMAL(38,0)) * (${budget}L - pre_cap)"""))
      .withColumn("capped",
        min(when(col("cond"), 1L).otherwise(0L)).over(upto) === 1L)
    val byRem = Window.partitionBy(onePart)
      .orderBy(col("rem").desc, col(classCol).asc_nulls_last)
    val alloced = leveled
      .withColumn("b_res",
        lit(budget) - coalesce(
          sum(when(col("capped"), col("cap"))).over(all), lit(0L)))
      .withColumn("s_res",
        col("s_all") - coalesce(
          sum(when(col("capped"), col("share_ppm"))).over(all), lit(0L)))
      .withColumn("base", when(col("capped") || col("s_res") <= 0L, lit(0L))
        .otherwise(expr(
          "CAST((CAST(share_ppm AS DECIMAL(38,0)) * b_res) div s_res AS BIGINT)")))
      .withColumn("rem", when(col("capped") || col("s_res") <= 0L, lit(-1L))
        .otherwise(expr(
          "CAST((CAST(share_ppm AS DECIMAL(38,0)) * b_res) % s_res AS BIGINT)")))
      .withColumn("deficit",
        col("b_res") - coalesce(
          sum(when(!col("capped"), col("base"))).over(all), lit(0L)))
      .withColumn("alloc", when(col("capped"), col("cap"))
        .otherwise(col("base") +
          when(row_number().over(byRem) <= col("deficit") && col("rem") >= 0L,
            1L).otherwise(0L)))
      .select(col(classCol), col("avail"), col("share_ppm"), col("cap"),
        col("capped"), col("alloc"),
        when(col("avail") > 0L, expr(
          s"CAST((CAST(alloc AS DECIMAL(38,0)) * ${M}L) div avail AS BIGINT)"))
          .otherwise(lit(null).cast("long")).as("epochs_ppm"))
    alloced.unionByName(zeros)
  }
}
