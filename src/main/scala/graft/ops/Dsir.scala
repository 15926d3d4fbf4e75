package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] DSIR-style importance resampling — the domain-matched data
  * selection step (Xie et al. 2023, "Data Selection for Language
  * Models via Importance Resampling"; public method) that completes
  * the curation story: quality gate (q115/q129) → dedup (q17–q20) →
  * resample the RAW pool toward a small TARGET domain. Every raw
  * document is scored by how target-like its hashed bag-of-words mass
  * is under target-vs-raw bucket unigram models, then a
  * weight-proportional sample is drawn.
  *
  * Integer-exact adaptation (the engine-portability rule every scorer
  * here follows): the published estimator sums per-feature LOG
  * likelihood ratios; `log`'s last-ulp rounding differs between libm
  * implementations, so — like q169's PMI and q66's idf — the log is
  * dropped for the monotone-per-feature QUANTIZED RATIO
  *
  *   q(dim) = ⌊2²⁰ · (c_t+1)(N_r+dims) / ((c_r+1)(N_t+dims))⌋
  *
  * (add-one smoothing over the `dims` buckets; 2²⁰ = the neutral
  * bucket where target and raw mass agree), and a document's weight is
  * the feature-mass-weighted MEAN ratio `⌊Σ n·q / Σ n⌋` — a sum of
  * exact integers instead of a product, order-independent under any
  * partitioning, identical on any engine. Ratios saturate at
  * `2²⁰ · 2²⁰` (a bucket with target mass but ~zero raw mass is
  * "target-only"; beyond 2²⁰× independence more resolution changes no
  * sampling decision), which bounds q ≤ 2⁴⁰ so `Σ n·q ≤ mass·2⁴⁰`
  * stays long-safe for any document and any corpus size — without the
  * cap q grows like N_r and would overflow BIGINT near corpus token
  * counts of 2⁴³.
  *
  * Shape at 100 TB: one corpus tokenize pass ([[TfIdf.hashedBow]] with
  * the target flag carried through its (doc, dim) shuffle — no second
  * doc-keyed join), bucket models as a dims-bounded aggregation, the
  * per-doc score via a BROADCAST join of the ≤ dims model rows, and
  * the draw via [[Sample.weightedSystematic]]'s RNG-free distributed
  * prefix sum. No doc×doc term anywhere; the only corpus-sized
  * shuffles are the bow's (doc, dim) aggregation and the sweep.
  */
object Dsir {

  private val Neutral = 1L << 20
  private val SatQ = 1L << 40 // Neutral × 2²⁰ ratio saturation

  /** Per-raw-document integer importance weight.
    *
    * `isTarget` marks the target-domain rows (NULL = raw); only raw
    * (non-target) documents are weighted — target rows train the
    * numerator model and are never candidates for the draw. Feature
    * mass `n` per (doc, dim) is |hashedBow signed sum| (the signed
    * hash keeps collision noise zero-mean; its magnitude is the doc's
    * net mass in the bucket). Documents whose every dimension
    * cancelled to zero carry no evidence and drop out.
    *
    * Output: (idCol, feat_mass, ratio_q) — ratio_q in quanta of 2⁻²⁰,
    * 2²⁰ ≈ "indistinguishable from the raw pool".
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, dims: Int = 32): DataFrame = {
    require(dims >= 2, s"dims must be >= 2: $dims")
    val bow = TfIdf.hashedBow(
        docs.withColumn("__tgt", coalesce(isTarget, lit(false))),
        idCol, textCol, dims, carry = Seq("__tgt"))
      .withColumn("n", abs(col("weight")))
    val model = bow.groupBy(col("dim"))
      .agg(sum(when(col("__tgt"), col("n")).otherwise(0L)).as("c_t"),
        sum(when(!col("__tgt"), col("n")).otherwise(0L)).as("c_r"))
    val totals = model.agg(
      sum(col("c_t")).cast("decimal(38,0)").as("n_t"),
      sum(col("c_r")).cast("decimal(38,0)").as("n_r"))
    // saturation must branch BEFORE the ×2²⁰ scaled division: DIV
    // truncates to LONG, and an unsaturated-looking scaled quotient
    // already overflows long once the raw ratio passes 2⁴³. The
    // unscaled ratio (≤ N_r + dims) decides the branch long-safely;
    // the scaled form then only ever computes values < 2⁴⁰. The
    // oracle's `least(scaled, 2⁴⁰)` over HUGEINT is value-identical:
    // r_int ≥ 2²⁰ ⇔ scaled ≥ 2⁴⁰.
    val quantized = model.crossJoin(broadcast(totals))
      .withColumn("r_int", expr(
        s"""(CAST(c_t + 1 AS DECIMAL(38,0)) * (n_r + $dims))
             DIV (CAST(c_r + 1 AS DECIMAL(38,0)) * (n_t + $dims))"""))
      .select(col("dim"),
        when(col("r_int") >= Neutral, lit(SatQ)).otherwise(expr(
          s"""(${Neutral}L * CAST(c_t + 1 AS DECIMAL(38,0)) * (n_r + $dims))
               DIV (CAST(c_r + 1 AS DECIMAL(38,0)) * (n_t + $dims))"""))
          .as("q"))
    bow.filter(!col("__tgt"))
      .join(broadcast(quantized), Seq("dim"))
      .groupBy(col(idCol))
      .agg(sum(col("n")).cast("long").as("feat_mass"),
        sum(col("n").cast("decimal(38,0)") * col("q")).as("__mass_q"))
      .select(col(idCol), col("feat_mass"),
        expr("CAST(__mass_q DIV feat_mass AS BIGINT)").as("ratio_q"))
  }

  /** The full DSIR step: weight, then draw `k` PPS hits via
    * [[Sample.weightedSystematic]] (integer-exact, RNG-free — heavy
    * target-like docs can be hit more than once, `n_hits`).
    *
    * The weights frame is lineage-cut first (the proportionalSample
    * discipline): weightedSystematic reads its input twice — a 1-row
    * scalar pass for total/step/bounds and the sweep itself — and
    * without the pin each pass would replay the whole tokenize +
    * model lineage. The pinned frame is 3 slim columns per raw doc.
    *
    * Output: (idCol, w, n_hits).
    */
  def resample(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, k: Int, dims: Int = 32): DataFrame = {
    import graft.util.Pin.PinOps
    Sample.weightedSystematic(
      importanceWeights(docs, idCol, textCol, isTarget, dims).cutLineage,
      idCol, "ratio_q", k)
  }
}
