package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Whole-corpus composition audits that need a deterministic
  * document ORDER — growth curves and their kin. The order is always
  * `idCol` ascending, and the global rank comes from the distributed
  * two-phase prefix sum ([[Sweep.runningSum]]) — never a
  * single-partition `row_number() OVER (ORDER BY ...)`.
  */
object Corpus {

  /** Vocabulary GROWTH CURVE (the Heaps'-law audit): how many distinct
    * token types the corpus has accumulated after its first
    * `ceil(k·N/checkpoints)` documents in `idCol` order, for
    * k = 1..checkpoints. Sublinear growth is the healthy shape; a
    * late-checkpoint jump means a tail source injects novel vocabulary
    * (encoding junk, another language) and deserves a look.
    *
    * Shape: doc ranks via the distributed prefix sum (doc-count rows),
    * one doc-keyed join to attach ranks BEFORE the token explode, one
    * shuffle on token for the first-appearance min, then a
    * ×checkpoints literal fan-out of the distinct-type rows (already
    * reduced, ≪ corpus). The only driver materialization is the
    * doc-count scalar — the sanctioned watermark class.
    *
    * Output: (checkpoint, n_docs, vocab) — all longs, exact counts.
    */
  def vocabGrowth(df: DataFrame, idCol: String, textCol: String,
      checkpoints: Int = 10): DataFrame = {
    require(checkpoints >= 1, s"need positive checkpoints: $checkpoints")
    // ONE scalar job carries the doc count (needed as a literal for
    // the checkpoint thresholds) AND the sweep's cell bounds — the
    // former separate df.count() plus in-sweep bounds pass paid two
    // jobs for scalars one cheap raw-column aggregate yields together
    val s0 = df.agg(count(lit(1)), min(col(idCol).cast("long")),
      max(col(idCol).cast("long"))).head()
    val n = s0.getLong(0)
    // rows may exist with every idCol value null (n > 0, min/max both
    // null) — fall back to boundsless like the empty case instead of
    // NPE-ing on getLong
    val bounds =
      if (n == 0L || s0.isNullAt(1)) None
      else Some((s0.getLong(1), s0.getLong(2)))
    val ranks = Sweep.runningSum(
      df.select(col(idCol).cast("long").as("t"), lit(1L).as("one")),
      "t", "one", bounds = bounds)
      .select(col("t"), col("running").as("rk"))
    val firstRank = df
      .select(col(idCol).cast("long").as("t"), col(textCol).as("text"))
      .join(ranks, Seq("t"))
      .select(col("rk"), explode(graft.functions.TextKernels.tokens(col("text"))).as("tok"))
      .groupBy(col("tok"))
      .agg(min(col("rk")).as("rt"))
    val cps = array((1 to checkpoints).map { k =>
      struct(lit(k.toLong).as("checkpoint"),
        lit((k * n + checkpoints - 1) / checkpoints).as("n_docs"))
    }: _*)
    firstRank
      .select(col("rt"), explode(cps).as("cp"))
      .filter(col("rt") <= col("cp.n_docs"))
      .groupBy(col("cp.checkpoint").as("checkpoint"), col("cp.n_docs").as("n_docs"))
      .agg(count(lit(1)).as("vocab"))
  }

  /** Vocabulary COVERAGE sweep: the exact fraction of all token
    * occurrences covered by the top-k most frequent types, at several
    * candidate k — the "what vocabulary size covers 99% of the
    * corpus?" curve a tokenizer-budget decision reads.
    *
    * The key scale move: coverage needs NO per-token ranking. Tokens
    * tied at the same frequency contribute identical mass, so the
    * top-k mass is a pure function of the frequency DOMAIN:
    * walk distinct frequencies descending with cumulative (types,
    * mass); at the first row where cum_types ≥ k,
    * `covered = cum_mass − (cum_types − k)·freq`. The windows run over
    * |distinct frequency values| rows (≪ vocabulary ≪ corpus); the ×k
    * fan-out multiplies the same tiny domain. A row_number over the
    * vocabulary — with its million-type freq-1 tie class — never
    * happens.
    *
    * Output per k: (k, vocab, n_types = min(k, vocab),
    * covered_tokens, total_tokens, coverage_q = ⌊2²⁰·covered/total⌋).
    */
  def coverageAtK(df: DataFrame, textCol: String, ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), s"need positive ks: $ks")
    val freq = df
      .select(explode(graft.functions.TextKernels.tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("f"))
    val dom = freq.groupBy(col("f")).agg(count(lit(1)).as("types"))
      .withColumn("mass", col("f") * col("types"))
    val desc = Window.orderBy(col("f").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = dom
      .withColumn("cum_types", sum(col("types")).over(desc))
      .withColumn("cum_mass", sum(col("mass")).over(desc))
      .withColumn("vocab", sum(col("types")).over(all))
      .withColumn("total", sum(col("mass")).over(all))
    cum
      .select(col("f"), col("cum_types"), col("cum_mass"),
        col("vocab"), col("total"),
        explode(array(ks.map(k => lit(k.toLong)): _*)).as("k"))
      .groupBy(col("k"))
      .agg(max(col("vocab")).as("vocab"), max(col("total")).as("total_tokens"),
        // first row reaching k types (cum_types ascends with the walk);
        // absent when k exceeds the vocabulary → full corpus covered
        min(when(col("cum_types") >= col("k"),
          struct(col("cum_types"), col("cum_mass"), col("f")))).as("hit"))
      .select(col("k"),
        col("vocab"),
        least(col("k"), col("vocab")).as("n_types"),
        coalesce(
          col("hit.cum_mass") - (col("hit.cum_types") - col("k")) * col("hit.f"),
          col("total_tokens")).as("covered_tokens"),
        col("total_tokens"))
      .withColumn("coverage_q",
        expr("(1048576 * covered_tokens) div total_tokens"))
  }

  /** Curation ATTRITION FUNNEL: every document labeled with the FIRST
    * stage that dropped it — `low_quality` (Gopher gate), `duplicate`
    * (exact-content loser among the quality survivors), `sampled_out`
    * (mixture-rate hash drop among the dedup survivors), or `kept` —
    * with document and character mass per stage. The per-run
    * accounting report a curation owner reads next to the kept corpus:
    * every input document lands in exactly one stage, so the rows sum
    * back to the input.
    *
    * Precedence mirrors pipeline order (a low-quality doc is reported
    * as low-quality even if it would also have lost dedup), and each
    * verdict is THE operator's own decision — the Gopher pass bit from
    * [[QualityRules.gopherRules]], the min-id survivor from
    * [[Dedup.exact]] over the quality-passed set, the keep column from
    * [[Sample.mixtureKeeps]] — so the funnel can never drift from what
    * the pipeline actually does.
    *
    * Scale: the gopher verdicts are map-side; dedup adds its one
    * content-hash aggregation; the mixture verdict is map-side; one
    * final 4-row rollup.
    */
  def attritionFunnel(df: DataFrame, idCol: String, textCol: String,
      classCol: String, stopwords: Seq[String],
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    val verdicts = QualityRules.gopherRules(df, idCol, textCol, stopwords)
      .select(col(idCol), col("pass"))
    val base = df.join(verdicts, Seq(idCol))
    val survivors = Dedup.exact(base.filter(col("pass") === 1), idCol, textCol)
      .select(col("keep_id").as(idCol)).withColumn("__surv", lit(1))
    base.join(survivors, Seq(idCol), "left")
      .withColumn("stage",
        when(col("pass") === 0, "low_quality")
          .when(col("__surv").isNull, "duplicate")
          .when(!Sample.mixtureKeeps(classCol, idCol, rates, defaultRate),
            "sampled_out")
          .otherwise("kept"))
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col(textCol)).cast("long")).as("n_chars"))
  }
}
