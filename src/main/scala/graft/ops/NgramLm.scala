package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] n-gram language-model statistics and a BPE tokenizer-training
  * step — the counting passes a pretraining pipeline runs over the
  * corpus before any model sees it.
  *
  * Shape at scale: both operators are explode → count aggregations
  * whose shuffle keys are the n-grams/pairs themselves — uniform,
  * bounded-width keys; the expansion factor is ×(tokens per doc) resp.
  * ×(chars per word), linear in corpus size with no doc×doc term.
  * All outputs are exact integer counts.
  */
object NgramLm {

  /** Corpus trigram table with Kneser–Ney continuation counts:
    * for every trigram (w1, w2, w3), `c` = its occurrence count and
    * `cont` = the number of DISTINCT left contexts w1' such that
    * (w1', w2, w3) occurs — the N1+(·, w2, w3) statistic KN smoothing
    * divides by. Documents shorter than 3 tokens contribute nothing.
    *
    * Two aggregations: occurrence counts shuffle on the trigram, and
    * the continuation count is a window COUNT over (w2, w3) of the
    * already-aggregated (distinct-trigram) rows — it never revisits
    * the token stream, so its input is bounded by |vocab|³, not corpus
    * size.
    */
  def trigramLm(df: DataFrame, textCol: String): DataFrame = {
    val toks = graft.functions.TextKernels.tokens(col(textCol))
    val tri = df.select(toks.as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(explode(expr(
        """transform(sequence(1, size(toks) - 2),
             i -> struct(toks[i - 1] AS w1, toks[i] AS w2, toks[i + 1] AS w3))"""))
        .as("t"))
      .groupBy(col("t.w1").as("w1"), col("t.w2").as("w2"), col("t.w3").as("w3"))
      .agg(count(lit(1)).as("c"))
    tri.withColumn("cont",
      count(lit(1)).over(Window.partitionBy("w2", "w3")).cast("long"))
  }

  /** Per-document LM score — the perplexity-filter analogue a
    * pretraining pipeline runs to rank documents by how "model-like"
    * their text is, with every statistic integer-exact so the score is
    * bit-identical on any engine (no `log`, whose last-ulp rounding
    * differs between libm implementations; a monotone transform of the
    * mean probability ranks documents identically).
    *
    * Train/score split: the LM is the trigram MLE estimated on
    * `trainFilter` documents only (e.g. `col("doc_id") % 2 === 0` for
    * a held-in half); ALL documents are scored, so held-out docs see
    * genuine OOV mass. Context counts are derived by re-aggregating
    * the trigram table itself (`c_ctx(w1,w2) = Σ_w3 c3`), so
    * p(w3|w1,w2) = c3/c_ctx normalizes exactly and the token stream is
    * walked once.
    *
    * Each scored trigram slot contributes the QUANTIZED probability
    * `q = ⌊c3·2³⁰ / c_ctx⌋` (integer floor-divide, widened through
    * decimal so corpus-scale counts cannot overflow the multiply);
    * unseen trigram in a seen context → q=0; unseen context → the slot
    * is excluded from the mean and counted in `n_noctx`. The doc score
    * `mean_q = Σq / (n_ctx·2³⁰)` is one division of exact longs.
    *
    * Shape at scale: explode → two shuffle joins keyed on the gram
    * (LM side is bounded by distinct trigrams, ≪ corpus; AQE
    * broadcasts it when small) → per-doc reduce with map-side partials.
    *
    * Output: (idCol, n_slots, n_ctx, n_hit, n_noctx, sum_q, mean_q).
    */
  def docLmScore(df: DataFrame, idCol: String, textCol: String,
      trainFilter: Column): DataFrame = {
    val lm = trigramLm(df.filter(trainFilter), textCol)
      .select(col("w1"), col("w2"), col("w3"), col("c").as("c3"))
    val ctx = lm.groupBy("w1", "w2").agg(sum(col("c3")).as("c_ctx"))
    val toks = graft.functions.TextKernels.tokens(col(textCol))
    val slots = df.select(col(idCol), toks.as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col(idCol), explode(expr(
        """transform(sequence(1, size(toks) - 2),
             i -> struct(toks[i - 1] AS w1, toks[i] AS w2, toks[i + 1] AS w3))"""))
        .as("t"))
      .select(col(idCol), col("t.w1").as("w1"), col("t.w2").as("w2"),
        col("t.w3").as("w3"))
    slots
      .join(lm, Seq("w1", "w2", "w3"), "left")
      .join(ctx, Seq("w1", "w2"), "left")
      .withColumn("q", when(col("c_ctx").isNull, lit(null))
        .otherwise(expr(
          "CAST(CAST(coalesce(c3, 0L) AS DECIMAL(38,0)) * 1073741824 div c_ctx AS BIGINT)")))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_slots"),
        count(col("c_ctx")).as("n_ctx"),
        count(col("c3")).as("n_hit"),
        (count(lit(1)) - count(col("c_ctx"))).as("n_noctx"),
        sum(col("q")).as("sum_q"))
      .withColumn("mean_q", when(col("n_ctx") > 0,
        col("sum_q").cast("double") /
          (col("n_ctx") * 1073741824L).cast("double")))
  }

  /** One BPE merge-iteration count: occurrences of each adjacent
    * character pair inside tokens, over ALL token occurrences (BPE
    * counts the corpus, not the vocabulary), top `k` pairs by
    * (count desc, pair asc) — the pair a tokenizer trainer would merge
    * next, with a total order so the result is engine-independent.
    *
    * Output: (pair, n_occ), `k` rows via TakeOrderedAndProject (no
    * global sort materializes).
    */
  def bpePairStep(df: DataFrame, textCol: String, k: Int = 20): DataFrame = {
    val toks = graft.functions.TextKernels.tokens(col(textCol))
    df.select(explode(toks).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("n_occ"))
      .orderBy(col("n_occ").desc, col("pair").asc)
      .limit(k)
  }
}
