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
