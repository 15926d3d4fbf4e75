package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Gopher-style document quality rule battery (the published
  * heuristic filter set: word count bounds, mean-word-length band,
  * stopword evidence, alphabetic-token fraction, type/token ratio).
  * One map-side pass, no shuffle; at 100 TB this pipelines inside the
  * scan stage like every other per-document filter.
  *
  * Every threshold is evaluated as an INTEGER cross-multiplication
  * (e.g. mean word length in [3,10] is `3·n ≤ chars ≤ 10·n`, never
  * `chars/n` in floating point), so the verdicts are bit-identical on
  * any engine and insensitive to summation order — the same
  * determinism contract the rest of the pack uses for rationals.
  */
object QualityRules {

  /** Default rule thresholds (a small, documented subset of the
    * published Gopher ranges, tuned to short synthetic docs; callers
    * override per corpus).
    */
  case class Thresholds(
      minTokens: Long = 10,
      maxTokens: Long = 100000,
      minMeanWordLen: Long = 3,   // inclusive lower bound, ×n
      maxMeanWordLen: Long = 10,  // inclusive upper bound, ×n
      minStopwords: Long = 2,
      alphaNum: Long = 4, alphaDen: Long = 5, // alpha fraction ≥ 4/5
      ttrNum: Long = 1, ttrDen: Long = 4)     // type/token ratio ≥ 1/4

  /** Per-document rule verdicts + overall pass, all integer-exact.
    *
    * Output: (idCol, n_tok, n_chars, n_stop, n_alpha, n_types,
    * r_len, r_wordlen, r_stop, r_alpha, r_ttr, pass) — counts LONG,
    * verdicts 0/1 LONG (not boolean: fixed-width, engine-neutral).
    *
    * The corpus contract is single-space-joined tokens, so token
    * characters = `length(text) - (n_tok - 1)` without re-walking the
    * string; `n_alpha` counts tokens that are pure ASCII letters
    * (identical semantics in Java regex and RE2: `^[A-Za-z]+$`).
    */
  def gopherRules(df: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String], t: Thresholds = Thresholds()): DataFrame = {
    val toks = graft.functions.TextKernels.tokens(col(textCol))
    val stopArr = array(stopwords.map(lit): _*)
    def verdict(c: org.apache.spark.sql.Column) = when(c, 1L).otherwise(0L)
    df.select(col(idCol), toks.as("toks"), length(col(textCol)).cast("long").as("len"))
      .select(
        col(idCol),
        size(col("toks")).cast("long").as("n_tok"),
        (col("len") - (size(col("toks")) - 1)).as("n_chars"),
        filter(col("toks"), w => array_contains(stopArr, w)).as("stop_hits"),
        filter(col("toks"), w => w.rlike("^[A-Za-z]+$")).as("alpha_hits"),
        size(array_distinct(col("toks"))).cast("long").as("n_types"))
      .select(
        col(idCol), col("n_tok"), col("n_chars"),
        size(col("stop_hits")).cast("long").as("n_stop"),
        size(col("alpha_hits")).cast("long").as("n_alpha"),
        col("n_types"))
      .select(
        col(idCol), col("n_tok"), col("n_chars"), col("n_stop"),
        col("n_alpha"), col("n_types"),
        verdict(col("n_tok").between(t.minTokens, t.maxTokens)).as("r_len"),
        verdict(col("n_chars") >= col("n_tok") * t.minMeanWordLen &&
          col("n_chars") <= col("n_tok") * t.maxMeanWordLen).as("r_wordlen"),
        verdict(col("n_stop") >= t.minStopwords).as("r_stop"),
        verdict(col("n_alpha") * t.alphaDen >= col("n_tok") * t.alphaNum).as("r_alpha"),
        verdict(col("n_types") * t.ttrDen >= col("n_tok") * t.ttrNum).as("r_ttr"))
      .withColumn("pass",
        col("r_len") * col("r_wordlen") * col("r_stop") * col("r_alpha") * col("r_ttr"))
  }

  /** Gopher-style per-document REPETITION signals, one output row per
    * (document, n): the char mass of the single most frequent word
    * n-gram (`top_*` — Gopher's "fraction of characters in the most
    * common n-gram", n=2..4) and the char mass of ALL n-grams occurring
    * ≥2 times (`dup_chars` — the duplicated-n-gram signal, n=5..10 in
    * the paper). Char mass = occurrences × length of the space-joined
    * gram, overlaps double-counted — the published heuristic's cheap
    * proxy, and exactly reproducible as integer arithmetic.
    *
    * Determinism: every statistic is an integer count/sum; the two
    * fractions are single divisions of exact longs. The top gram
    * tie-breaks (count desc, gram asc) via a struct MIN of
    * `(-count, gram)` — a total order, engine-independent.
    *
    * Shape at scale: ONE scan and ZERO shuffle — every statistic is a
    * function of a single document, so the whole battery runs as one
    * compiled map-side kernel pass ([[graft.functions.Kernels
    * .repetitionStats]]: per-doc gram HashMap, state bounded by the
    * doc's own token count) and the per-n rows explode from its
    * result array. Nothing doc×doc, no exchange — the previous shape
    * (a (doc, n, gram)-keyed aggregation) shuffled every distinct
    * gram STRING per document; this shuffles nothing.
    *
    * Output: (idCol, n, n_chars, n_slots, n_distinct, top_gram,
    * top_occ, top_chars, dup_chars, top_frac, dup_frac).
    */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String,
      ns: Seq[Int] = Seq(2, 3, 4, 6)): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), s"bad n-gram sizes: $ns")
    df.select(col(idCol),
        length(col(textCol)).cast("long").as("n_chars"),
        explode(graft.functions.Kernels.repetitionStatsOf(col(textCol), ns))
          .as("r"))
      .select(
        col(idCol), col("r.n").as("n"), col("n_chars"),
        col("r.n_slots").as("n_slots"), col("r.n_distinct").as("n_distinct"),
        col("r.top_gram").as("top_gram"), col("r.top_occ").as("top_occ"),
        col("r.top_chars").as("top_chars"), col("r.dup_chars").as("dup_chars"))
      .withColumn("top_frac",
        col("top_chars").cast("double") / col("n_chars").cast("double"))
      .withColumn("dup_frac",
        col("dup_chars").cast("double") / col("n_chars").cast("double"))
  }
}
