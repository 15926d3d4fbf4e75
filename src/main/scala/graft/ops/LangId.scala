package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] N-gram language identification (Cavnar & Trenkle, "N-Gram-
  * Based Text Categorization", SDAIR 1994 — the public rank-profile
  * method): a language is summarized by its top-K most frequent
  * character n-grams in rank order, a document by its own top-M, and
  * the document is assigned the language minimizing the OUT-OF-PLACE
  * distance — Σ over the doc's grams of |doc rank − language rank|,
  * with a fixed `topK` penalty for grams absent from the language
  * profile.
  *
  * Everything is integer-exact (counts, ranks, absolute differences) —
  * no log-probabilities, so Spark and a SQL oracle agree bit-for-bit;
  * ties break lexicographically (count desc, gram asc for ranks;
  * distance asc, lang asc for the argmin) making the whole pipeline a
  * pure function of the corpus.
  *
  * Scale shape: gram extraction is map-side (one compiled
  * transform/explode, no kernel state); the profile build is one
  * (lang, gram) count + a rank window whose partitions are bounded by
  * the CHARACTER-SET n-gram domain (not the corpus — ~20k for ASCII
  * trigrams); the doc-profile window is bounded by a single document's
  * distinct grams; classification joins doc grams to profiles on the
  * gram key (fan-out ≤ |languages| per gram, a small constant) and
  * the per-(doc, lang) spine comes from a broadcast of the tiny
  * language list — everything else is linear, equi-keyed, and
  * AQE-sizable.
  */
object LangId {
  import graft.util.Pin.PinOps

  /** Session-cached [[charNgramProfiles]]: built at most once per
    * (SparkContext, key) and pinned ([[graft.util.SessionCache]]) —
    * the profile-build prework (corpus gram explode + count + rank
    * window) is identical for the profile report and every
    * classification over the same corpus, so queries sharing a key
    * pay it once. `df`'s content must be a pure function of `key`
    * (immutable source data).
    */
  def profilesCached(df: DataFrame, key: String, textCol: String,
      langCol: String, n: Int = 3, topK: Int = 50): DataFrame =
    if (!graft.util.SessionCache.enabled(df.sparkSession))
      charNgramProfiles(df, textCol, langCol, n, topK)
    else graft.util.SessionCache.cached(df.sparkSession,
      s"langid:$key:$textCol:$langCol:$n:$topK")(
      charNgramProfiles(df, textCol, langCol, n, topK).cutLineage)

  /** Sliding character n-grams of `text` (empty array when the text is
    * shorter than n — explicit guard; `sequence` would otherwise count
    * DOWN for start > stop).
    */
  def charGrams(text: Column, n: Int): Column =
    when(length(text) >= n,
      transform(sequence(lit(1), length(text) - lit(n - 1)),
        i => text.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))

  /** Per-language rank profile: (lang, gram, rank), rank 1..topK by
    * (count desc, gram asc). The window partition is the language's
    * distinct-gram set — bounded by the character-set n-gram domain.
    */
  def charNgramProfiles(df: DataFrame, textCol: String, langCol: String,
      n: Int = 3, topK: Int = 50): DataFrame = {
    require(n >= 1, s"need n >= 1: $n")
    require(topK >= 1, s"need topK >= 1: $topK")
    // per-doc gram counts pre-reduced in the compiled kernel: the
    // explode emits one row per DISTINCT gram of each document (the
    // corpus aggregation sums the per-doc counts) instead of one row
    // per character position — identical totals, a multiplicity-factor
    // fewer rows built, hashed and partially aggregated
    val counts = df
      .select(col(langCol).as("lang"),
        explode(graft.functions.Kernels.charGramCountsOf(
          col(textCol), n)).as("g"))
      .groupBy(col("lang"), col("g.gram").as("gram"))
      .agg(sum(col("g.c")).as("cnt"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("cnt").desc, col("gram").asc)
    counts.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("lang"), col("gram"), col("rank"))
  }

  /** Classify every document against a [[charNgramProfiles]] frame:
    * out-of-place distance over the doc's top-`docTopM` grams, absent
    * grams costing `topK` each. Output: (idCol AS A STRING — ids are
    * never cast to a numeric, so UUID/URL-hash ids survive instead of
    * silently collapsing to one null key — pred_lang, dist,
    * n_doc_grams) — dist the winning (minimal) distance; docs with no
    * grams (text shorter than n) predict the lexicographically first
    * language at distance 0.
    */
  def classify(df: DataFrame, idCol: String, textCol: String,
      profiles: DataFrame, n: Int = 3, topK: Int = 50,
      docTopM: Int = 20): DataFrame = {
    require(docTopM >= 1, s"need docTopM >= 1: $docTopM")
    // per-doc profile entirely map-side: the compiled kernel counts,
    // ranks (count desc, gram asc — the same total order the SQL form
    // declares), and truncates inside one pass per document, deleting
    // the (doc, gram)-keyed exchange and the per-doc rank window the
    // relational shape paid
    val docProf = df
      .select(col(idCol).cast("string").as("__id"),
        explode(graft.functions.Kernels.topCharGramsOf(
          col(textCol), n, docTopM)).as("g"))
      .select(col("__id"), col("g.gram").as("gram"), col("g.drank").as("drank"))
    val langs = profiles.select(col("lang")).distinct()
    // matched grams: |doc rank − lang rank|, summed per (doc, lang)
    val matched = docProf
      .join(profiles.select(col("lang"), col("gram"), col("rank")), Seq("gram"))
      .groupBy(col("__id"), col("lang"))
      .agg(sum(abs(col("drank") - col("rank"))).as("mdist"),
        count(lit(1)).as("mcnt"))
    // full (doc, lang) spine from the tiny language list; absent grams
    // cost topK each
    val spine = df.select(col(idCol).cast("string").as("__id")).distinct()
      .join(docProf.groupBy(col("__id")).agg(count(lit(1)).as("m_doc")),
        Seq("__id"), "left")
      .na.fill(0L, Seq("m_doc"))
      .crossJoin(broadcast(langs))
    spine
      .join(matched, Seq("__id", "lang"), "left")
      .select(col("__id"),  col("lang"),
        (coalesce(col("mdist"), lit(0L)) +
          (col("m_doc") - coalesce(col("mcnt"), lit(0L))) * topK).as("dist"),
        col("m_doc"))
      .groupBy(col("__id"))
      .agg(min(struct(col("dist"), col("lang"))).as("best"),
        max(col("m_doc")).as("n_doc_grams"))
      .select(col("__id").as(idCol), col("best.lang").as("pred_lang"),
        col("best.dist").as("dist"), col("n_doc_grams"))
  }

  /** Confusion matrix of [[classify]] against a labeled column:
    * (lang, pred_lang, n_docs) — the acceptance report a curation
    * pipeline reads before trusting the classifier on unlabeled data.
    */
  def confusion(df: DataFrame, idCol: String, textCol: String,
      langCol: String, n: Int = 3, topK: Int = 50,
      docTopM: Int = 20): DataFrame =
    confusionWith(df, idCol, textCol, langCol,
      charNgramProfiles(df, textCol, langCol, n, topK), n, topK, docTopM)

  /** [[confusion]] against CALLER-SUPPLIED profiles — the reuse form:
    * pass [[profilesCached]] output so the corpus profile build isn't
    * replayed when the profile report and the confusion matrix run in
    * the same session.
    *
    * The matrix only needs each document's ARGMIN language, never the
    * distances, so when `docTopM <= topK` the (doc × language) spine
    * [[classify]] materializes is provably unnecessary and this runs a
    * reduced shape: dist(doc, lang) = m_doc·topK + Σ_matched
    * (|drank − rank| − topK), and m_doc·topK is constant per doc, so
    * the (dist asc, lang asc) argmin equals the (adj asc, lang asc)
    * argmin over the MATCHED (doc, lang) pairs — with docTopM ≤ topK
    * every matched term's adjustment is strictly negative
    * (|drank − rank| ≤ topK − 1 < topK), so any matched language
    * strictly beats every unmatched one (adj = 0) and ties resolve
    * identically. Docs with no matched gram (including gram-less docs)
    * tie all languages and take the lexicographically first language —
    * exactly [[classify]]'s tie-break (LangIdSpec pins the
    * equivalence row-for-row against the classify-based shape). The
    * reduced shape runs ONE kernel pass over the corpus instead of
    * two, drops the distinct-id scan and the doc×lang crossJoin, and
    * its joins stay bounded by matched pairs. docTopM > topK (where a
    * matched adjustment can be positive) falls back to the classify
    * path.
    */
  def confusionWith(df: DataFrame, idCol: String, textCol: String,
      langCol: String, profiles: DataFrame, n: Int = 3, topK: Int = 50,
      docTopM: Int = 20): DataFrame = {
    if (docTopM > topK) {
      val pred = classify(df, idCol, textCol, profiles, n, topK, docTopM)
      return df
        .select(col(idCol).cast("string").as(idCol), col(langCol).as("lang"))
        .join(pred.select(col(idCol), col("pred_lang")), Seq(idCol))
        .groupBy(col("lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n_docs"))
    }
    val docProf = df
      .select(col(idCol).cast("string").as("__id"),
        explode(graft.functions.Kernels.topCharGramsOf(
          col(textCol), n, docTopM)).as("g"))
      .select(col("__id"), col("g.gram").as("gram"), col("g.drank").as("drank"))
    val best = docProf
      .join(profiles.select(col("lang"), col("gram"), col("rank")), Seq("gram"))
      .groupBy(col("__id"), col("lang"))
      .agg(sum(abs(col("drank") - col("rank")) - lit(topK.toLong)).as("__adj"))
      .groupBy(col("__id"))
      .agg(min(struct(col("__adj"), col("lang"))).as("b"))
      .select(col("__id"), col("b.lang").as("pred_lang"))
    // empty profiles ⇒ no languages ⇒ empty matrix, as the classify
    // path's empty crossJoin spine produced
    val firstLang = profiles.agg(min(col("lang")).as("__fl"))
      .filter(col("__fl").isNotNull)
    df.select(col(idCol).cast("string").as("__id"), col(langCol).as("lang"))
      .join(best, Seq("__id"), "left")
      .crossJoin(broadcast(firstLang))
      .groupBy(col("lang"),
        coalesce(col("pred_lang"), col("__fl")).as("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
  }
}
