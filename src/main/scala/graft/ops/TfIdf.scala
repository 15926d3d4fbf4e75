package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextKernels

/** [EXT] TF-IDF keyword extraction per document — corpus-level inverse
  * document frequency joined back to per-doc term frequencies, top-k
  * terms per doc.
  *
  * The idf is the RATIONAL form `(N + 1) / (df + 1)` rather than its
  * logarithm: ranking is unchanged (log is monotone), and +, *, / are
  * correctly-rounded IEEE ops that produce bit-identical doubles on
  * any engine, while `ln` is libm-implementation-specific — the same
  * determinism rule the oracle suite applies everywhere.
  *
  * Scale shape: tf is one (doc, term) aggregation; df reuses tf (one
  * more term aggregation); N rides as a broadcast 1-row aggregate (no
  * driver action); the tf⋈df term join is a plain equi-join AQE can
  * broadcast when the vocabulary is small; the final top-k is a
  * per-doc window rank — the standard 2-shuffle + join + window plan,
  * nothing quadratic anywhere.
  */
object TfIdf {

  def topTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5): DataFrame = {
    val tf = docs
      .select(col(idCol), explode(TextKernels.tokens(col(textCol))).as("term"))
      // the whitespace tokenizer emits "" for empty text or doubled
      // spaces; an empty pseudo-term has a tiny df and would otherwise
      // outscore every real keyword for the docs that carry it
      .filter(col("term") =!= "")
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).cast("double").as("n"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("score", col("tf") * ((col("n") + 1) / (col("df") + 1)))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term").asc)
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(idCol), col("term"), col("tf"), col("score"))
  }

  /** Signed feature-hashing ("hashing trick") bag-of-words: every
    * token occurrence lands in dimension `hex60(token) mod dims` with
    * sign from the NEXT bit of the same hash (`(hex60 div dims) mod
    * 2`), and the document's vector is the per-dimension signed sum —
    * the vocabulary-free text vectorizer (no vocab induction pass, no
    * OOV, fixed width at any corpus size), with the signed sum keeping
    * collision noise zero-mean.
    *
    * Every weight is an exact integer sum of ±1 (order-independent
    * under any partitioning); one shuffle keyed on (doc, dim) — keys
    * uniform by construction of the hash. Zero-sum dimensions are
    * dropped (they carry no signal, and at realistic `dims` most
    * dimensions of most docs are untouched anyway — the output is the
    * sparse form).
    *
    * Output: (idCol, carry…, dim, weight), dim in [0, dims).
    *
    * `carry`: extra doc-functional columns (a split flag, a class
    * label) to ride through the aggregation — they join the group key,
    * which is sound exactly when each is a function of `idCol`
    * (otherwise a doc's vector splits across carry values). Lets a
    * caller like [[Dsir]] partition the feature mass by a flag without
    * a second doc-keyed join back onto the (doc, dim) rows.
    */
  def hashedBow(docs: DataFrame, idCol: String, textCol: String,
      dims: Int = 32, carry: Seq[String] = Nil): DataFrame = {
    require(dims >= 2, s"dims must be >= 2: $dims")
    val keep = col(idCol) +: carry.map(col)
    docs.select(keep :+ explode(TextKernels.tokens(col(textCol))).as("tok"): _*)
      .select(keep :+ TextKernels.hex60(col("tok")).as("h"): _*)
      .select(keep ++ Seq((col("h") % dims).as("dim"),
        when(expr(s"(h div $dims) % 2") === 0, 1L).otherwise(-1L).as("sgn")): _*)
      .groupBy(keep :+ col("dim"): _*)
      .agg(sum(col("sgn")).as("weight"))
      .filter(col("weight") =!= 0L)
  }

  /** PMI collocations (pointwise mutual information over document
    * co-presence — Church & Hanks, CL 1990; public formula), with the
    * log dropped in favor of the monotone quantized RATIO
    * `pmi_q = ⌊2²⁰·N·c_xy / (c_x·c_y)⌋` (the q66 rational rule:
    * ordering preserved, every division one integer division) —
    * which token pairs co-occur far beyond chance, the collocation /
    * phrase-mining counterpart to [[graft.ops.Itemsets.frequentPairs]]'
    * raw support.
    *
    * Shape: the frequentPairs A-Priori prune bounds the pair blowup
    * (only tokens with df ≥ minSupport expand), singleton df rides the
    * pair rows via two vocabulary-sized joins, N is a 1-row broadcast.
    *
    * Output: (token_a, token_b, support, pmi_q) for pairs with
    * support ≥ minSupport and pmi_q ≥ minPmiQ (2²⁰ = independence).
    */
  def pmiPairs(docs: DataFrame, idCol: String, textCol: String,
      minSupport: Long, minPmiQ: Long): DataFrame = {
    val pairs = graft.ops.Itemsets.frequentPairs(docs, idCol, textCol, minSupport)
    val dtok = docs
      .select(col(idCol).as("__doc"),
        explode(array_distinct(split(col(textCol), " ", -1))).as("token"))
      .filter(col("token") =!= "")
    val dfreq = dtok.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = dtok.select(col("__doc")).distinct().agg(count(lit(1)).as("__n"))
    pairs
      .join(dfreq.select(col("token").as("token_a"), col("df").as("__dfa")),
        Seq("token_a"))
      .join(dfreq.select(col("token").as("token_b"), col("df").as("__dfb")),
        Seq("token_b"))
      .crossJoin(broadcast(n))
      .withColumn("pmi_q", expr(
        """CAST((CAST(1048576 AS DECIMAL(38,0)) * __n * support)
           div (CAST(__dfa AS DECIMAL(38,0)) * __dfb) AS BIGINT)"""))
      .filter(col("pmi_q") >= minPmiQ)
      .select(col("token_a"), col("token_b"), col("support"), col("pmi_q"))
  }

  /** Cluster distinctive-term report — the c-TF-IDF idea (class-based
    * TF-IDF over document clusters, Grootendorst's BERTopic labeling
    * step; public formula) with the log dropped for the monotone
    * quantized RATIO the q66/q126 rule uses everywhere:
    * `lift_ppm = ⌊10⁶ · (c_ct/N_c) / (c_t/N)⌋` — how much more often
    * term t occurs inside cluster c than in the corpus at large. The
    * top-k lift terms per cluster are the human-readable label a
    * curation run prints next to each embedding cluster before
    * deciding what to keep, prune, or up-sample.
    *
    * `assign` is any (idCol, cell_id) frame — [[graft.ops.Similarity]]
    * cell assignments, a near-dup cluster key, a language bucket — so
    * the report composes with every clustering the engine produces.
    *
    * Shape at scale: docs ⋈ assign is one id-keyed equi-join BEFORE
    * tokenization (only assigned docs tokenize), then ONE (cell, term)
    * aggregation; cluster totals broadcast back (|clusters| rows),
    * term totals join on the term key (vocabulary-sized, partitioned),
    * the grand total is a 1-row broadcast, and the final top-k is a
    * per-cluster window over the ≤ |clusters|×|vocab| aggregated rows
    * — never over corpus rows. All counts are exact integers; the
    * lift divides once in DECIMAL(38,0) (c_ct·N passes 2⁶³ at 100 TB).
    *
    * Output: (cell_id, term, n_ct, n_c, n_t, lift_ppm, rank) — terms
    * with n_ct ≥ minCount, rank 1..k per cluster by (lift desc, term
    * asc).
    */
  def clusterKeywords(docs: DataFrame, idCol: String, textCol: String,
      assign: DataFrame, k: Int = 5, minCount: Long = 2): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val ct = docs.join(assign, idCol)
      .select(col("cell_id"),
        explode(TextKernels.tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("cell_id"), col("term"))
      .agg(count(lit(1)).as("n_ct"))
    val cTot = ct.groupBy(col("cell_id")).agg(sum(col("n_ct")).as("n_c"))
    val tTot = ct.groupBy(col("term")).agg(sum(col("n_ct")).as("n_t"))
    val nAll = ct.agg(sum(col("n_ct")).as("n_all"))
    val w = Window.partitionBy(col("cell_id"))
      .orderBy(col("lift_ppm").desc, col("term").asc)
    ct.filter(col("n_ct") >= minCount)
      .join(broadcast(cTot), Seq("cell_id"))
      .join(tTot, Seq("term"))
      .crossJoin(broadcast(nAll))
      .withColumn("lift_ppm", expr(
        """CAST((CAST(1000000 AS DECIMAL(38,0)) * n_ct * n_all)
           div (CAST(n_c AS DECIMAL(38,0)) * n_t) AS BIGINT)"""))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("cell_id"), col("term"), col("n_ct"), col("n_c"),
        col("n_t"), col("lift_ppm"), col("rank"))
  }
}
