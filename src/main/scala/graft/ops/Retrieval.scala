package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Hybrid retrieval: reciprocal-rank fusion (RRF — Cormack et
  * al. SIGIR'09; the standard hybrid-search combiner) of independent
  * relevance signals, integer-quantized so fused scores are exact.
  *
  * RRF's 1/(k+rank) becomes `⌊2²⁰/(k+rank)⌋` — no floats, engine-
  * portable, and monotone in rank so the fused ordering is the RRF
  * ordering at every practical list length.
  *
  * Scale shape: each signal is a broadcast-probe of the query's
  * feature set against the corpus inverted stream (query features are
  * one document — always broadcastable), reduced per doc map-side.
  * Ranks are computed WITHOUT a corpus-wide single-partition window:
  * the (signal DESC, id ASC) rank decomposes into a [[Sweep
  * .runningSum]] prefix over the signal's VALUE domain plus a per-
  * value `row_number` (distributed by value) — the q137/q72 pattern.
  * The fusion join is id-keyed; the final top-k is
  * TakeOrderedAndProject.
  */
object Retrieval {

  /** Dense rank by (sigCol DESC, idCol ASC) with no global sort:
    * rank = #rows with strictly larger signal (prefix sum over the
    * negated value domain) + row_number within the tied value.
    */
  private def descRank(df: DataFrame, idCol: String, sigCol: String): DataFrame = {
    val counts = df.groupBy((-col(sigCol)).as("__negk")).agg(count(lit(1)).as("__n"))
    val offsets = Sweep.runningSum(counts, "__negk", "__n")
      .select(col("t").as("__negk"), (col("running") - col("d")).as("__off"))
    val perVal = Window.partitionBy(col(sigCol)).orderBy(col(idCol))
    df.withColumn("__negk", -col(sigCol))
      .withColumn("__rn", row_number().over(perVal).cast("long"))
      .join(offsets, Seq("__negk"))
      .withColumn("__rank", col("__off") + col("__rn"))
      .drop("__negk", "__rn", "__off")
  }

  /** Top-k documents for query document `queryId`, fusing (A) distinct
    * shingle intersection and (B) rarity-weighted distinct-token
    * overlap `Σ ⌊2²⁰/df(w)⌋` over shared tokens. Output:
    * (idCol, score), score DESC, ties by id.
    */
  def rrfHybrid(df: DataFrame, idCol: String, textCol: String,
      queryId: Long, k: Int = 20, rrfK: Int = 60,
      shingleWords: Int = 3): DataFrame = {
    require(k >= 1 && rrfK >= 1, s"need positive k/rrfK: $k/$rrfK")
    val docs = df.select(col(idCol).cast("long").as("__id"), col(textCol).as("__text"))
    // BOTH signals ride ONE fused feature stream (Kernels
    // .hybridFeatures: the doc's distinct shingle hashes AND distinct
    // tokens from one tokenize pass, one row per feature, exactly one
    // of (g, w) set) — the former shape ran a shingle kernel scan for
    // signal A and a separate token scan for signal B's probe, plus a
    // second groupBy(id) exchange. The (coalesce(g,−1), coalesce(w,''))
    // pair is a collision-free cross-kind equi-key, so the query doc's
    // features broadcast once and BOTH probes are the same map-side
    // hash join; one aggregation then carries the shingle-intersection
    // count and the rarity sum together, and the two rank legs read it
    // through the reused exchange.
    val feat = docs.select(col("__id"),
        explode(graft.functions.Kernels.hybridFeaturesOf(
          col("__text"), shingleWords)).as("f"))
      .select(col("__id"), col("f.g").as("__g"), col("f.w").as("__w"),
        coalesce(col("f.g"), lit(-1L)).as("__gk"),
        coalesce(col("f.w"), lit("")).as("__wk"))
    val qf = feat.filter(col("__id") === queryId)
      .select(col("__gk"), col("__wk"))
    // token document frequency still needs its own corpus pass (it
    // counts ALL docs per token, not just probe matches); its exchange
    // carries map-side partial counts, never rows
    val dfreq = docs.select(explode(array_distinct(
        graft.functions.TextKernels.tokens(col("__text")))).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__c"))
    // PINNED: the fused per-doc signal table has four consumers (each
    // rank leg's count-and-join pair), and they prune DIFFERENT
    // aggregate columns (inter vs rare) — column pruning specializes
    // the partial aggregate per branch, so exchange reuse cannot
    // dedupe them and the whole probe pass would execute once per leg
    // (verified in the static plan: 2 probe scans unpinned). The pin
    // is three longs per MATCHED doc — narrower than the q143
    // weighted-rows pin precedent — and spill-safe.
    val fused = graft.util.Pin.cut(feat.filter(col("__id") =!= queryId)
      .join(broadcast(qf), Seq("__gk", "__wk"))
      .join(dfreq, Seq("__w"), "left")
      .groupBy(col("__id"))
      .agg(count(col("__g")).as("__inter"),
        sum(when(col("__w").isNotNull, expr("1048576 div __c"))).as("__rare")))
    val sigA = fused.filter(col("__inter") > 0)
      .select(col("__id"), col("__inter").as("inter"))
    val sigB = fused.filter(col("__rare").isNotNull)
      .select(col("__id"), col("__rare").as("rare"))
    val ra = descRank(sigA, "__id", "inter")
      .select(col("__id"), col("__rank").as("__ra"))
    val rb = descRank(sigB, "__id", "rare")
      .select(col("__id"), col("__rank").as("__rb"))
    ra.join(rb, Seq("__id"), "full_outer")
      .select(col("__id").as(idCol),
        (coalesce(expr(s"1048576 div ($rrfK + __ra)"), lit(0L)) +
          coalesce(expr(s"1048576 div ($rrfK + __rb)"), lit(0L))).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** BM25-family ranking against a literal query token list
    * (Robertson–Spärck Jones / Okapi BM25, the standard lexical
    * ranking function; public formula) — integer-quantized end to end
    * so both engines rank identically:
    *
    *  - idf: BM25's `ln((N−df+0.5)/(df+0.5))` is replaced by the
    *    quantized RATIO `idf_q = ⌊2²⁰·(2(N−df)+1)/(2df+1)⌋` — the q66
    *    rational-idf rule (monotone in df, so rare terms still
    *    dominate; documented deviation: scores are not log-scaled);
    *  - tf saturation with k1 = 6/5, b = 3/4 cleared of fractions by
    *    ×10·T (T = corpus token count):
    *    `tf_q = ⌊2²⁰·22·T·tf / (10·T·tf + 3·T + 9·dl·N)⌋`
    *    — exact decimal(38,0) division, length normalization included;
    *  - per-term contribution `⌊idf_q·tf_q / 2²⁰⌋`, summed as longs.
    *
    * Scale shape: one token explode; the df aggregation only over the
    * |query| matching terms (filter BEFORE the agg); doc lengths ride
    * the same pass; the |query|-row df table and the 1-row (N, T)
    * corpus totals broadcast; top-k is TakeOrderedAndProject. Nothing
    * corpus×corpus, no window.
    *
    * Output: (idCol, score_q) — top `k` by (score_q DESC, id ASC).
    */
  def bm25Rank(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int): DataFrame = {
    require(queryTerms.nonEmpty, "need at least one query term")
    require(k > 0, s"need k > 0: $k")
    val dec = "decimal(38,0)"
    val tok = docs.select(col(idCol).cast("long").as("__id"),
      explode(graft.functions.TextKernels.tokens(col(textCol))).as("__w"))
    val dl = tok.groupBy(col("__id")).agg(count(lit(1)).as("dl"))
    val totals = dl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("t_tokens"))
    val qt = tok.filter(col("__w").isin(queryTerms: _*))
    val dfreq = qt.select(col("__id"), col("__w")).distinct()
      .groupBy(col("__w")).agg(count(lit(1)).as("df"))
    qt.groupBy(col("__id"), col("__w")).agg(count(lit(1)).as("tf"))
      .join(broadcast(dfreq), Seq("__w"))
      .join(dl, Seq("__id"))
      .crossJoin(broadcast(totals))
      .select(col("__id"), expr(
        // idf_q · tf_q can pass 2⁶³ — multiply as decimal(38,0)
        s"""CAST(CAST(CAST(1048576 AS $dec) * (2 * (n_docs - df) + 1)
                 div (2 * df + 1) AS $dec)
            * CAST(CAST(1048576 AS $dec) * 22 * t_tokens * tf
                 div (CAST(10 AS $dec) * t_tokens * tf + 3 * t_tokens
                      + CAST(9 AS $dec) * dl * n_docs) AS $dec)
            div 1048576 AS BIGINT)""").as("__c"))
      .groupBy(col("__id"))
      .agg(sum(col("__c")).as("score_q"))
      .select(col("__id").as(idCol), col("score_q"))
      .orderBy(col("score_q").desc, col(idCol))
      .limit(k)
  }

  /** The log₂ rank-discount table nDCG needs, as INTEGER literals
    * `⌊2²⁰ / log₂(1+r)⌋` computed ONCE in driver Scala — the same
    * numbers are interpolated verbatim into the oracle SQL, so no
    * runtime `log` (whose last ulp differs across libm builds) ever
    * enters either plan. Public so the query pack can embed the
    * identical table.
    */
  def ndcgDiscounts(k: Int): Seq[(Int, Long)] =
    (1 to k).map(r =>
      r -> math.floor(1048576.0 / (math.log(r + 1.0) / math.log(2.0))).toLong)

  /** Graded-relevance nDCG@k of a retrieval ranking against a label
    * table — the eval-harness step a training-data pipeline runs on
    * every retrieval/rerank change. `ranking` is scored candidates
    * (idCol, scoreCol — e.g. [[bm25Rank]]'s output); `labels` holds
    * (idCol, relCol ≥ 1) for every RELEVANT doc in the corpus
    * (unlabeled docs count 0). Ranks assign by (score DESC, id ASC);
    * gains are `rel · ⌊2²⁰/log₂(1+r)⌋` integer products; the ideal
    * ranking takes the corpus's top-k labels — so
    * `ndcg_ppm = ⌊10⁶ · DCG / IDCG⌋` is one integer division of two
    * long sums, bit-comparable cross-engine (NULL when nothing is
    * relevant anywhere).
    *
    * Scale shape: the only window runs over ≤ k already-ranked rows
    * (the ranking arrives top-k'd; the ideal side is
    * TakeOrderedAndProject over the label table, never a corpus
    * sort); the label join probes k rows; the final assembly is a
    * 1-row × 1-row broadcast join.
    *
    * Output: one row (n_ranked, dcg_q, idcg_q, ndcg_ppm).
    */
  def ndcgAt(ranking: DataFrame, idCol: String, scoreCol: String,
      labels: DataFrame, relCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, s"need 1 <= k <= 1000: $k")
    val disc = ndcgDiscounts(k)
    val discMap = map(disc.flatMap { case (r, d) =>
      Seq(lit(r), lit(d)) }: _*)
    val byScore = org.apache.spark.sql.expressions.Window
      .orderBy(col(scoreCol).desc, col(idCol))
    val ranked = ranking
      .orderBy(col(scoreCol).desc, col(idCol)).limit(k)
      .withColumn("__r", row_number().over(byScore))
    val dcgRow = ranked
      .join(labels.select(col(idCol), col(relCol).cast("long").as("__rel")),
        Seq(idCol), "left")
      .agg(count(lit(1)).as("n_ranked"),
        sum(coalesce(col("__rel"), lit(0L)) *
          element_at(discMap, col("__r"))).as("dcg_q"))
    val byRel = org.apache.spark.sql.expressions.Window
      .orderBy(col("__rel").desc, col(idCol))
    val idcgRow = labels
      .select(col(idCol), col(relCol).cast("long").as("__rel"))
      .filter(col("__rel") > 0L)
      .orderBy(col("__rel").desc, col(idCol)).limit(k)
      .withColumn("__r", row_number().over(byRel))
      .agg(coalesce(sum(col("__rel") * element_at(discMap, col("__r"))),
        lit(0L)).as("idcg_q"))
    dcgRow.join(broadcast(idcgRow))
      .select(col("n_ranked"), col("dcg_q"), col("idcg_q"),
        when(col("idcg_q") > 0L,
          expr("dcg_q * 1000000 DIV idcg_q")).as("ndcg_ppm"))
  }
}
