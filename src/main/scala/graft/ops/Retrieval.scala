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
    // signal A: distinct shingle intersection with the query doc
    val sh = docs.select(col("__id"),
      explode(graft.functions.Kernels.shingleHashes60Of(
        col("__text"), shingleWords)).as("__g"))
    val qsh = sh.filter(col("__id") === queryId).select(col("__g"))
    val sigA = sh.filter(col("__id") =!= queryId)
      .join(broadcast(qsh), Seq("__g"))
      .groupBy(col("__id")).agg(count(lit(1)).as("inter"))
    // signal B: rarity-weighted distinct-token overlap
    val tok = docs.select(col("__id"),
      explode(array_distinct(graft.functions.TextKernels.tokens(col("__text"))))
        .as("__w"))
    val dfreq = tok.groupBy(col("__w")).agg(count(lit(1)).as("__c"))
    val qtok = tok.filter(col("__id") === queryId).select(col("__w"))
    val sigB = tok.filter(col("__id") =!= queryId)
      .join(broadcast(qtok), Seq("__w"))
      .join(dfreq, Seq("__w"))
      .groupBy(col("__id")).agg(sum(expr("1048576 div __c")).as("rare"))
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
}
