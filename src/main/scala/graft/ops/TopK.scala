package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Per-group top-k — "the 3 best examples per class", "the 10
  * longest documents per source" — without a per-group window sort.
  *
  * The naive plan (`row_number` over a partition-by-group window)
  * sorts EVERY group's full row set inside one exchange; at 100 TB a
  * hot group becomes a single-task sort. Here the reduction is the
  * [[graft.functions.TopKHeap]] bounded-heap partial aggregate: each
  * map task keeps at most k (score, id) entries per group it sees, so
  * the one shuffle carries ≤ k × |groups| rows per partition and the
  * merge is heap-merge — group skew changes nothing (the hot group
  * still pre-reduces to k entries on every partition). Output order
  * within a group is rank 1..k by (score DESC, id ASC) — the same
  * deterministic total order as [[Similarity.batchTopK]], which is
  * this operator specialized to cosine scores.
  *
  * Rows with a null score never occupy a heap slot (the heap skips
  * them), so degenerate rows cannot crowd out real ones.
  */
object TopK {

  /** @param groupCols grouping key columns
    * @param scoreCol  numeric ranking column (cast to double)
    * @param idCol     integral tie-break/identity column (cast to long)
    * @return one row per (group, rank ≤ k): groupCols*, rank, idCol, score
    */
  def groupedTopK(df: DataFrame, groupCols: Seq[String], scoreCol: String,
      idCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val gs = groupCols.map(col)
    df.groupBy(gs: _*)
      .agg(graft.functions.TopKHeap.topK(
        col(scoreCol).cast("double"), col(idCol).cast("long"), k).as("top"))
      .select(gs :+ posexplode(col("top")).as(Seq("i", "t")): _*)
      .select(gs ++ Seq((col("i") + 1).cast("long").as("rank"),
        col("t.id").as(idCol), col("t.score").as("score")): _*)
  }
}
