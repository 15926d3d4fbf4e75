package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Sequential-pattern mining over per-entity event streams — the
  * n-gram generalization of the q75 first-order transition matrix:
  * which length-g event paths (click→view→purchase) dominate the
  * corpus. The behavioral-analytics staple behind funnel discovery and
  * next-event models.
  *
  * Scale shape: ONE exchange on the entity key (the q39 sessionize
  * shape) serves every lead() the gram needs — Spark evaluates all
  * leads over a single partitioned sort; gram counting is a hash
  * aggregate with map-side partials, and the top-k is
  * TakeOrderedAndProject (per-partition heaps, k rows to the driver,
  * no global sort). Entities hold their own events only — a hot
  * entity costs its own sequence length, never a corpus sort.
  *
  * Ordering is made total with the (orderCol, tieCol) pair so the
  * gram stream is a pure function of the data under any partitioning.
  */
object Sequence {

  /** Top-k most frequent length-`gramLen` event paths.
    *
    * @return (t1..tG, n) — top k by (n DESC, t1.., ties
    *         lexicographic); windows never cross entities
    */
  def topPaths(df: DataFrame, keyCol: String, orderCol: String,
      tieCol: String, typeCol: String, gramLen: Int, k: Int): DataFrame = {
    require(gramLen >= 2, s"need gramLen >= 2: $gramLen")
    require(k > 0, s"need k > 0: $k")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol), col(tieCol))
    val gramCols = (0 until gramLen).map { i =>
      (if (i == 0) col(typeCol) else lead(col(typeCol), i).over(w)).as(s"t${i + 1}")
    }
    val names = (1 to gramLen).map(i => s"t$i")
    df.select(gramCols: _*)
      .filter(names.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(names.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc +: names.map(col(_).asc): _*)
      .limit(k)
  }
}
