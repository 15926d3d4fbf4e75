package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] Point-in-interval range join without a nested-loop product.
  *
  * Spark plans `p.v >= i.lo AND p.v < i.hi` as
  * BroadcastNestedLoopJoin — O(points × intervals) comparisons. Banded
  * shape instead: every interval explodes to the integer bands it
  * overlaps (`floor(lo/w) .. floor(hi/w)`), points map to ONE band,
  * the join is a hash equi-join on the band plus an exact residual
  * filter. Band width trades replication (wide intervals span more
  * bands) against band selectivity — set it near the median interval
  * width.
  */
object RangeJoin {

  /** Inner join: every (point, interval) with lo <= point < hi. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      ptCol: String, loCol: String, hiCol: String, bandWidth: Double): DataFrame = {
    val bandsOf = sequence(
      floor(col(loCol) / bandWidth).cast("long"),
      // hi is exclusive, but the band list must still reach floor(hi/w):
      // subtracting an epsilon first would truncate the list one band
      // short for any hi within epsilon above a boundary and silently
      // drop true matches — at worst this emits one extra candidate
      // band whose rows the exact residual filter removes
      floor(col(hiCol) / bandWidth).cast("long"))
    val i = intervals.withColumn("__band", explode(bandsOf))
    val p = points.withColumn("__band", floor(col(ptCol) / bandWidth).cast("long"))
    p.join(i, Seq("__band"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) < col(hiCol))
      .drop("__band")
  }
}
