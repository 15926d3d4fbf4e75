package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Robust (median/MAD) outlier statistics per group — the
  * heavy-tail-safe alternative to q100's z-score: mean/stddev are
  * dragged by the very outliers they are meant to flag, while the
  * median absolute deviation is not.
  *
  * All statistics are EXACT and integer-valued (the value column is a
  * long — scale decimals to their minor unit first):
  *
  *  - Medians are lower medians computed over the PRE-AGGREGATED value
  *    domain (the q87/q88 trick): `groupBy(grp, v).count` first, then
  *    a prefix-sum window over the distinct values — the window sees
  *    |value domain| rows per group, never the raw rows, so the sort
  *    under it is bounded by domain cardinality at any corpus scale.
  *  - The MAD is the same statistic over `|v − median|`, one more
  *    domain-aggregation round; the per-group medians ride back on a
  *    broadcast-able |groups|-row join.
  *  - A point is an outlier when `|v − median| > k·MAD` — integer
  *    compares only, no float enters anywhere.
  *
  * Two aggregation rounds + two tiny windows; both engines agree
  * bit-for-bit because every intermediate is a long.
  */
object Robust {

  /** Per-group (n, median, mad, n_outliers) of long column `vCol`,
    * flagging `|v − median| > k·mad`. Output columns:
    * (groupCol, n_rows, median_v, mad_v, n_outliers).
    */
  def medianMadOutliers(df: DataFrame, groupCol: String, vCol: String,
      k: Int = 3): DataFrame = {
    val rows = df.select(col(groupCol), col(vCol).cast("long").as("__v"))
      .filter(col("__v").isNotNull)
    val med = weightedLowerMedian(rows, groupCol, "__v").as("median_v")
    val withMed = rows
      .join(broadcast(med.toDF(groupCol, "median_v")), Seq(groupCol))
      .withColumn("__dev", abs(col("__v") - col("median_v")))
    val mad = weightedLowerMedian(withMed, groupCol, "__dev").as("mad_v")
    withMed
      .join(broadcast(mad.toDF(groupCol, "mad_v")), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("median_v")).as("median_v"),
        min(col("mad_v")).as("mad_v"),
        count(when(col("__dev") > col("mad_v") * k, lit(1))).as("n_outliers"))
  }

  /** Winsorization report: per group, the exact lower p-th / (1−p)-th
    * percentile bounds (lower-percentile convention — the smallest v
    * whose cumulative count reaches the target mass, an integer
    * cross-multiplied cut like [[medianMadOutliers]]'s median) and the
    * clip summary a feature pipeline needs BEFORE deciding to
    * winsorize: how many rows each tail clips and how much mass the
    * clipped sum moves.
    *
    * Shape: one (group, value)-domain aggregation, two windows over
    * the DOMAIN rows (bounded by per-group value cardinality, never
    * raw rows), bounds ride back on a |groups|-row broadcast, and the
    * report is one aggregation over the raw rows. All integers.
    *
    * Output: (groupCol, n_rows, lo, hi, n_below, n_above, sum_raw,
    * sum_clipped).
    */
  def winsorizeReport(df: DataFrame, groupCol: String, vCol: String,
      pctNum: Long = 5, pctDen: Long = 100): DataFrame = {
    require(pctNum >= 0 && 2 * pctNum < pctDen,
      s"need 0 <= p < 1/2: $pctNum/$pctDen")
    val rows = df.select(col(groupCol), col(vCol).cast("long").as("__v"))
      .filter(col("__v").isNotNull)
    val per = rows.groupBy(col(groupCol), col("__v"))
      .agg(count(lit(1)).as("__n"))
    val cumW = Window.partitionBy(col(groupCol)).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = Window.partitionBy(col(groupCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val bounds = per
      .withColumn("__cum", sum(col("__n")).over(cumW))
      .withColumn("__tot", sum(col("__n")).over(totW))
      .groupBy(col(groupCol))
      .agg(
        min(when(col("__cum") * pctDen >= col("__tot") * pctNum, col("__v")))
          .as("lo"),
        min(when(col("__cum") * pctDen >= col("__tot") * (pctDen - pctNum),
          col("__v"))).as("hi"))
    val clip = least(greatest(col("__v"), col("lo")), col("hi"))
    rows
      .join(broadcast(bounds), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("lo")).as("lo"), min(col("hi")).as("hi"),
        count(when(col("__v") < col("lo"), lit(1))).as("n_below"),
        count(when(col("__v") > col("hi"), lit(1))).as("n_above"),
        sum(col("__v")).as("sum_raw"),
        sum(clip).as("sum_clipped"))
  }

  /** Lower median of `vCol` per `groupCol` over the aggregated value
    * domain: the smallest v whose cumulative count reaches half the
    * group (2·cum ≥ n picks the ⌈n/2⌉-th element). Output:
    * (groupCol, median).
    */
  private def weightedLowerMedian(df: DataFrame, groupCol: String,
      vCol: String): DataFrame = {
    val per = df.groupBy(col(groupCol), col(vCol))
      .agg(count(lit(1)).as("__n"))
    val cumW = Window.partitionBy(col(groupCol)).orderBy(col(vCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = Window.partitionBy(col(groupCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    per
      .withColumn("__cum", sum(col("__n")).over(cumW))
      .withColumn("__tot", sum(col("__n")).over(totW))
      .filter(col("__cum") * 2 >= col("__tot"))
      .groupBy(col(groupCol))
      .agg(min(col(vCol)).as("__median"))
  }
}
