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
    // ONE raw scan: aggregate to the (group, value) domain immediately
    // — every later stage (median, deviations, MAD, the outlier
    // report) is a pure function of the (g, v, count) table, so
    // re-touching raw rows (the former 3-scan, 2-raw-join shape)
    // bought nothing. The domain subtree recurs in several branches of
    // ONE plan, so exchange reuse computes it once — no checkpoint
    // needed. At 100 TB the domain is bounded by per-group value
    // cardinality while raw rows are the corpus.
    val per = df.select(col(groupCol), col(vCol).cast("long").as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy(col(groupCol), col("__v"))
      .agg(count(lit(1)).as("__n"))
    val med = domainLowerMedian(per, groupCol, "__v").as("median_v")
    val devDom = per
      .join(broadcast(med.toDF(groupCol, "median_v")), Seq(groupCol))
      .groupBy(col(groupCol), col("median_v"),
        abs(col("__v") - col("median_v")).as("__dev"))
      .agg(sum(col("__n")).as("__n"))
    val mad = domainLowerMedian(
      devDom.select(col(groupCol), col("__dev"), col("__n")),
      groupCol, "__dev").as("mad_v")
    devDom
      .join(broadcast(mad.toDF(groupCol, "mad_v")), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(
        sum(col("__n")).as("n_rows"),
        min(col("median_v")).as("median_v"),
        min(col("mad_v")).as("mad_v"),
        coalesce(sum(when(col("__dev") > col("mad_v") * k, col("__n"))),
          lit(0L)).as("n_outliers"))
  }

  /** Winsorization report: per group, the exact lower p-th / (1−p)-th
    * percentile bounds (lower-percentile convention — the smallest v
    * whose cumulative count reaches the target mass, an integer
    * cross-multiplied cut like [[medianMadOutliers]]'s median) and the
    * clip summary a feature pipeline needs BEFORE deciding to
    * winsorize: how many rows each tail clips and how much mass the
    * clipped sum moves.
    *
    * Shape: ONE raw scan into the pinned (group, value) domain, two
    * windows over the DOMAIN rows (bounded by per-group value
    * cardinality, never raw rows), bounds ride back on a |groups|-row
    * broadcast, and the report is one aggregation over the SAME
    * pinned domain — counts weight by the domain multiplicity, sums
    * weight by `v·n` (per-term magnitude ≤ the group's Σ|v|, the same
    * long-capacity contract the raw-row sum already required). All
    * integers.
    *
    * Output: (groupCol, n_rows, lo, hi, n_below, n_above, sum_raw,
    * sum_clipped).
    */
  def winsorizeReport(df: DataFrame, groupCol: String, vCol: String,
      pctNum: Long = 5, pctDen: Long = 100): DataFrame = {
    require(pctNum >= 0 && 2 * pctNum < pctDen,
      s"need 0 <= p < 1/2: $pctNum/$pctDen")
    val per = df.select(col(groupCol), col(vCol).cast("long").as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy(col(groupCol), col("__v"))
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
    per
      .join(broadcast(bounds), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(
        sum(col("__n")).as("n_rows"),
        min(col("lo")).as("lo"), min(col("hi")).as("hi"),
        coalesce(sum(when(col("__v") < col("lo"), col("__n"))), lit(0L))
          .as("n_below"),
        coalesce(sum(when(col("__v") > col("hi"), col("__n"))), lit(0L))
          .as("n_above"),
        sum(col("__v") * col("__n")).as("sum_raw"),
        sum(clip * col("__n")).as("sum_clipped"))
  }

  /** Lower median of `vCol` per `groupCol` over an ALREADY-AGGREGATED
    * value domain carrying multiplicities in `__n`: the smallest v
    * whose cumulative count reaches half the group (2·cum ≥ n picks
    * the ⌈n/2⌉-th element). Output: (groupCol, median).
    */
  private def domainLowerMedian(dom: DataFrame, groupCol: String,
      vCol: String): DataFrame = {
    val cumW = Window.partitionBy(col(groupCol)).orderBy(col(vCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = Window.partitionBy(col(groupCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    dom
      .withColumn("__cum", sum(col("__n")).over(cumW))
      .withColumn("__tot", sum(col("__n")).over(totW))
      .filter(col("__cum") * 2 >= col("__tot"))
      .groupBy(col(groupCol))
      .agg(min(col(vCol)).as("__median"))
  }
}
