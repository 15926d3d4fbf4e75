package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Distributed sweep-line: a GLOBAL running sum over ordered
  * event points (+1/-1 interval endpoints, ledger deltas, watermark
  * advances) without ever sorting the whole dataset in one partition.
  *
  * The naive Spark form — `sum(d) over (order by t)` with no
  * partitioning — funnels every row through a single task, the classic
  * scale killer for prefix sums. This implements the two-phase
  * textbook alternative with plain Column expressions:
  *
  *   1. pre-aggregate deltas per distinct `t` (ties collapse, so ROWS
  *      and RANGE frames agree from here on);
  *   2. range-bucket `t` into `buckets` fixed-width cells (bounds are
  *      two driver scalars — the same sanctioned class as watermark
  *      reads) and run the prefix sum WITHIN each bucket, a shuffle
  *      that spreads the sort across the cluster;
  *   3. reduce each bucket to its total (`buckets` rows), prefix-sum
  *      those on a single tiny partition, and broadcast the per-bucket
  *      offsets back.
  *
  * `running(t) = bucket_offset(bucket(t)) + within_bucket_prefix(t)`
  * is exact regardless of where the bucket boundaries fall. Integer
  * deltas make the sum engine-portable (no float accumulation order).
  *
  * Skew: fixed-width cells assume event times are roughly uniform; a
  * hot cell degrades toward the single-partition sort only for its own
  * rows. At cluster scale AQE skew-split handles the residual; exact
  * quantile boundaries would be the deliberate upgrade.
  */
object Sweep {

  /** Adds `running`: the global prefix sum of `dCol` in `tCol` order
    * (ties pre-collapsed, so `running` at t covers ALL deltas ≤ t).
    * Output has one row per distinct `tCol` value: (t, d, running).
    *
    * `bounds`: optional covering (lo, hi) range for `tCol`. The result
    * is EXACT for any bounds — cells are just group keys — only load
    * balance depends on them; pass bounds read off a cheap raw-column
    * scan when you have one. When no bounds are given, min/max ride
    * IN-PLAN as scalar subqueries over the (t, d) pre-aggregate (see
    * [[runningSums]]), so the input lineage executes exactly once
    * either way.
    */
  def runningSum(points: DataFrame, tCol: String, dCol: String,
      buckets: Int = 1024, bounds: Option[(Long, Long)] = None): DataFrame =
    runningSums(points, tCol, Seq(dCol), buckets, bounds)
      .withColumnRenamed(s"d_$dCol", "d")
      .withColumnRenamed(s"running_$dCol", "running")

  /** The k-column form of [[runningSum]]: ONE domain aggregation, ONE
    * within-cell window and ONE offsets broadcast computing the global
    * prefix sum of EVERY column in `dCols` simultaneously — callers
    * that need two cumulative series over the same axis (e.g. a
    * two-sample CDF) previously paid two full sweeps plus a join to
    * re-align them; this is one sweep and no join.
    *
    * Output: one row per distinct t — (t, d_<c>…, running_<c>…).
    *
    * When `bounds` is absent, the cell bounds ride IN-PLAN as two
    * uncorrelated scalar subqueries over the (t, d…) pre-aggregate
    * (the q201 bloom-state shape) instead of the former eager driver
    * min/max probe: the probe was a SEPARATE action that executed the
    * full input lineage once at construction time while the returned
    * plan executed it again — the double-execution the single-scan
    * contract (packChunks, proportionalSample, vocabGrowth) bans,
    * here closed for EVERY caller at the source. In-plan, the
    * subqueries' domain aggregate is the SAME exchange subtree the
    * sweep itself shuffles, so exchange reuse computes it once and no
    * extra action, checkpoint, or pass over caller lineage exists at
    * any scale.
    */
  def runningSums(points: DataFrame, tCol: String, dCols: Seq[String],
      buckets: Int = 1024, bounds: Option[(Long, Long)] = None): DataFrame = {
    require(dCols.nonEmpty, "need at least one delta column")
    // null t has no position on the line and null d no contribution —
    // drop both up front (a null-t group would otherwise leak into the
    // cell offsets while the offset join silently dropped its row)
    val byT = points
      .filter(col(tCol).isNotNull && dCols.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(col(tCol).cast("long").as("t"))
      .agg(sum(col(dCols.head).cast("long")).as(s"d_${dCols.head}"),
        dCols.tail.map(c => sum(col(c).cast("long")).as(s"d_$c")): _*)
    def scalarOf(agg: DataFrame): org.apache.spark.sql.Column =
      org.apache.spark.sql.graft.expr.column(
        org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
          agg.queryExecution.analyzed))
    // (lo, width) as Columns: literals when the caller supplied
    // bounds, in-plan scalars otherwise. Cell assignment is integer
    // division of non-negative offsets — any consistent mapping is
    // exact (cells are just group keys), bounds only steer balance.
    val (loC, widthC) = bounds match {
      case Some((lo, hi)) =>
        (lit(lo), lit(math.max(1L, (hi - lo) / buckets + 1)))
      case None =>
        val lo = scalarOf(byT.agg(min(col("t")).as("__lo")))
        val hi = scalarOf(byT.agg(max(col("t")).as("__hi")))
        // exact integer (hi−lo) div buckets — Column `/` on longs is
        // double division, wrong past 2⁵³
        val span = org.apache.spark.sql.graft.expr.column(
          new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
            org.apache.spark.sql.graft.expr.expression(hi - lo),
            org.apache.spark.sql.graft.expr.expression(lit(buckets.toLong))))
        (lo, greatest(lit(1L), span + lit(1L)))
    }
    // IntegralDivide, same as the span computation above: Column `/`
    // is double division, whose rounding past 2⁵³ deviates from the
    // integer bucket math the rationale describes (it stays monotone —
    // cells are group keys — but the two expressions should agree)
    val cell = org.apache.spark.sql.graft.expr.column(
      new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.graft.expr.expression(col("t") - loC),
        org.apache.spark.sql.graft.expr.expression(widthC.cast("long"))))
    val within = Window.partitionBy(col("cell")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perCell = dCols.foldLeft(byT.withColumn("cell", cell))((df, c) =>
      df.withColumn(s"within_$c", sum(col(s"d_$c")).over(within)))
    // bucket totals: ≤ `buckets` rows — the one-partition window runs
    // over this tiny frame, never the data. The partition key is a
    // constant-by-value expression (pmod(cell, 1) ≡ 0) rather than a
    // bare orderBy: semantically the same single partition but
    // DECLARED, so WindowExec's "No Partition Defined" warning stays
    // reserved for accidental O(data) funnels instead of firing on
    // this bounded reduction. (A literal lit(0) does not survive —
    // AQE's logical re-optimization strips foldable partition keys
    // and the warning returns.)
    val offW = Window.partitionBy(pmod(col("cell"), lit(1)))
      .orderBy(col("cell"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = dCols.foldLeft(
        perCell.groupBy(col("cell"))
          .agg(sum(col(s"d_${dCols.head}")).as(s"ct_${dCols.head}"),
            dCols.tail.map(c => sum(col(s"d_$c")).as(s"ct_$c")): _*))(
        (df, c) => df.withColumn(s"offset_$c",
          coalesce(sum(col(s"ct_$c")).over(offW), lit(0L))))
      .select(col("cell") +: dCols.map(c => col(s"offset_$c")): _*)
    perCell.join(broadcast(offsets), Seq("cell"))
      .select(col("t") +:
        (dCols.map(c => col(s"d_$c")) ++
          dCols.map(c =>
            (col(s"offset_$c") + col(s"within_$c")).as(s"running_$c"))): _*)
  }

  /** Peak of the running sum and the earliest `t` reaching it — e.g.
    * peak concurrent intervals for (+1 at start, -1 past end) points.
    * Returns ONE row: (peak, at_t).
    */
  def peak(points: DataFrame, tCol: String, dCol: String,
      buckets: Int = 1024, bounds: Option[(Long, Long)] = None): DataFrame =
    // one struct-max pass: lexicographic (running desc, t asc via the
    // negation) — no max-then-self-join, so the sweep lineage appears
    // once in the plan instead of twice
    runningSum(points, tCol, dCol, buckets, bounds)
      .agg(max(struct(col("running"), (-col("t")).as("neg_t"))).as("s"))
      .select(col("s.running").as("peak"), (-col("s.neg_t")).as("at_t"))
}
