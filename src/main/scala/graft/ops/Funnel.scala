package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Ordered conversion funnel over an event stream: for a stage
  * sequence (s0, s1, …), a user completes stage i when an event of
  * that type exists STRICTLY AFTER their earliest completion of stage
  * i-1 — the classic product-analytics rollup built downstream of
  * event sinks like the reference's Elasticsearch table scans
  * (`lib/connections/elasticsearch.js:62-103` feeds exactly this kind
  * of aggregation in its consumers).
  *
  * Shape at scale: ONE shuffle (hash partition by user), then one
  * chained whole-partition window minimum per stage over the SAME
  * partitioning — no orderBy in the window spec, so Catalyst plans all
  * stages on a single exchange with no sort; stage count adds
  * expressions, not passes. The rollup then reduces to one row per
  * user (partial map-side) before the tiny per-stage count.
  */
object Funnel {

  /** Adds `t0 … t(n-1)`: the user's earliest timestamp completing each
    * stage, null from the first stage the user never reached (each
    * condition requires `ts > t(i-1)`, and a null prior stage nulls
    * the comparison).
    */
  def stageTimes(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(userCol))
    stages.zipWithIndex.foldLeft(df) { case (d, (stage, i)) =>
      val hit =
        if (i == 0) col(typeCol) === lit(stage)
        else col(typeCol) === lit(stage) && col(tsCol) > col(s"t${i - 1}")
      d.withColumn(s"t$i", min(when(hit, col(tsCol))).over(w))
    }
  }

  /** Per-stage conversion counts: (stage_idx, stage, n_users), where
    * n_users monotonically narrows down the funnel.
    */
  def counts(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    val staged = stageTimes(df, userCol, tsCol, typeCol, stages)
    // t_i is constant within a user's partition; max() is just "the value"
    val perUser = staged.groupBy(col(userCol))
      .agg(max(col("t0")).as("t0"),
        stages.indices.drop(1).map(i => max(col(s"t$i")).as(s"t$i")): _*)
    val totals = perUser.agg(
      count(col("t0")).as("c0"),
      stages.indices.drop(1).map(i => count(col(s"t$i")).as(s"c$i")): _*)
    totals.select(posexplode(
        array(stages.indices.map(i => col(s"c$i")): _*)).as(Seq("stage_idx", "n_users")))
      .select(col("stage_idx").cast("long").as("stage_idx"),
        element_at(lit(stages.toArray), col("stage_idx").cast("int") + 1).as("stage"),
        col("n_users"))
  }
}
