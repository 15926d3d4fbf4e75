package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Linear-interpolation imputation over a regular spine — the
  * companion to forward-fill (q99): where LOCF copies the last
  * observation, interpolation reconstructs the straight line between
  * the bracketing observations — the standard gap repair for slowly
  * varying time-series features.
  *
  * Integer-exact: with the previous observation (tₚ, vₚ) and the next
  * (tₙ, vₙ), the imputed value at t is
  *
  *   ⌊(vₚ·(tₙ − t) + vₙ·(t − tₚ)) div (tₙ − tₚ)⌋
  *
  * — pure long arithmetic, so both engines produce identical values
  * (no float lerp drift). Ends stay null outside the first/last
  * observation (no extrapolation).
  *
  * Scale shape: ONE window exchange on the group key (two frame
  * directions over the same sort — Spark evaluates both over a single
  * partitioned sort, no second shuffle). The spine join follows the
  * q70 rule: the observation side is pre-aggregated to at most |spine|
  * rows, broadcast against the spine.
  */
object Interpolate {

  /** @param df       (groupCol, idxCol, valueCol) observation rows —
    *                  at most one observation per (group, idx); null
    *                  valueCol rows are gaps
    * @param groupCol  series key
    * @param idxCol    integral position on the spine (already gap-free
    *                  — run the q70 spine join first)
    * @param valueCol  integral observed value, null at gaps
    * @return input columns + `interp` — observed value where present,
    *         integer lerp inside gaps, null outside the observed span
    */
  def linear(df: DataFrame, groupCol: String, idxCol: String,
      valueCol: String): DataFrame = {
    val g = col(groupCol)
    val t = col(idxCol).cast("long")
    val v = col(valueCol).cast("long")
    val back = Window.partitionBy(g).orderBy(t)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(g).orderBy(t)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    def obs(c: Column): Column = when(v.isNotNull, c)
    df
      .withColumn("__pv", last(obs(v), ignoreNulls = true).over(back))
      .withColumn("__pt", last(obs(t), ignoreNulls = true).over(back))
      .withColumn("__nv", first(obs(v), ignoreNulls = true).over(fwd))
      .withColumn("__nt", first(obs(t), ignoreNulls = true).over(fwd))
      .withColumn("interp",
        when(v.isNotNull, v).otherwise(
          when(col("__pv").isNotNull && col("__nv").isNotNull, expr(
            s"(__pv * (__nt - CAST($idxCol AS BIGINT)) + __nv * (CAST($idxCol AS BIGINT) - __pt)) div (__nt - __pt)"))))
      .drop("__pv", "__pt", "__nv", "__nt")
  }
}
