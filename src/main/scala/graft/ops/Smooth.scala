package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Recurrence-shaped time-series smoothing — operators whose
  * value at t depends on the value at t−1 (EMA and friends), which no
  * window frame can express: a window aggregates INPUTS over a frame,
  * but a recurrence folds its own OUTPUT forward.
  *
  * The distributed shape is the bounded-group fold: one exchange on
  * the series key, each series' (idx, value) pairs collected SORTED,
  * and the recurrence run as a higher-order `aggregate` fold inside
  * codegen — the q39 sessionize contract (a group costs its own
  * length; series length is a domain constant like days-per-history,
  * not a corpus dimension, so the per-group buffer is bounded at any
  * corpus scale).
  *
  * Integer-exact: with α = num/den the update is
  * `y_t = (y_{t−1}·(den−num) + x_t·num) div den` — a pure long
  * recurrence, so the smoothed series is bit-identical on any engine
  * that folds in the same order (and the fold order is pinned by the
  * idx sort).
  */
object Smooth {

  /** Per-group exponential moving average with rational α = num/den;
    * y₁ = x₁ (the standard initialization).
    *
    * @param df (groupCol, idxCol, valueCol) — one observation per
    *           (group, idx); null values are not allowed (gap-fill /
    *           interpolate first)
    * @return (groupCol, idxCol, valueCol, ema) — one row per input row
    */
  def ema(df: DataFrame, groupCol: String, idxCol: String, valueCol: String,
      alphaNum: Long, alphaDen: Long): DataFrame = {
    require(alphaNum >= 1 && alphaDen >= alphaNum,
      s"need 0 < alpha <= 1: $alphaNum/$alphaDen")
    val keep = alphaDen - alphaNum
    df
      .select(col(groupCol), struct(col(idxCol).cast("long").as("t"),
        col(valueCol).cast("long").as("x")).as("__p"))
      .groupBy(col(groupCol))
      .agg(sort_array(collect_list(col("__p"))).as("__ps"))
      // fold the recurrence over the sorted series; emit (t, x, y) rows
      .select(col(groupCol), explode(expr(
        s"""aggregate(__ps,
             CAST(array() AS ARRAY<STRUCT<t: BIGINT, x: BIGINT, y: BIGINT>>),
             (acc, p) -> array_append(acc, named_struct('t', p.t, 'x', p.x,
               'y', CASE WHEN size(acc) = 0 THEN p.x
                 ELSE (element_at(acc, -1).y * $keep + p.x * $alphaNum)
                   div $alphaDen END)))""")).as("__r"))
      .select(col(groupCol), col("__r.t").as(idxCol),
        col("__r.x").as(valueCol), col("__r.y").as("ema"))
  }
}
