package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Discrete survival analysis over entity event streams — the
  * Kaplan–Meier product-limit estimator (Kaplan & Meier, JASA 1958;
  * public formula) of "how long do users stay active", the retention
  * deliverable next to q81's cohort triangle.
  *
  * Everything heavy reduces FIRST: the corpus collapses to one row per
  * entity (its last-active day), then to the DAY DOMAIN (one row per
  * distinct churn day — a calendar constant, not a corpus dimension).
  * Only that domain-sized table flows through the suffix-sum window
  * and the survival fold, so corpus scale changes the two leading
  * aggregations and nothing after them.
  *
  * The estimator itself is the quantized recurrence
  * `S_t = ⌊S_prev · (n_t − d_t) / n_t⌋` with S at 2²⁰ mass — a pure
  * long fold over the sorted day domain (the [[Smooth]] rule:
  * recurrences fold, they don't window), so both engines walk the
  * identical trajectory.
  */
object Survival {

  /** Kaplan–Meier curve over last-active days.
    *
    * @param df     event rows
    * @param idCol  entity key
    * @param dayCol integral day index of each event
    * @return one row per distinct churn day: (day_idx, at_risk n_t,
    *         churned d_t, survival_q) — survival_q the estimator after
    *         that day's churn, in units of 2⁻²⁰
    */
  def kaplanMeier(df: DataFrame, idCol: String, dayCol: String): DataFrame = {
    val last = df
      .select(col(idCol).as("__id"), col(dayCol).cast("long").as("__t"))
      .filter(col("__t").isNotNull)
      .groupBy(col("__id")).agg(max(col("__t")).as("t"))
    val churn = last.groupBy(col("t")).agg(count(lit(1)).as("d"))
    // suffix sum over the day DOMAIN (bounded by the calendar, so the
    // single-partition window is a constant-size job at any scale)
    val atRisk = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    churn
      .withColumn("n", sum(col("d")).over(atRisk))
      .select(struct(col("t"), col("d"), col("n")).as("__p"))
      .agg(sort_array(collect_list(col("__p"))).as("__ps"))
      .select(explode(expr(
        """aggregate(__ps,
             CAST(array() AS ARRAY<STRUCT<t: BIGINT, d: BIGINT, n: BIGINT, s: BIGINT>>),
             (acc, p) -> array_append(acc, named_struct('t', p.t, 'd', p.d,
               'n', p.n,
               's', CASE WHEN size(acc) = 0 THEN (1048576 * (p.n - p.d)) div p.n
                 ELSE (element_at(acc, -1).s * (p.n - p.d)) div p.n END)))"""))
        .as("__r"))
      .select(col("__r.t").as("day_idx"), col("__r.n").as("at_risk"),
        col("__r.d").as("churned"), col("__r.s").as("survival_q"))
  }
}
