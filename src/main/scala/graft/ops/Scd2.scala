package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Type-2 slowly-changing-dimension build from a change stream —
  * the versioned counterpart of the reference's keyed upsert (which is
  * SCD type 1: update-in-place, `mysql.js:369-377`). A warehouse
  * loading user/account attributes from events needs the full validity
  * history: one row per (key, attribute-state) interval with
  * `effective_from` / `effective_to` / `is_current`.
  *
  * Semantics: rows are ordered per key by (ts, tie); consecutive rows
  * with identical tracked attributes compress into one interval
  * (change detection via null-safe struct compare against the lag);
  * each surviving change opens an interval that closes when the next
  * one opens (`lead`), the last staying open (`effective_to` NULL,
  * `is_current` true).
  *
  * Scale shape: one shuffle on the key; the change-compression lag and
  * the interval lead share the same (partition, order), so Catalyst
  * plans a single exchange with two window passes — no joins, nothing
  * quadratic. Ties are totally ordered by `tieCol`, so the result is
  * partitioning-independent.
  */
object Scd2 {

  def fromChanges(df: DataFrame, keyCol: String, tsCol: String,
      attrCols: Seq[String], tieCol: String): DataFrame = {
    require(attrCols.nonEmpty, "need at least one tracked attribute")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val attrs = struct(attrCols.map(col): _*)
    df.withColumn("__prev", lag(attrs, 1).over(w))
      .filter(!(col("__prev") <=> attrs)) // first row or changed state
      .drop("__prev")
      .withColumn("effective_from", col(tsCol))
      .withColumn("effective_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("effective_to").isNull)
  }
}
