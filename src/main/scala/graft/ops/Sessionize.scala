package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Gap-based sessionization: consecutive events of the same key
  * belong to one session while the gap between them stays at or under
  * `maxGapUs` microseconds; a larger gap starts a new session.
  *
  * Shape: ONE shuffle on the key, one window sort, a running sum of
  * new-session flags — the canonical Spark form (the batch analogue of
  * Structured Streaming's session windows in
  * graft.streaming.StreamingLift). Microsecond longs (unix_micros) are
  * exact integers, so the gap comparison is engine-portable — no
  * float-seconds rounding. The ts column casts through timestamp_ltz
  * first: parquet writers that omit isAdjustedToUTC surface
  * TIMESTAMP_NTZ, which unix_micros rejects, and under the engine's
  * UTC session timezone the NTZ wall-clock IS the UTC instant.
  *
  * Determinism: the window orders by (ts, tieCol); with a unique
  * tie-break column the total order — and therefore every session
  * index — is reproducible across engines and partitionings. Ties in
  * ts alone have gap 0 and can never open a session, so the flag is
  * order-insensitive even among tied rows.
  */
object Sessionize {

  /** Adds `session_seq`: the 1-based session index within the key. */
  def assignSessions(
      df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      maxGapUs: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val us = unix_micros(col(tsCol).cast("timestamp_ltz"))
    val gap = us - lag(us, 1).over(w)
    val newSession = when(gap.isNull || gap > maxGapUs, 1L).otherwise(0L)
    df.withColumn("session_seq",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-key session profile: session count, event count, the largest
    * session's event count, and the longest session duration (µs).
    */
  def profile(
      df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      maxGapUs: Long): DataFrame = {
    val us = unix_micros(col(tsCol).cast("timestamp_ltz"))
    val perSession = assignSessions(df, keyCol, tsCol, tieCol, maxGapUs)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(count(lit(1)).as("n"), (max(us) - min(us)).as("dur_us"))
    perSession.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n")).as("n_events"),
        max(col("n")).as("max_session_events"),
        max(col("dur_us")).as("max_session_dur_us"))
  }
}
