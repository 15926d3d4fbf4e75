package graft.engine

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.ParquetTable

/** O6 audit/event sink: every book state event appended to an audit
  * table (reference `books/etl/book.js:13-15`, asserted by
  * `test/integration/etl.js:128-134`). Same row shape as the reference
  * `empujar` table: state, time, name, duration, data (JSON string,
  * `lib/book.js:238`).
  */
final class AuditSink(spark: SparkSession) {
  private val events = new ConcurrentLinkedQueue[StateEvent]()

  def attach(book: Book): this.type = { book.onState(events.add(_)); this }

  def toDf: DataFrame = toDf(events.asScala.toSeq)

  private def toDf(snapshot: Seq[StateEvent]): DataFrame = {
    import spark.implicits._
    val rows = snapshot.map { e =>
      (e.state, new java.sql.Timestamp(e.timeMs), e.name, e.durationSec,
        graft.util.Json.obj(e.data.toSeq.sorted))
    }
    rows.toDF("state", "time", "name", "duration", "data")
  }

  /** Flush collected events to the audit table (append — the audit log
    * is append-only by contract). Drains by `poll()`, NOT
    * snapshot-write-clear: a clear() after a long parquet write would
    * unconditionally discard events enqueued concurrently (streaming
    * listeners fire mid-flush) — a silent audit-log gap. Anything
    * arriving after the drain waits for the next flush.
    */
  def flush(table: ParquetTable): Unit = {
    val drained = Iterator.continually(events.poll())
      .takeWhile(_ != null).toSeq
    if (drained.nonEmpty) table.append(toDf(drained))
  }

  /** Land drift-monitor verdicts in the O6 audit shape — the bridge
    * between [[graft.streaming.StreamingLift.histDriftStream]]'s
    * alerts table (batch_id, group, n_batch, n_hist, tvd_ppm,
    * alerted) and the book's audit stream (the reference's convention
    * of one event table carrying every operational signal,
    * `books/etl/book.js:13-15`): one `drift:alert` (or `drift:ok`)
    * event per alert row, name = the drifting group, data = the exact
    * integers the verdict was computed from. The collect is bounded
    * by construction — one row per (micro-batch, group), driver-side
    * metadata like every other audit event. Returns the number of
    * events recorded.
    */
  def recordDrift(alerts: DataFrame, groupCol: String,
      onlyAlerted: Boolean = true): Int = {
    val rows = alerts
      .filter(if (onlyAlerted) col("alerted") else lit(true))
      .select(col("batch_id"), col(groupCol).cast("string"),
        col("n_batch"), col("n_hist"), col("tvd_ppm"), col("alerted"))
      .collect()
    rows.foreach { r =>
      events.add(StateEvent(
        if (r.getBoolean(5)) "drift:alert" else "drift:ok",
        System.currentTimeMillis(), r.getString(1), 0L,
        Map("batchId" -> r.getLong(0).toString,
          "n_batch" -> r.getLong(2).toString,
          "n_hist" -> (if (r.isNullAt(3)) "" else r.getLong(3).toString),
          "tvd_ppm" -> (if (r.isNullAt(4)) "" else r.getLong(4).toString))))
    }
    rows.length
  }

  /** [[recordDrift]] reading the alerts TABLE through the
    * exactly-once view ([[graft.streaming.StreamingLift.pairsView]]):
    * the raw table is at-least-once (a crash-window replay re-appends
    * bit-identical batch_id-keyed rows), and recording it raw would
    * emit duplicate drift events into the audit stream.
    */
  def recordDrift(alerts: ParquetTable, groupCol: String,
      onlyAlerted: Boolean): Int =
    recordDrift(graft.streaming.StreamingLift.pairsView(alerts),
      groupCol, onlyAlerted)

  def recordDrift(alerts: ParquetTable, groupCol: String): Int =
    recordDrift(alerts, groupCol, onlyAlerted = true)

  /** Mirror Structured Streaming progress into the SAME audit shape
    * the batch books emit (the reference logs per-chapter progress the
    * same way, `lib/book.js:250-258`): one `streamProgress` event per
    * micro-batch with rows/sec and row counts, and a
    * `streamTerminated` event on stop/failure. Returns the listener so
    * callers can detach with `spark.streams.removeListener`.
    *
    * Events are driver-side metadata (one per micro-batch, not per
    * row) — the audit path adds zero work to executors.
    */
  def attachStreams(): org.apache.spark.sql.streaming.StreamingQueryListener = {
    import org.apache.spark.sql.streaming.StreamingQueryListener
    import StreamingQueryListener.{QueryStartedEvent, QueryProgressEvent, QueryTerminatedEvent}
    val l = new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit =
        events.add(StateEvent("streamStarted", System.currentTimeMillis(),
          e.name match { case null => e.id.toString; case n => n }, 0L, Map.empty))
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        events.add(StateEvent("streamProgress", System.currentTimeMillis(),
          p.name match { case null => p.id.toString; case n => n },
          p.batchDuration / 1000.0,
          Map("batchId" -> p.batchId.toString,
            "numInputRows" -> p.numInputRows.toString,
            "processedRowsPerSecond" -> f"${p.processedRowsPerSecond}%.1f")))
      }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
        events.add(StateEvent("streamTerminated", System.currentTimeMillis(),
          e.id.toString, 0L,
          e.exception.map(x => Map("error" -> x.take(200))).getOrElse(Map.empty)))
    }
    spark.streams.addListener(l)
    l
  }
}
