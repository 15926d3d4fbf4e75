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

  def toDf: DataFrame = {
    import spark.implicits._
    val rows = events.asScala.toSeq.map { e =>
      (e.state, new java.sql.Timestamp(e.timeMs), e.name, e.durationSec,
        graft.util.Json.obj(e.data.toSeq.sorted))
    }
    rows.toDF("state", "time", "name", "duration", "data")
  }

  /** Flush collected events to the audit table (append — the audit log
    * is append-only by contract).
    */
  def flush(table: ParquetTable): Unit = {
    table.append(toDf)
    events.clear()
  }
}
