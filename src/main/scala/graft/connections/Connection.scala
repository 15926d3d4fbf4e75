package graft.connections

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Connection SPI (SURVEY.md §1.1 "Connection", §7.1 step 3): a named,
  * typed endpoint exposing the reference's connection operator surface
  * — `getAll`/`query`/`insertData`/`mergeTables`/`getMax`/`showTables`
  * /`showColumns`/`dump` (the `lib/connections/` modules) — over Spark
  * readers/writers.
  *
  * The reference's chunked-pull `getAll(query, chunk, dataCb, next)`
  * contract dissolves into a partitioned `DataFrame` (SURVEY §3.2):
  * ordering drops, backpressure becomes Spark's scheduler, and the
  * global `--getAllLimit` row cap is injected here at every source.
  */
trait Connection {
  def name: String

  /** S1–S4 scan: full-table read, capped by getAllLimit when set. */
  def getAll(table: String): DataFrame

  /** S6 raw SQL passthrough against this connection's tables,
    * registered as temp views (`query(sql)`, mysql.js:113-179).
    */
  def query(sql: String): DataFrame

  /** S7 `showTables` (mysql.js:67-83). */
  def listTables: Seq[String]

  /** S8 `showColumns` (mysql.js:85-111). */
  def describe(table: String): StructType

  /** A3 `getMax` (mysql.js:193-216). */
  def getMax(table: String, column: String): Option[Any]

  /** S9/O1 `insertData` (mysql.js:258-393). */
  def insertData(table: String, data: DataFrame, key: String = "id",
      mergeOnDuplicates: Boolean = true): Unit

  /** O2 `mergeTables` (mysql.js:547-599). */
  def mergeTables(sourceTable: String, destTable: String, key: String = "id",
      fullMerge: Boolean = false): Unit

  /** S15 `dump` (mysql.js:607-660): snapshot export. Returns the
    * summary the reference logs after a dump — row count plus the
    * humanized on-disk size (F12, `filesize(stats.size)` at
    * mysql.js:655).
    */
  def dump(table: String, path: String, format: String = "parquet"): DumpSummary
}

/** What `dump` reports: where it wrote, how many rows, how many bytes
  * (raw and humanized, F12).
  */
final case class DumpSummary(path: String, rows: Long, bytes: Long) {
  def sizeHuman: String = graft.util.Format.humanBytes(bytes)
}

/** Shared S15 write path: export, then report (rows, bytes, human) —
  * the reference's post-dump progress line (`mysql.js:655`).
  *
  * Row counting rides the write job itself via `Dataset.observe` (a
  * `CollectMetrics` node over the rows actually written), NOT a second
  * pass: re-executing the source plan after the files land would
  * re-read a possibly-mutated source (a JDBC table receiving writes)
  * and report a count that differs from the dumped snapshot, and a
  * count-back read of CSV would split quoted embedded newlines into
  * phantom records. One pass, one snapshot, one number.
  */
object Connections {
  /** Tables a SQL statement references, by case-insensitive
    * word-boundary scan (Spark resolves identifiers case-insensitively
    * by default, so the registration scan must too).
    */
  def referencedTables(catalog: Seq[String], sql: String): Seq[String] =
    catalog.filter(t =>
      ("""(?i)\b""" + java.util.regex.Pattern.quote(t) + """\b""").r
        .findFirstIn(sql).isDefined)

  def dumpTo(spark: SparkSession, df: DataFrame, path: String,
      fmt: String): DumpSummary = {
    val obs = new org.apache.spark.sql.Observation()
    val observed = df.observe(obs,
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("rows"))
    val w = observed.write.mode("overwrite")
    fmt match {
      case "csv"  => w.option("header", "true").csv(path)
      case "json" => w.json(path)
      case _      => w.parquet(path)
    }
    val rows = obs.get("rows").asInstanceOf[Long]
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(p).getLength
    DumpSummary(path, rows, bytes)
  }
}

/** Registry resolving connections by `type` string with user-local
  * builders shadowing built-ins (`buildConnection`,
  * `lib/book.js:173-192`).
  */
final class ConnectionRegistry(spark: SparkSession) {
  import scala.collection.mutable
  private val builders =
    mutable.Map[String, (String, Map[String, String]) => Connection](
      "file" -> ((n, opts) => new FileConnection(spark, n,
        opts.getOrElse("path", "."), opts.getOrElse("format", "parquet"),
        opts.get("getAllLimit").map(_.toLong))),
      "jdbc" -> ((n, opts) => new JdbcConnection(spark, n, opts)),
      "search" -> ((n, opts) => new SearchConnection(spark, n,
        opts.getOrElse("path", "."), opts.get("getAllLimit").map(_.toLong))))
  private val instances = mutable.Map.empty[String, Connection]

  /** User-local connection types shadow built-ins (lib/book.js:176-184). */
  def register(tpe: String)(b: (String, Map[String, String]) => Connection): Unit =
    builders(tpe) = b

  def build(tpe: String, name: String, opts: Map[String, String]): Connection = {
    val c = builders.getOrElse(tpe,
      throw new IllegalArgumentException(s"unknown connection type $tpe")).apply(name, opts)
    instances(name) = c
    c
  }

  def apply(name: String): Connection = instances(name)
}
