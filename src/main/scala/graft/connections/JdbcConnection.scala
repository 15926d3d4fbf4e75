package graft.connections

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** JDBC connection: one implementation covers the reference's MySQL /
  * Redshift / Snowflake endpoints (`lib/connections/{mysql,redshift,
  * snowflake}.js`) — Spark's JDBC source owns the dialect differences
  * the reference hand-codes (`LIMIT o,c` vs `OFFSET..FETCH`,
  * S1–S3).
  *
  * The reference's manual OFFSET pagination becomes partitioned reads
  * (`partitionColumn`/`lowerBound`/`upperBound`/`numPartitions`) so a
  * 1000-executor cluster scans ranges concurrently instead of a serial
  * chunk loop.
  *
  * NOTE: no database service exists in this offline container, so this
  * class is compile-verified only; the FileConnection carries the
  * tested operator semantics (both delegate upserts to the same
  * [[graft.ops.Upsert]] core).
  */
final class JdbcConnection(spark: SparkSession, val name: String,
    opts: Map[String, String]) extends Connection {
  private val url = opts("url")
  private val common = opts.view.filterKeys(k => k != "url" && k != "getAllLimit").toMap
  private val getAllLimit = opts.get("getAllLimit").map(_.toLong)

  private def reader = spark.read.format("jdbc").option("url", url).options(common)

  override def getAll(table: String): DataFrame = {
    val base = opts.get("partitionColumn") match {
      case Some(pc) =>
        // Partitioned range scan replacing the reference's LIMIT-offset
        // recursion (mysql.js:232-256).
        val bounds = reader.option("dbtable",
          s"(SELECT min($pc) lo, max($pc) hi FROM $table) b").load().head()
        reader.option("dbtable", table)
          .option("partitionColumn", pc)
          .option("lowerBound", bounds.get(0).toString)
          .option("upperBound", bounds.get(1).toString)
          .option("numPartitions", opts.getOrElse("numPartitions", "32"))
          .load()
      case None => reader.option("dbtable", table).load()
    }
    getAllLimit.fold(base)(n => base.limit(n.toInt))
  }

  override def query(sql: String): DataFrame =
    reader.option("dbtable", s"($sql) q").load()

  override def listTables: Seq[String] =
    query("SELECT table_name FROM information_schema.tables")
      .collect().map(_.getString(0)).toSeq.sorted

  override def describe(table: String): StructType = getAll(table).schema

  override def getMax(table: String, column: String): Option[Any] = {
    val row = query(s"SELECT MAX($column) AS mx FROM $table").head()
    if (row.isNullAt(0)) None else Some(row.get(0))
  }

  /** JDBC sinks get endpoint transactions; merge semantics require the
    * endpoint's own upsert (the reference pushes `ON DUPLICATE KEY
    * UPDATE` / `MERGE INTO` SQL) — Spark's JDBC writer only appends or
    * overwrites, so insertData stages an append and documents that
    * keyed merge belongs to [[FileConnection]]-backed tables.
    */
  override def insertData(table: String, data: DataFrame, key: String,
      mergeOnDuplicates: Boolean): Unit =
    data.write.format("jdbc").option("url", url).options(common)
      .option("dbtable", table).mode(SaveMode.Append).save()

  override def mergeTables(sourceTable: String, destTable: String, key: String,
      fullMerge: Boolean): Unit =
    insertData(destTable, getAll(sourceTable), key, mergeOnDuplicates = !fullMerge)

  override def dump(table: String, path: String, fmt: String): Unit = {
    val w = getAll(table).write.mode("overwrite")
    fmt match {
      case "csv" => w.option("header", "true").csv(path)
      case "json" => w.json(path)
      case _ => w.parquet(path)
    }
  }
}
