package graft.connections

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.ops.TableOps
import graft.sources.ParquetTable

/** File-store connection: a directory of parquet/csv/json tables —
  * covers the reference's S3 object store (`lib/connections/s3.js`),
  * mysqldump staging (`mysql.js:607-660`) and FTP-staged files
  * (`lib/connections/ftp.js`) in one Spark-native endpoint. Tables are
  * `<root>/<name>.parquet` files (driver testdata layout) or
  * `<root>/<name>` directories (engine-written).
  */
final class FileConnection(spark: SparkSession, val name: String,
    root: String, format: String = "parquet",
    getAllLimit: Option[Long] = None) extends Connection {

  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private[connections] def pathOf(table: String): String = {
    val flat = s"$root/$table.$format"
    if (fs.exists(new Path(flat))) flat else s"$root/$table"
  }

  def table(tableName: String): ParquetTable = {
    // the mutable-table machinery (versioned commits, keyed merge) is
    // parquet-shaped: routing a csv/json connection through it would
    // WRITE parquet that the format-specific getAll then misreads as
    // csv/json garbage — fail fast instead
    require(format == "parquet",
      s"keyed writes need a parquet connection; '$name' is format=$format " +
        "(csv/json connections are scan/dump endpoints — stage into a " +
        "parquet connection to merge)")
    ParquetTable(spark, pathOf(tableName))
  }

  override def getAll(tableName: String): DataFrame = {
    val df = format match {
      // resolve through the table's live version dir (versioned-pointer
      // layout); single-file / legacy paths resolve to themselves
      case "parquet" => spark.read.parquet(table(tableName).dataDir)
      case "csv" => spark.read.option("header", "true").option("inferSchema", "true")
        .csv(pathOf(tableName))
      case "json" => spark.read.json(pathOf(tableName))
      case other => spark.read.format(other).load(pathOf(tableName))
    }
    // --getAllLimit global row cap (lib/book.js:74, mysql.js:248-252);
    // caps beyond Int.MaxValue mean unlimited (reference default is
    // Infinity) — .limit(int) must not wrap.
    getAllLimit.filter(_ <= Int.MaxValue).fold(df)(n => df.limit(n.toInt))
  }

  /** S6 passthrough. Registers only the tables the SQL references (a
    * word-boundary scan over the catalog, CASE-INSENSITIVE to match
    * Spark's default identifier resolution — `FROM Users` must find
    * the `users` table) — registering everything costs a directory
    * listing plus N schema reads per query.
    */
  override def query(sql: String): DataFrame = {
    Connections.referencedTables(listTables, sql)
      .foreach(t => getAll(t).createOrReplaceTempView(t))
    spark.sql(sql)
  }

  override def listTables: Seq[String] = {
    val p = new Path(root)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith(".") || n.endsWith("__staging") || n.endsWith("__old"))
      .map(n => if (n.endsWith(s".$format")) n.dropRight(format.length + 1) else n)
      .sorted // rows.sort() on table lists, mysql.js:78
  }

  override def describe(tableName: String): StructType = getAll(tableName).schema

  override def getMax(tableName: String, column: String): Option[Any] = {
    if (!listTables.contains(tableName)) return None
    val row = getAll(tableName).agg(org.apache.spark.sql.functions.max(
      org.apache.spark.sql.functions.col(column))).head()
    if (row.isNullAt(0)) None else Some(row.get(0))
  }

  override def insertData(tableName: String, data: DataFrame, key: String,
      mergeOnDuplicates: Boolean): Unit =
    TableOps.insertData(table(tableName), data, key, mergeOnDuplicates)

  override def mergeTables(sourceTable: String, destTable: String, key: String,
      fullMerge: Boolean): Unit =
    TableOps.mergeTables(table(sourceTable), table(destTable), key, fullMerge)

  override def dump(tableName: String, path: String, fmt: String): DumpSummary =
    Connections.dumpTo(spark, getAll(tableName), path, fmt)
}
