package graft.connections

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Search-index connection — the Spark-native equivalent of the
  * reference's Elasticsearch endpoint (S4/S10,
  * /root/reference/lib/connections/elasticsearch.js). Each "index" is
  * a directory of JSON-lines documents (the standard index-export
  * shape) under a base path; scans are distributed JSON reads instead
  * of a serial scroll loop.
  *
  * Reference contracts carried over:
  *  - `insertData` = per-doc update-or-create by id
  *    (elasticsearch.js:30-66): field-level merge — an update carrying
  *    a subset of fields preserves the doc's remaining fields
  *    ([[graft.ops.Upsert.fieldMerge]]).
  *  - `getAll` `_source`/fields projection (elasticsearch.js:80-82,
  *    96-104): requested-but-absent fields come back as NULL columns.
  *  - ISO-8601 date re-typing (elasticsearch.js:106-114): a string
  *    column whose non-null values all match
  *    `yyyy-MM-ddTHH:mm:ss[.SSS]Z` becomes a timestamp. (The reference
  *    re-types per VALUE on untyped rows; a DataFrame column has one
  *    type, so the rule is per-column with an all-values guard —
  *    decided by one small aggregate over the scan.)
  *  - the global `getAllLimit` row cap (elasticsearch.js:119).
  */
final class SearchConnection(spark: SparkSession, val name: String,
    basePath: String, getAllLimit: Option[Long] = None) extends Connection {

  private val IsoRe = "^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}(\\.\\d*)?Z$"
  private def hconf = spark.sparkContext.hadoopConfiguration
  private def fs = new Path(basePath).getFileSystem(hconf)
  private def pathOf(index: String) = s"$basePath/$index"

  private def indexExists(index: String): Boolean =
    graft.sources.VersionedLayout.hasPublishedData(fs, pathOf(index),
      _.startsWith("part-"))

  /** ISO-date re-typing: cast each string column to timestamp iff all
    * its non-null values look ISO-8601 (one boolean per string column,
    * computed in a single aggregate pass).
    */
  private def retypeDates(df: DataFrame): DataFrame = {
    val candidates = df.schema.fields.filter(_.dataType == StringType).map(_.name)
    if (candidates.isEmpty) return df
    val flags = df.agg(
      count(lit(1)).as("__n"),
      candidates.map(c =>
        (min(col(c).rlike(IsoRe)).as(c)): Column): _*).head()
    val isoCols = candidates.filter(c => flags.getAs[Any](c) == true)
    isoCols.foldLeft(df)((d, c) => d.withColumn(c, to_timestamp(col(c))))
  }

  override def getAll(index: String): DataFrame = {
    val base = retypeDates(spark.read.json(
      graft.sources.VersionedLayout.dataDir(fs, pathOf(index))))
    getAllLimit.filter(_ <= Int.MaxValue).fold(base)(n => base.limit(n.toInt))
  }

  /** S4 scan with `_source` field projection: requested fields only,
    * absent ones as NULL (elasticsearch.js:96-104); `*` = everything.
    */
  def getAll(index: String, fields: Seq[String]): DataFrame = {
    val all = getAll(index)
    if (fields == Seq("*") || fields.isEmpty) all
    else {
      val have = all.columns.toSet
      all.select(fields.map(f =>
        if (have.contains(f)) col(f) else lit(null).as(f)): _*)
    }
  }

  /** Registers only the indices the SQL references (case-insensitive
    * word-boundary scan, like [[FileConnection.query]]): eager
    * registration would pay each index's `retypeDates` aggregate scan
    * — a full pass over every index in the base path — for a query
    * that touches one of them.
    */
  override def query(sql: String): DataFrame = {
    Connections.referencedTables(listTables, sql)
      .foreach(i => getAll(i).createOrReplaceTempView(i))
    spark.sql(sql)
  }

  /** showIndices (elasticsearch.js:25-28). */
  override def listTables: Seq[String] = {
    val base = new Path(basePath)
    if (!fs.exists(base)) Nil
    else fs.listStatus(base).filter(_.isDirectory).map(_.getPath.getName).toSeq.sorted
  }

  override def describe(index: String): StructType = getAll(index).schema

  override def getMax(index: String, column: String): Option[Any] = {
    // absent index = no watermark (first incremental run starts a full
    // load), matching FileConnection — not a PATH_NOT_FOUND abort
    if (!indexExists(index)) return None
    val row = getAll(index).agg(max(col(column))).head()
    if (row.isNullAt(0)) None else Some(row.get(0))
  }

  /** S10 document sink: update-or-create by key with field-level merge
    * (elasticsearch.js:30-66). The reference's bounded-concurrency
    * per-doc HTTP loop becomes one distributed join + staged rewrite.
    */
  override def insertData(index: String, data: DataFrame, key: String,
      mergeOnDuplicates: Boolean): Unit = {
    val merged =
      if (indexExists(index) && mergeOnDuplicates)
        graft.ops.Upsert.fieldMerge(getAll(index), data, key)
      else if (indexExists(index))
        graft.ops.Upsert.append(getAll(index), data)
      else data
    writeStaged(index, merged)
  }

  override def mergeTables(sourceIndex: String, destIndex: String, key: String,
      fullMerge: Boolean): Unit =
    if (fullMerge) writeStaged(destIndex, getAll(sourceIndex))
    else insertData(destIndex, getAll(sourceIndex), key, mergeOnDuplicates = true)

  override def dump(index: String, path: String, fmt: String): DumpSummary =
    Connections.dumpTo(spark, getAll(index), path, fmt)

  /** JSON index rewrite through the shared versioned-pointer commit
    * ([[graft.sources.VersionedLayout]] — the same object-store-safe
    * protocol as [[graft.sources.ParquetTable.overwrite]]; no
    * directory renames). Timestamps serialize back to ISO-8601 so a
    * re-read re-types them identically.
    */
  private def writeStaged(index: String, df: DataFrame): Unit = {
    val root = pathOf(index)
    val V = graft.sources.VersionedLayout
    val prior = V.currentVersion(fs, root)
    val next = V.freshVersion(fs, root, prior)
    val target = new Path(root, next)
    if (fs.exists(target)) fs.delete(target, true) // crash leftover
    df.write.mode("overwrite")
      // force UTC rendering: under a non-UTC session tz the offset
      // would print as "-04" instead of "Z", failing IsoRe on re-read
      // and silently flipping the column back to string
      .option("timeZone", "UTC")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSX")
      .json(target.toString)
    V.publish(fs, root, next)
    V.gc(fs, root, keep = Set(next) ++ prior)
  }
}
