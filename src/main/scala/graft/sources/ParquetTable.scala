package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named, mutable, parquet-backed table — the engine's analogue of
  * the reference's endpoint tables (SURVEY.md §1.1 "Table").
  *
  * Mutation is copy-on-write with a staged-directory swap: write the
  * new contents to `<path>__staging`, then rename over the live path.
  * The reference gets atomicity from endpoint transactions
  * (`mysql.js:124-156`, `redshift.js:397-424`); with bare parquet we
  * stage+swap and inherit the reference's single-writer model (its pid
  * lock, `lib/book.js:84-101` — see [[graft.engine.PidLock]]).
  *
  * Scale note: rename is a metadata operation on HDFS-like filesystems;
  * on object stores a committer-based copy applies, but the protocol —
  * never mutate the live prefix in place — is the same.
  */
final case class ParquetTable(spark: SparkSession, path: String) {
  private val hconf = spark.sparkContext.hadoopConfiguration
  private def fs = new Path(path).getFileSystem(hconf)

  def exists: Boolean = fs.exists(new Path(path))
  def read: DataFrame = spark.read.parquet(path)

  /** Atomic full replace (reference fullMerge drop/recreate/copy,
    * `mysql.js:567-570`). `partitionBy`/`sortBy` emulate the Redshift
    * distkey/sortkey physical-layout policy (`redshift.js:340-350`):
    * repartition on the key so co-keyed joins avoid a shuffle, sort
    * within partitions so parquet min/max row-group stats prune scans.
    */
  def overwrite(df: DataFrame, distKey: Option[String] = None,
      sortKey: Option[String] = None): Unit = {
    val laidOut = (distKey, sortKey) match {
      case (Some(d), Some(s)) =>
        df.repartition(org.apache.spark.sql.functions.col(d))
          .sortWithinPartitions(org.apache.spark.sql.functions.col(s))
      case (Some(d), None) => df.repartition(org.apache.spark.sql.functions.col(d))
      case (None, Some(s)) => df.sortWithinPartitions(org.apache.spark.sql.functions.col(s))
      case _ => df
    }
    val staging = new Path(path + "__staging")
    val live = new Path(path)
    if (fs.exists(staging)) fs.delete(staging, true)
    laidOut.write.mode("overwrite").parquet(staging.toString)
    val old = new Path(path + "__old")
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(live)) fs.rename(live, old)
    fs.rename(staging, live)
    if (fs.exists(old)) fs.delete(old, true)
  }

  /** Plain append (reference `mergeOnDuplicates=false` insert path,
    * `mysql.js:369-377`). Not staged — parquet append is file-additive
    * and each task commits atomically.
    */
  def append(df: DataFrame): Unit =
    df.write.mode("append").parquet(path)

  def drop(): Unit = { val p = new Path(path); if (fs.exists(p)) fs.delete(p, true) }
}
