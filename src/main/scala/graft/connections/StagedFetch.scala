package graft.connections

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** S14 FTP fetch/list + S5 row-cursor facades.
  *
  * The reference's FTP connection (/root/reference/lib/connections/
  * ftp.js:25-71) downloads remote files to the driver and walks
  * directories recursively (serially — its CWD pointer forces it).
  * Spark-native shape: Hadoop FileSystem handles any configured URI
  * scheme (ftp://, s3a://, hdfs://, file://); `fetch` stages a remote
  * file locally for non-splittable processing, `listFiles` is the
  * recursive walk, and staged files are read back with `spark.read`.
  * At cluster scale, prefer reading the remote URI directly —
  * staging is for protocol endpoints Spark cannot split (FTP).
  */
object StagedFetch {

  /** Recursive file listing (ftp.js listFiles contract: files only,
    * directories descended).
    */
  def listFiles(spark: SparkSession, uri: String): Seq[String] = {
    val p = new Path(uri)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Nil
    val it = fs.listFiles(p, true)
    val out = Seq.newBuilder[String]
    while (it.hasNext) out += it.next().getPath.toString
    out.result()
  }

  /** Download one remote file into `stagingDir` (ftp.js `get`);
    * returns the staged path for `spark.read`.
    */
  def fetch(spark: SparkSession, srcUri: String, stagingDir: String): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new Path(srcUri)
    val dst = new Path(stagingDir, src.getName)
    val srcFs = src.getFileSystem(conf)
    val dstFs = dst.getFileSystem(conf)
    dstFs.mkdirs(new Path(stagingDir))
    FileUtil.copy(srcFs, src, dstFs, dst, false, true, conf)
    dst.toString
  }

  /** S5 row-cursor stream (`queryStream`, mysql.js:225-230): a
    * consumer-paced row-at-a-time iterator. Spark streams one
    * partition at a time to the driver — memory is bounded by one
    * partition, and backpressure is the iterator pull. Rarely the
    * right tool (operators should stay distributed); provided for
    * contract parity.
    */
  def rowCursor(df: DataFrame): Iterator[Row] = {
    val it = df.toLocalIterator()
    new Iterator[Row] {
      def hasNext: Boolean = it.hasNext
      def next(): Row = it.next()
    }
  }
}
