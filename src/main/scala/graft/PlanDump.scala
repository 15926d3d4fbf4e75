package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named queries to files — the
  * plan-evidence artifacts the optimization rounds commit under
  * `plans/rNN/`. Run:
  *
  *   sbt "runMain graft.PlanDump <sfDir> <outDir> <suffix> [query...]"
  *
  * AQE is disabled (the PlanAudit convention): the static declared
  * topology is the scale-invariant, diffable object; AQE re-sizes at
  * runtime without changing it.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <sfDir> <outDir> <suffix> [query...]")
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names =
      if (args.length > 3) args.drop(3).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .appName("graft-plan-dump").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_PLANDUMP_NOCACHE=1: dump the RAW (uncached, unpinned-
    // where-switchable) topology — session-cached substrates otherwise
    // appear as a bare pinned-RDD read, hiding the build plan the
    // optimization evidence needs
    if (sys.env.get("SPARK_GRAFT_PLANDUMP_NOCACHE").contains("1"))
      spark.conf.set("spark.graft.sessionCache", "off")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (q <- names) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${q}_$suffix.txt"), txt)
      System.err.println(s"plan-dump: $q -> ${q}_$suffix.txt")
    }
    spark.stop()
    sys.exit(0)
  }
}
