package graft

import org.apache.spark.sql.SparkSession

/** Plan-shape audit: per query, count shuffle exchanges, broadcasts,
  * scans, and WholeStageCodegen spans in the executed plan (the
  * numbers SCALE.md cites). Run:
  *
  *   sbt "runMain graft.PlanAudit [sfDir] [queryName...]"
  *
  * Shapes are scale-invariant, so auditing at sf0.001 tells the truth
  * about the 100 TB plan (AQE re-sizes, it does not re-shape the
  * declared topology).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // audit the STATIC plan: AQE wraps executed stages in opaque
      // QueryStage nodes (hiding codegen annotations) and re-sizes at
      // runtime without changing the declared topology being audited
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .appName("graft-plan-audit").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    for (q <- names) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      df.write.mode("overwrite").format("noop").save() // finalize AQE
      // node counts from the simple final plan (each node once);
      // codegen span ids from the formatted detail blocks
      val plan = df.queryExecution.executedPlan.toString
      def n(p: String) = p.r.findAllIn(plan).length
      val bc = n("BroadcastExchange")
      val codegenSpans = "codegen id : (\\d+)".r.findAllMatchIn(
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        .map(_.group(1)).toSet.size
      println(f"$q%-24s shuffles=${n("Exchange") - bc} broadcasts=$bc " +
        f"scans=${n("Scan parquet|FileScan")} codegen=$codegenSpans " +
        f"sorts=${n("\\bSort \\[")}")
    }
    spark.stop()
  }
}
