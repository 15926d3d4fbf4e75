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

  /** Shape counts of a query's executed plan —
    * (shuffles, broadcasts, scans, codegen spans): the numbers this
    * audit prints and [[Bench]] folds into its JSON artifact so shape
    * regressions diff round-over-round. Reads the plan only; never
    * executes the frame.
    */
  def shapeOf(df: org.apache.spark.sql.DataFrame): (Int, Int, Int, Int) = {
    val plan = df.queryExecution.executedPlan.toString
    def n(p: String) = p.r.findAllIn(plan).length
    val bc = n("BroadcastExchange")
    val cg = "codegen id : (\\d+)".r.findAllMatchIn(
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      .map(_.group(1)).toSet.size
    (n("Exchange") - bc, bc, n("Scan parquet|FileScan"), cg)
  }

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
      val (sh, bc, scans, cg) = shapeOf(df)
      val sorts = "\\bSort \\[".r
        .findAllIn(df.queryExecution.executedPlan.toString).length
      println(f"$q%-24s shuffles=$sh broadcasts=$bc " +
        f"scans=$scans codegen=$cg sorts=$sorts")
    }
    spark.stop()
  }
}
