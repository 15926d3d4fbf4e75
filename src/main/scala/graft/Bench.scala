package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, one JSON result line on stdout.
  *
  * Methodology:
  *  - a full untimed warm-up pass first (JIT, codegen cache, parquet
  *    footers, broadcast build) so the first timed query is not
  *    charged the session cold-start;
  *  - the timed sink is the `noop` write format — it executes the
  *    whole plan and materializes every output column (a `count()`
  *    would let Catalyst prune all projection work);
  *  - queries run in sorted name order so per-query trends are
  *    comparable across rounds.
  *
  * The JSON line is printed bare on stdout (build.sbt routes forked
  * output through StdoutOutput so sbt adds no [info] prefix) and also
  * written to SPARK_GRAFT_BENCH_OUT if set, so the driver can parse it
  * either way.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Dev loop only: SPARK_GRAFT_BENCH_ONLY=q127_triangles,q19_... to
    // time a subset. The driver never sets it, so the contract line
    // always covers the full suite.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()

    names.foreach { n => try run(n) catch { case _: Throwable => () } } // warm-up
    // SPARK_GRAFT_BENCH_RUNS > 1: repeat the timed pass in the same
    // JVM and log every pass to stderr — separates plan-cost drift
    // from local[n] scheduling noise (SCALE.md "bench noise floor").
    // The reported JSON (stdout contract: ONE line) is the last pass.
    val runs = scala.util.Try(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "1").toInt).getOrElse(1).max(1)
    val passes = (1 to runs).map { p =>
      val r = names.map { name =>
        val t0 = System.nanoTime()
        try run(name) catch { case _: Throwable => () }
        name -> (System.nanoTime() - t0) / 1e9
      }
      if (runs > 1)
        System.err.println(s"pass $p: " + r.map { case (k, v) =>
          f"$k=$v%.3f" }.mkString(" "))
      r
    }
    val results = passes.last

    // Times are rounded to milliseconds, locale-independently. This is
    // a SIZE contract, not cosmetics: the driver parses the JSON out
    // of a bounded tail-capture of stdout, and at 67 queries the
    // full-precision doubles pushed the one-line JSON past that window
    // (round 4 recorded `parsed: null` with the line's head cut off).
    // ~1 ms of false precision is far below the local[n] noise floor.
    def rounded(v: Double, scale: Int): String =
      BigDecimal(v).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toString
    val total = results.map(_._2).sum
    // n_queries/mean_query_sec contextualize the total across rounds:
    // the suite grew from 16 queries (r1) to 69+, so totals are not
    // comparable round-over-round but per-query means are.
    def render(scale: Int, shortKeys: Boolean): String = {
      val qs = results.map { case (k, v) =>
        val key = if (shortKeys) k.takeWhile(_ != '_') else k
        "\"" + key + "\":" + rounded(v, scale)
      }.mkString("{", ",", "}")
      s"""{"metric":"total","value":${rounded(total, 3)},"unit":"sec","n_queries":${results.size},""" +
        s""""mean_query_sec":${rounded(total / results.size, 3)},"queries":$qs,"sf":"$sfDir"}"""
    }
    // The whole line must fit the driver's bounded stdout tail-capture
    // (2000 chars observed in round 4, where the full-precision line
    // overflowed it and recorded `parsed: null`; nothing prints after
    // this line, so the budget is the full window minus the newline).
    // Degrade precision, then key length, until it fits: full names at
    // 1 ms → full names at 10 ms → `qNN` keys at 1 ms. Full names are
    // worth 10 ms of false precision — they keep per-query trends
    // directly comparable across rounds.
    val line = Seq(render(3, false), render(2, false), render(3, true))
      .find(_.length <= 1980).getOrElse(render(2, true))
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), line + "\n")
    }
    spark.stop() // stop BEFORE printing so no stray log line follows the JSON
    println(line)
    // run is forked (build.sbt): hard-exit so a lingering non-daemon
    // thread can never hang the bench after the JSON is out
    sys.exit(0)
  }
}
