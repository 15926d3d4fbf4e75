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
  *    comparable across rounds;
  *  - a failing query must NOT masquerade as a fast one: round 6
  *    recorded eight 0.06 s "timings" that were silently-thrown
  *    exceptions (events-table queries), understating the total by
  *    ~7 s with no visible signal. Failures are collected and surface
  *    in the JSON line as `"n_errs":N,"errs":[names]` (empty = all
  *    ran) plus a full stderr line per failure.
  *
  * The JSON line is printed bare on stdout (build.sbt routes forked
  * output through StdoutOutput so sbt adds no [info] prefix) and also
  * written to SPARK_GRAFT_BENCH_OUT if set, so the driver can parse it
  * either way.
  */
object Bench {

  /** Render the ONE-line stdout contract. The whole line must fit the
    * driver's bounded stdout tail-capture (~2000 chars, keeping the
    * END of stdout: round 4 lost the line to full-precision doubles,
    * round 7 lost the HEAD — total, mean, and the sort-order-first
    * keys — when 181 full-name entries pushed the map past the window;
    * both recorded `parsed: null`). Degrade precision, then key
    * length, then drop to the slowest-queries-that-fit form: full
    * names at 1 ms → full names at 10 ms → `qNN` keys at 1 ms → `qNN`
    * keys at 10 ms → headline + top-K slowest ("top", marking the map
    * as partial; n_queries still carries the true suite size; K = 0
    * degrades to a pure summary of a few hundred chars). The headline
    * total/mean/errs lead every form, and [[renderFull]] goes to
    * SPARK_GRAFT_BENCH_OUT, so no rung can lose the round's headline
    * again. Guaranteed: result.length <= 1980.
    */
  def renderLine(results: Seq[(String, Double)], errNames: Seq[String],
      sfDir: String, runs: Int = 1,
      loadavgs: Seq[String] = Nil,
      dispersion: Seq[Dispersion] = Nil,
      shapes: Seq[(String, Shape)] = Nil): String = {
    // Times are rounded to milliseconds, locale-independently — a SIZE
    // contract, not cosmetics (~1 ms of false precision is far below
    // the local[n] noise floor).
    def rounded(v: Double, scale: Int): String =
      BigDecimal(v).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toString
    val total = results.map(_._2).sum
    val mean = if (results.isEmpty) 0.0 else total / results.size
    // errs is capped at 12 names so a catastrophic many-failure run
    // cannot itself overflow the window; n_errs always carries the
    // true count (stderr has the full list + exception messages).
    val errsJson = errNames.take(12).map("\"" + _ + "\"").mkString("[", ",", "]")
    // contamination evidence rides IN the artifact (r12 gap: the
    // DISPERSION/loadavg stderr lines could scroll out of the driver's
    // bounded capture): per-pass 1/5/15 loadavg, and the dispersion
    // verdicts compactly (short names, med/best only — raw passes stay
    // in renderFull and stderr). Both capped so a pathological run
    // cannot overflow the window; n_dispersion carries the true count.
    val loadJson = loadavgs.take(8).map("\"" + _ + "\"").mkString("[", ",", "]")
    val dispJson = dispersion.take(8).map { d =>
      s"""{"q":"${d.name.takeWhile(_ != '_')}","med":${rounded(d.median, 2)},""" +
        s""""best":${rounded(d.best, 2)}}"""
    }.mkString("[", ",", "]")
    val head =
      s"""{"metric":"total","value":${rounded(total, 3)},"unit":"sec","n_queries":${results.size},""" +
        s""""mean_query_sec":${rounded(mean, 3)},"runs":$runs,"n_errs":${errNames.size},"errs":$errsJson,""" +
        s""""n_dispersion":${dispersion.size},"dispersion":$dispJson,"loadavg":$loadJson,""" +
        shapeSummaryJson(shapes)
    def render(scale: Int, shortKeys: Boolean): String = {
      val qs = results.map { case (k, v) =>
        val key = if (shortKeys) k.takeWhile(_ != '_') else k
        "\"" + key + "\":" + rounded(v, scale)
      }.mkString("{", ",", "}")
      s"""$head,"queries":$qs,"sf":"$sfDir"}"""
    }
    def renderTop(budget: Int): String = {
      val slowest = results.sortBy(-_._2)
      val sb = new StringBuilder
      var taken = 0
      slowest.foreach { case (k, v) =>
        val piece = (if (taken > 0) "," else "") +
          "\"" + k.takeWhile(_ != '_') + "\":" + rounded(v, 2)
        if (sb.length + piece.length <= budget) { sb ++= piece; taken += 1 }
      }
      s"""$head,"top":{$sb},"sf":"$sfDir"}"""
    }
    val fallback = renderTop(1960 - head.length - sfDir.length - 24)
    Seq(render(3, false), render(2, false), render(3, true),
        render(2, true), fallback)
      .find(_.length <= 1980).getOrElse(fallback.take(1980))
  }

  /** One dispersion verdict: a query whose cross-pass MEDIAN is >3×
    * its BEST pass in the same JVM — the plan didn't change between
    * passes, so the spread can only be ambient box load (SCALE.md
    * "bench-window contamination", r11). Carried in the JSON artifact
    * so the evidence cannot scroll out of a bounded stderr capture.
    */
  final case class Dispersion(name: String, median: Double, best: Double,
      raws: Seq[Double])

  /** One query's plan-shape counts ([[PlanAudit.shapeOf]]): shuffle
    * exchanges, broadcasts, scans, codegen spans. Folded into the
    * bench artifact so a shape regression (a new shuffle, a lost
    * broadcast) diffs round-over-round in the JSON itself instead of
    * needing a separate audit run.
    */
  final case class Shape(exch: Int, bc: Int, scan: Int, cg: Int)

  /** Totals + fingerprint of the per-query shape map for the bounded
    * stdout line (a 217-entry map cannot fit the ~2000-char window):
    * the totals catch aggregate drift, and the 8-hex fingerprint —
    * md5 over the sorted canonical per-query encoding — flips on ANY
    * per-query change, so a regression that nets out in the totals
    * (one query +1 shuffle, another −1) is still visible. The full
    * per-query map rides in [[renderFull]]'s file artifact.
    */
  def shapeSummaryJson(shapes: Seq[(String, Shape)]): String =
    if (shapes.isEmpty) """"shapes":{}"""
    else {
      val e = shapes.map(_._2.exch).sum
      val b = shapes.map(_._2.bc).sum
      val s = shapes.map(_._2.scan).sum
      val c = shapes.map(_._2.cg).sum
      s""""shapes":{"exch":$e,"bc":$b,"scan":$s,"cg":$c,"fp":"${shapeFp(shapes)}"}"""
    }

  /** 8-hex md5 of the sorted canonical per-query shape encoding. */
  def shapeFp(shapes: Seq[(String, Shape)]): String = {
    val canonical = shapes.sortBy(_._1).map { case (n, sp) =>
      s"$n=${sp.exch}.${sp.bc}.${sp.scan}.${sp.cg}"
    }.mkString("\n")
    java.security.MessageDigest.getInstance("MD5")
      .digest(canonical.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
  }

  /** Full-precision full-name form for SPARK_GRAFT_BENCH_OUT — no size
    * budget applies to a file. */
  def renderFull(results: Seq[(String, Double)], errNames: Seq[String],
      sfDir: String, runs: Int = 1,
      loadavgs: Seq[String] = Nil,
      dispersion: Seq[Dispersion] = Nil,
      shapes: Seq[(String, Shape)] = Nil): String = {
    def r3(v: Double): String =
      BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val total = results.map(_._2).sum
    val mean = if (results.isEmpty) 0.0 else total / results.size
    val errsJson = errNames.map("\"" + _ + "\"").mkString("[", ",", "]")
    val loadJson = loadavgs.map("\"" + _ + "\"").mkString("[", ",", "]")
    val dispJson = dispersion.map { d =>
      s"""{"q":"${d.name}","med":${r3(d.median)},"best":${r3(d.best)},""" +
        s""""raws":${d.raws.map(r3).mkString("[", ",", "]")}}"""
    }.mkString("[", ",", "]")
    val qs = results.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    // the FULL per-query shape map (the file artifact has no size
    // budget) plus the same totals/fingerprint the stdout line carries
    val shapesJson = shapes.map { case (n, sp) =>
      s""""$n":{"exch":${sp.exch},"bc":${sp.bc},"scan":${sp.scan},"cg":${sp.cg}}"""
    }.mkString("{", ",", "}")
    s"""{"metric":"total","value":${r3(total)},"unit":"sec","n_queries":${results.size},""" +
      s""""mean_query_sec":${r3(mean)},"runs":$runs,"n_errs":${errNames.size},"errs":$errsJson,""" +
      s""""n_dispersion":${dispersion.size},"dispersion":$dispJson,"loadavg":$loadJson,""" +
      shapeSummaryJson(shapes) + s""","shapes_by_query":$shapesJson,""" +
      s""""queries":$qs,"sf":"$sfDir"}"""
  }

  /** Per-query MEDIAN across passes (even count: mean of the middle
    * two). The median, not the last pass, is the reported figure —
    * single local[n] passes carry ±0.5 s scheduling noise that has
    * repeatedly mis-flagged plan regressions (SCALE.md "bench noise
    * floor"); the per-pass raw timings still go to stderr.
    */
  def medians(passes: Seq[Seq[(String, Double)]]): Seq[(String, Double)] = {
    val byName = passes.flatten.groupBy(_._1).view.mapValues(_.map(_._2).sorted)
    passes.head.map { case (name, _) =>
      val v = byName(name)
      val m =
        if (v.size % 2 == 1) v(v.size / 2)
        else (v(v.size / 2 - 1) + v(v.size / 2)) / 2.0
      name -> m
    }
  }

  /** 1/5/15-minute box load from /proc/loadavg — logged per pass and
    * on dispersion so a contaminated bench window is visible in the
    * artifact itself (SCALE.md "bench-window contamination", r11).
    */
  private def loadAvg: String =
    scala.util.Try(java.nio.file.Files.readString(
      java.nio.file.Paths.get("/proc/loadavg")).trim).getOrElse("n/a")

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

    // warm-up pass (untimed) — failures are LOGGED, not swallowed: a
    // query failing only here (stale-state interaction, first-touch
    // issue) would otherwise leave no trace, since the timed passes
    // only catch persistent failures
    names.foreach { n =>
      try run(n) catch { case e: Throwable =>
        System.err.println(s"bench: WARM-UP $n FAILED: " +
          s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    // SPARK_GRAFT_BENCH_RUNS: timed passes in the same JVM, every pass
    // logged to stderr, the JSON reporting per-query MEDIANS — this
    // separates plan-cost drift from local[n] scheduling noise
    // (SCALE.md "bench noise floor"). Default 3: the suite shows rare
    // multi-second one-PASS spikes on random queries in later passes
    // (NOT GC — a logged 24g run shows max 24 ms young pauses; cleaner/
    // scheduling bursts), and a 3-pass median eliminates a single
    // spike entirely where a 2-pass mean-of-middle only halves it.
    // The elapsed budget below bounds the cost.
    val runs = scala.util.Try(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt).getOrElse(3).max(1)
    // elapsed budget (seconds, from after warm-up): extra passes only
    // start while under it, so a pathologically slow suite degrades to
    // fewer passes instead of blowing the driver's bench window — the
    // JSON line must ALWAYS come out. Normal sf0.1 runs (~170 s/pass)
    // sit far under the default.
    val budgetSec = scala.util.Try(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET", "1800").toLong).getOrElse(1800L)
    val tPasses = System.nanoTime()
    val passes = (1 to runs).flatMap { p =>
      if (p > 1 && (System.nanoTime() - tPasses) / 1e9 > budgetSec) {
        System.err.println(s"bench: skipping pass $p — elapsed budget ${budgetSec}s spent")
        None
      } else Some {
        val errs = scala.collection.mutable.ArrayBuffer.empty[String]
        val r = names.map { name =>
          val t0 = System.nanoTime()
          try run(name) catch { case e: Throwable =>
            errs += name
            System.err.println(s"bench: $name FAILED: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
          }
          name -> (System.nanoTime() - t0) / 1e9
        }
        // 1/5/15 load AS OF the pass's end — recorded into the JSON
        // artifact (not just stderr), so a contaminated window carries
        // its own evidence
        val la = loadAvg.split(" ").take(3).mkString(" ")
        if (runs > 1)
          System.err.println(s"pass $p loadavg=[$la]: " + r.map { case (k, v) =>
            f"$k=$v%.3f" }.mkString(" "))
        (r, errs.toSeq, la)
      }
    }
    val results = medians(passes.map(_._1))
    // a query that failed in ANY pass is an error (its timing is junk)
    val errNames = passes.flatMap(_._2).distinct
    val loadavgs = passes.map(_._3)

    // Bench-robustness guard (SCALE.md "bench-window contamination",
    // r11): a median more than 3x the BEST pass of the same query in
    // the same JVM means >=2 passes were inflated by ambient box load
    // — the plan did not change between passes, so the spread can only
    // be environment. r11 reported q40=13.62s for a query whose clean
    // cost is ~1.1s and the round was nearly headlined a regression;
    // this line makes that failure mode self-diagnosing in the
    // artifact's stderr instead of requiring a judge re-measure.
    val rawsByName = passes.flatMap(_._1).groupBy(_._1)
    val dispersion = results.flatMap { case (name, med) =>
      val raws = rawsByName(name).map(_._2)
      val best = raws.min
      if (best > 0.05 && med > 3 * best && med - best > 0.5) {
        System.err.println(
          f"bench: DISPERSION $name median=$med%.3f best=$best%.3f raws=[" +
            raws.map(v => f"$v%.3f").mkString(",") +
            "] — median is likely box-load contamination, not plan " +
            "cost; trust the best pass and cross-check the per-pass " +
            "loadavg lines above (load DURING each pass, not now)")
        Some(Dispersion(name, med, best, raws))
      } else None
    }

    // plan-shape audit (r13 task 6): per-query {exchanges, broadcasts,
    // scans, codegen spans} into the artifact so shape regressions
    // diff round-over-round. Computed AFTER the timed passes (planning
    // only, nothing executes) on a sibling session with AQE off — the
    // static declared topology is what's scale-invariant and diffable;
    // AQE wraps executed stages in opaque nodes that hide codegen ids.
    val auditSession = spark.newSession()
    auditSession.conf.set("spark.sql.adaptive.enabled", "false")
    val shapes = names.flatMap { n =>
      try {
        val (e, b, s, c) =
          PlanAudit.shapeOf(SparkEntry.queries(n)(auditSession, sfDir))
        Some(n -> Shape(e, b, s, c))
      } catch { case ex: Throwable =>
        System.err.println(s"bench: shape audit $n FAILED: " +
          s"${ex.getClass.getSimpleName}")
        None
      }
    }

    // report the pass count that actually ran (budget may skip some)
    val ranPasses = passes.size
    val line = renderLine(results, errNames, sfDir, ranPasses, loadavgs,
      dispersion, shapes)
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
        renderFull(results, errNames, sfDir, ranPasses, loadavgs,
          dispersion, shapes) + "\n")
    }
    spark.stop() // stop BEFORE printing so no stray log line follows the JSON
    println(line)
    // run is forked (build.sbt): hard-exit so a lingering non-daemon
    // thread can never hang the bench after the JSON is out
    sys.exit(0)
  }
}
