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
      shapes: Seq[(String, Shape)] = Nil,
      anchors: (Seq[Double], Seq[Double]) = (Nil, Nil),
      window: Option[WindowCompare] = None): String = {
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
        anchorJson(anchors, 2) + "," + windowJson(window, 2) + "," +
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

  /** Fixed-work CPU-bound calibration anchor: `iters` xorshift64 steps
    * on one thread, returning wall seconds. The WORK never changes, so
    * its time is a pure function of the box's available CPU — a window
    * where the anchor runs 1.4× slow is a window where every query
    * runs ~1.4× slow for reasons that have nothing to do with plans.
    * This is the in-artifact evidence the within-run dispersion check
    * cannot provide: a UNIFORMLY slow window inflates every pass
    * equally (zero dispersion, benign-looking loadavg when the
    * contention is cgroup/IO-level), and only a constant-work
    * reference exposes it (r14: the driver's 200.86 s window vs the
    * same HEAD's clean 134.96 s, n_dispersion = 0).
    */
  def anchorOnce(iters: Long = 400000000L): Double = {
    val t0 = System.nanoTime()
    var x = 0x9E3779B97F4A7C15L
    var acc = 0L
    var n = 0L
    while (n < iters) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      acc += x
      n += 1
    }
    anchorBlackhole = acc // defeat dead-code elimination
    (System.nanoTime() - t0) / 1e9
  }
  @volatile private var anchorBlackhole = 0L

  /** The anchor's multi-threaded form: `threads` concurrent fixed-work
    * loops, wall seconds until ALL join. On an idle box this tracks the
    * single-thread time (each thread owns a core); CPU oversubscription
    * that a one-thread anchor cannot see (other tenants on the box's
    * other cores) stretches it.
    */
  def anchorMtOnce(threads: Int, itersPerThread: Long = 200000000L): Double = {
    val t0 = System.nanoTime()
    val ts = (1 to threads).map { _ =>
      val t = new Thread(() => { anchorOnce(itersPerThread); () })
      t.setDaemon(true); t.start(); t
    }
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  /** The round-over-round window comparison (r14 verdict task 2): the
    * prior artifact's per-query medians vs this run's, on the shared
    * query set. A near-UNIFORM shift with an UNCHANGED plan-shape
    * fingerprint cannot be plan cost — the plans are byte-identical —
    * so it is ambient window contamination; the anchor ratio (fixed
    * work then vs now) corroborates independently of any query.
    */
  final case class WindowCompare(prevSource: String, nShared: Int,
      medianRatio: Double, fracSameDir: Double, fpMatch: Option[Boolean],
      anchorRatio: Option[Double], verdict: String)

  /** Pure verdict over (prev, cur) per-query seconds keyed by the
    * short `qNN` name (the driver's partial "top" maps carry short
    * keys). Queries under 50 ms in the prior round are excluded —
    * their ratios are scheduling noise. Verdicts:
    *
    *  - `ambient_contamination_confirmed_by_anchor` — uniform ≥1.25×
    *    slowdown, fingerprint unchanged, anchor ≥1.15× slower: the box
    *    itself is measurably slower on constant work.
    *  - `uniform_slowdown_suspect_ambient` — uniform ≥1.25× slowdown
    *    with the fingerprint unchanged (no anchor corroboration
    *    available, e.g. the prior artifact predates anchors).
    *  - `slowdown_with_plan_change` — ≥1.25× slowdown but the
    *    fingerprint moved: plans differ, so a real regression is on
    *    the table — diff `shapes_by_query` before blaming the window.
    *  - `uniform_speedup` — the mirror image (a prior CONTAMINATED
    *    round makes this round look faster than it is).
    *  - `clean` — nothing uniform to explain.
    *
    * None when fewer than 10 comparable queries are shared (no basis).
    */
  def windowVerdict(prev: Map[String, Double], cur: Map[String, Double],
      prevFp: Option[String], curFp: Option[String],
      prevAnchor: Option[Double], curAnchor: Option[Double],
      prevSource: String): Option[WindowCompare] = {
    val shared = prev.keySet.intersect(cur.keySet).toSeq
      .filter(n => prev(n) >= 0.05)
    if (shared.size < 10) return None
    val ratios = shared.map(n => cur(n) / math.max(prev(n), 1e-9)).sorted
    val med =
      if (ratios.size % 2 == 1) ratios(ratios.size / 2)
      else (ratios(ratios.size / 2 - 1) + ratios(ratios.size / 2)) / 2.0
    val up = ratios.count(_ > 1.0)
    val fracSameDir = math.max(up, ratios.size - up).toDouble / ratios.size
    val fpMatch = for { a <- prevFp; b <- curFp } yield a == b
    val anchorRatio =
      for { a <- prevAnchor; b <- curAnchor } yield b / math.max(a, 1e-9)
    val verdict =
      if (med >= 1.25 && fracSameDir >= 0.8) {
        if (fpMatch.contains(false)) "slowdown_with_plan_change"
        else if (anchorRatio.exists(_ >= 1.15))
          "ambient_contamination_confirmed_by_anchor"
        else "uniform_slowdown_suspect_ambient"
      } else if (med <= 0.8 && fracSameDir >= 0.8) "uniform_speedup"
      else "clean"
    Some(WindowCompare(prevSource, shared.size, med, fracSameDir, fpMatch,
      anchorRatio, verdict))
  }

  /** Scale-factor token ("sf0.1") out of an sf-dir path or an
    * artifact's sf field — the guard that keeps the window comparison
    * from pricing an sf0.001 dev run against an sf0.1 round artifact
    * (every ratio would read as a bogus uniform shift).
    */
  def sfToken(s: String): Option[String] =
    "sf[0-9.]*[0-9]".r.findAllIn(s).toSeq.lastOption

  /** Per-query seconds + shape fingerprint + anchor median out of a
    * prior round's bench artifact — either the builder's full render
    * (top-level `queries`) or the driver's wrapper (`parsed.queries`,
    * or the partial `parsed.top` when the stdout line degraded).
    * Query keys canonicalize to the short `qNN` form. Tolerant by
    * contract: any malformed/missing piece degrades to None/empty —
    * an unreadable prior artifact must never fail the bench.
    */
  def loadPrevArtifact(path: String): (Map[String, Double], Option[String], Option[Double]) =
    scala.util.Try {
      val root = graft.util.Json
        .parse(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
        .asInstanceOf[Map[String, Any]]
      val doc = root.get("parsed") match {
        case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
        case _                  => root
      }
      def numMap(key: String): Option[Map[String, Double]] =
        doc.get(key).collect { case m: Map[_, _] =>
          m.asInstanceOf[Map[String, Any]]
            .collect { case (k, v: Double) => k.takeWhile(_ != '_') -> v }
        }.filter(_.nonEmpty)
      val qs = numMap("queries").orElse(numMap("top")).getOrElse(Map.empty)
      val fp = doc.get("shapes")
        .collect { case m: Map[_, _] =>
          m.asInstanceOf[Map[String, Any]].get("fp") }
        .flatten.collect { case s: String => s }
      val anchor = doc.get("anchor")
        .collect { case m: Map[_, _] =>
          m.asInstanceOf[Map[String, Any]].get("st") }
        .flatten
        .collect { case v: Vector[_] =>
          val xs = v.collect { case d: Double => d }.sorted
          if (xs.isEmpty) None
          else if (xs.size % 2 == 1) Some(xs(xs.size / 2))
          else Some((xs(xs.size / 2 - 1) + xs(xs.size / 2)) / 2.0)
        }.flatten
      (qs, fp, anchor)
    }.getOrElse((Map.empty, None, None))

  /** The prior artifact's scale-factor token (both artifact forms:
    * the render's `"sf":"<dir>"` string, the driver wrapper's
    * `"sf":0.1` number), None when unreadable.
    */
  def prevSf(path: String): Option[String] =
    scala.util.Try {
      val root = graft.util.Json
        .parse(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
        .asInstanceOf[Map[String, Any]]
      val doc = root.get("parsed") match {
        case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
        case _                  => root
      }
      doc.get("sf").orElse(root.get("sf")) match {
        case Some(s: String) => sfToken(s)
        case Some(d: Double) =>
          Some("sf" + (if (d == d.toLong) d.toLong.toString
                       else java.math.BigDecimal.valueOf(d)
                         .stripTrailingZeros.toPlainString))
        case _ => None
      }
    }.toOption.flatten

  /** One query's plan-shape counts ([[PlanAudit.shapeOf]]): shuffle
    * exchanges, broadcasts, scans, codegen spans. Folded into the
    * bench artifact so a shape regression (a new shuffle, a lost
    * broadcast) diffs round-over-round in the JSON itself instead of
    * needing a separate audit run.
    */
  final case class Shape(exch: Int, bc: Int, scan: Int, cg: Int)

  private def roundedAt(v: Double, scale: Int): String =
    BigDecimal(v).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toString

  /** Per-pass calibration anchor timings (st = one thread, mt =
    * concurrent), capped at 8 per list so a many-pass run cannot
    * overflow the bounded stdout window.
    */
  def anchorJson(anchors: (Seq[Double], Seq[Double]), scale: Int): String = {
    def arr(xs: Seq[Double]) =
      xs.take(8).map(roundedAt(_, scale)).mkString("[", ",", "]")
    s""""anchor":{"st":${arr(anchors._1)},"mt":${arr(anchors._2)}}"""
  }

  /** The round-over-round window verdict, null when no prior artifact
    * yielded a comparable query set.
    */
  def windowJson(w: Option[WindowCompare], scale: Int): String = w match {
    case None => """"window":null"""
    case Some(c) =>
      val fp = c.fpMatch.map(_.toString).getOrElse("null")
      val ar = c.anchorRatio.map(roundedAt(_, scale)).getOrElse("null")
      s""""window":{"prev":"${c.prevSource}","n_shared":${c.nShared},""" +
        s""""median_ratio":${roundedAt(c.medianRatio, scale)},""" +
        s""""frac_same_dir":${roundedAt(c.fracSameDir, scale)},""" +
        s""""fp_match":$fp,"anchor_ratio":$ar,"verdict":"${c.verdict}"}"""
  }

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
      shapes: Seq[(String, Shape)] = Nil,
      anchors: (Seq[Double], Seq[Double]) = (Nil, Nil),
      window: Option[WindowCompare] = None): String = {
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
      anchorJson(anchors, 3) + "," + windowJson(window, 3) + "," +
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
    // calibration anchors (r14 verdict task 2): fixed CPU-bound work
    // timed before each pass — constant work is the only reference a
    // UNIFORMLY slow window cannot hide from. One warm-up for JIT.
    anchorOnce(40000000L)
    val anchorThreads = math.min(
      scala.util.Try(cpus.toInt).getOrElse(4), 16)
    val anchorsSt = scala.collection.mutable.ArrayBuffer.empty[Double]
    val anchorsMt = scala.collection.mutable.ArrayBuffer.empty[Double]
    val tPasses = System.nanoTime()
    val passes = (1 to runs).flatMap { p =>
      if (p > 1 && (System.nanoTime() - tPasses) / 1e9 > budgetSec) {
        System.err.println(s"bench: skipping pass $p — elapsed budget ${budgetSec}s spent")
        None
      } else Some {
        // Price session-cached substrates HONESTLY (r17 verdict task
        // 2): the warm-up (and every earlier pass) leaves each
        // SessionCache artifact pinned, so a timed pass would read
        // pinned blocks instead of paying the substrate build the
        // queries actually require. Releasing before each pass makes
        // every pass pay ONE honest build per substrate; the
        // cross-query sharing WITHIN a pass — the real, creditable
        // win — is unchanged. Additions-only: the untimed warm-up
        // still runs for JIT/codegen caches/parquet footers.
        graft.util.SessionCache.releaseAll(spark)
        val aSt = anchorOnce()
        val aMt = anchorMtOnce(anchorThreads)
        anchorsSt += aSt; anchorsMt += aMt
        System.err.println(
          f"bench: pass $p anchors st=$aSt%.3f s mt($anchorThreads)=$aMt%.3f s")
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

    // round-over-round window comparison (r14 verdict task 2): default
    // prev = the newest BENCH_r*.json in the working directory (the
    // driver's own artifact trail), so the driver's runs self-diagnose
    // with zero configuration; SPARK_GRAFT_BENCH_PREV overrides the
    // path, "off" disables. A missing/unreadable artifact degrades to
    // window:null — never an error.
    val prevPath: Option[String] = sys.env.get("SPARK_GRAFT_BENCH_PREV") match {
      case Some("off") => None
      case Some(p)     => Some(p)
      case None =>
        val re = "BENCH_r(\\d+)\\.json".r
        scala.util.Try(new java.io.File(".").listFiles.toSeq).getOrElse(Nil)
          .flatMap(f => f.getName match {
            case re(n) => Some((n.toInt, f.getPath))
            case _     => None
          }).sortBy(-_._1).headOption.map(_._2)
    }
    def medOf(xs: Seq[Double]): Option[Double] = {
      val s = xs.sorted
      if (s.isEmpty) None
      else if (s.size % 2 == 1) Some(s(s.size / 2))
      else Some((s(s.size / 2 - 1) + s(s.size / 2)) / 2.0)
    }
    val curShort = results
      .map { case (n, v) => n.takeWhile(_ != '_') -> v }.toMap
    val curFp = if (shapes.isEmpty) None else Some(shapeFp(shapes))
    val window = prevPath.flatMap { p =>
      val (prevSfTok, curSfTok) = (prevSf(p), sfToken(sfDir))
      if (prevSfTok.isDefined && curSfTok.isDefined && prevSfTok != curSfTok) {
        System.err.println(s"bench: window comparison skipped — prev " +
          s"artifact $p is ${prevSfTok.get}, this run is ${curSfTok.get}")
        None
      } else {
        val (prevQs, prevFp, prevAnchor) = loadPrevArtifact(p)
        windowVerdict(prevQs, curShort, prevFp, curFp, prevAnchor,
          medOf(anchorsSt.toSeq), new java.io.File(p).getName)
      }
    }
    window.filter(_.verdict != "clean").foreach { w =>
      System.err.println(f"bench: WINDOW ${w.verdict} vs ${w.prevSource}: " +
        f"median per-query ratio ${w.medianRatio}%.2f over ${w.nShared} " +
        f"shared queries (${w.fracSameDir * 100}%.0f%% one direction), " +
        s"fp_match=${w.fpMatch.getOrElse("n/a")}, " +
        s"anchor_ratio=${w.anchorRatio.map(r => f"$r%.2f").getOrElse("n/a")}")
    }
    val anchors = (anchorsSt.toSeq, anchorsMt.toSeq)
    // report the pass count that actually ran (budget may skip some)
    val ranPasses = passes.size
    val line = renderLine(results, errNames, sfDir, ranPasses, loadavgs,
      dispersion, shapes, anchors, window)
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
        renderFull(results, errNames, sfDir, ranPasses, loadavgs,
          dispersion, shapes, anchors, window) + "\n")
    }
    spark.stop() // stop BEFORE printing so no stray log line follows the JSON
    println(line)
    // run is forked (build.sbt): hard-exit so a lingering non-daemon
    // thread can never hang the bench after the JSON is out
    sys.exit(0)
  }
}
