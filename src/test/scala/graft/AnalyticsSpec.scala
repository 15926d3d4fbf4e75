package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CappedCollect
import graft.ops.{FuzzyJoin, Sessionize}

/** Semantics tests for the [EXT] analytics operators (the DuckDB
  * oracle checks the SQL-expressible ones at sf0.01 via AnalyticsPack;
  * here we pin behavioral contracts and the sketch error bounds that
  * have no oracle).
  */
class AnalyticsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("Privacy: buckets partition the table, riskyCombos flags exactly the <k groups") {
    import graft.ops.Privacy
    val df = Seq(
      ("US", "A"), ("US", "A"), ("US", "A"), // anonymous at k=3
      ("US", "B"), ("US", "B"),              // small
      ("DE", "A")                            // unique
    ).toDF("country", "seg")
    val rep = Privacy.kAnonymityReport(df, k = 3).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rep === Map("anonymous" -> ((1L, 3L)), "small" -> ((1L, 2L)),
      "unique" -> ((1L, 1L))))
    assert(rep.values.map(_._2).sum === df.count())
    val risky = Privacy.riskyCombos(df, k = 3).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(risky === Set(("US", "B", 2L), ("DE", "A", 1L)))
  }

  test("BloomJoin self-join (shared lineage) stays a keyed equi-join") {
    import graft.ops.BloomJoin
    val df = Seq((1L, "a"), (2L, "b"), (2L, "b2"), (3L, "c")).toDF("k", "v")
    // fact and dim are the SAME frame: unqualified key refs would
    // resolve ambiguously (or fold to always-true → cartesian)
    val got = BloomJoin.innerWithBloom(df, df, "k", "k", 100L).count()
    val plain = df.as("x").join(df.as("y"), col("x.k") === col("y.k")).count()
    assert(got === plain)
  }

  test("BloomJoin prefilter keeps all matches, result equals plain join") {
    import graft.ops.BloomJoin
    val fact = (1L to 2000L).map(i => (i, s"f$i")).toDF("fk", "fv")
    val dim = Seq(5L, 10L, 1999L, 7777L).map(k => (k, s"d$k")).toDF("dk", "dv")
    val plain = fact.join(dim, col("fk") === col("dk"))
      .select("fk", "fv", "dv").collect().map(_.toSeq).toSet
    val bloomed = BloomJoin.innerWithBloom(fact, dim, "fk", "dk", 100L)
      .select("fk", "fv", "dv").collect().map(_.toSeq).toSet
    assert(bloomed === plain)
    // the prefilter itself must be selective (few false positives) and
    // must never drop a true match
    val kept = BloomJoin.prefilter(fact, dim, "fk", "dk", 100L).collect()
    val keptKeys = kept.map(_.getLong(0)).toSet
    assert(Set(5L, 10L, 1999L).subsetOf(keptKeys))
    assert(kept.length < 200, s"bloom should cut ~90%+, kept ${kept.length}")
    // empty build side → no rows survive the prefilter
    assert(BloomJoin.prefilter(fact, dim.filter(col("dk") < 0), "fk", "dk", 100L)
      .count() === 0L)
  }

  test("Scd2 compresses runs and chains validity intervals") {
    import graft.ops.Scd2
    val d = Seq(
      (1L, 100L, 1L, "free"), (1L, 200L, 2L, "free"), // run compresses
      (1L, 300L, 3L, "pro"), (1L, 400L, 4L, "free"),  // re-entry reopens
      (2L, 150L, 5L, "pro"))
      .toDF("uid", "us", "eid", "plan")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = Scd2.fromChanges(d, "uid", "ts", Seq("plan"), "eid")
      .select(col("uid"), col("plan"), unix_micros(col("effective_from")).as("f"),
        unix_micros(col("effective_to")).as("t"), col("is_current"))
      .orderBy("uid", "f").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
    assert(out.toSeq === Seq(
      (1L, "free", 100L, 300L, false),
      (1L, "pro", 300L, 400L, false),
      (1L, "free", 400L, -1L, true),
      (2L, "pro", 150L, -1L, true)))
  }

  // ---- sessionization -----------------------------------------------

  private def ev(rows: (Long, Long, Long)*) = // (user, ts_us, event_id)
    rows.toDF("user_id", "us", "event_id")
      .withColumn("ts", timestamp_micros(col("us")))

  test("Sessionize.assignSessions splits on gaps strictly above the max") {
    val gap = 60L * 1000000L
    val d = ev(
      (1L, 0L, 1L), (1L, gap, 2L),          // exactly the gap: same session
      (1L, 2 * gap + 1, 3L),                // gap+1 past previous: new session
      (2L, 0L, 4L))
    val out = Sessionize.assignSessions(d, "user_id", "ts", "event_id", gap)
      .select("event_id", "session_seq").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("Sessionize.profile aggregates per-key session stats") {
    val gap = 10L * 1000000L
    val d = ev(
      (1L, 0L, 1L), (1L, 5000000L, 2L),     // session 1: 2 events, 5s
      (1L, 100000000L, 3L),                 // session 2: 1 event
      (2L, 0L, 4L))
    val out = Sessionize.profile(d, "user_id", "ts", "event_id", gap)
      .orderBy("user_id").collect()
    assert(out(0).getAs[Long]("n_sessions") === 2L)
    assert(out(0).getAs[Long]("n_events") === 3L)
    assert(out(0).getAs[Long]("max_session_events") === 2L)
    assert(out(0).getAs[Long]("max_session_dur_us") === 5000000L)
    assert(out(1).getAs[Long]("n_sessions") === 1L)
  }

  // ---- blocked fuzzy join -------------------------------------------

  test("FuzzyJoin.blockedLevenshtein compares within blocks only") {
    val d = Seq(
      (1L, "A", "kitten"), (2L, "A", "sitten"), (3L, "A", "zzzzzzzzzz"),
      (4L, "B", "kitten")) // same text as id 1 but another block
      .toDF("id", "blk", "name")
    val out = FuzzyJoin.blockedLevenshtein(d, "id", "name", Seq("blk"), maxDist = 3)
      .select("id_a", "id_b", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // only (1,2) qualifies: same block, distance 1; id 3 is too far,
    // id 4 is in another block despite identical text
    assert(out.toSeq === Seq((1L, 2L, 1)))
  }

  // ---- edit-distance prefilter rule ----------------------------------

  test("EditDistancePrefilter plants the length bound and keeps results") {
    GraftExtensions.register(spark)
    val d = Seq((1L, "kitten"), (2L, "sitten"), (3L, "abcdefghijklmno"))
      .toDF("id", "s")
    d.createOrReplaceTempView("edp_t")
    val q = "SELECT a.id AS ia, b.id AS ib FROM edp_t a JOIN edp_t b " +
      "ON a.id < b.id WHERE levenshtein(a.s, b.s) <= 2"
    val df = spark.sql(q)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("abs(") && optimized.contains("length("),
      s"length bound missing from optimized plan:\n$optimized")
    // semantics preserved: only (kitten, sitten) is within distance 2
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 2L)))
    // idempotent under re-optimization (rule must reach a fixpoint)
    assert("abs\\(".r.findAllIn(
      spark.sql(q).queryExecution.optimizedPlan.toString).length === 1)
  }

  // ---- salted join ---------------------------------------------------

  test("saltedJoin matches the plain join on skewed data") {
    // 90% of fact rows share one hot key
    val fact = (1 to 200).map(i => (if (i <= 180) 1L else i.toLong, i))
      .toDF("k", "payload")
    val dim = Seq((1L, "hot"), (190L, "cold")).toDF("dk", "name")
    val salted = graft.ops.Skew.saltedJoin(fact, dim, "k", "dk", salt = 4)
      .select("k", "payload", "name").collect().map(_.toSeq).sorted(
        Ordering.by((s: Seq[Any]) => s.mkString("|")))
    val plain = fact.join(dim, col("k") === col("dk"))
      .select("k", "payload", "name").collect().map(_.toSeq).sorted(
        Ordering.by((s: Seq[Any]) => s.mkString("|")))
    assert(salted.toSeq === plain.toSeq)
    assert(salted.length === 181)
  }

  // ---- capped collect ------------------------------------------------

  test("CappedCollect matches collect_list-then-filter semantics") {
    val d = (1 to 100).map(i => (i % 7, i.toLong)).toDF("k", "v")
    val cap = 10
    val capped = d.groupBy(col("k"))
      .agg(CappedCollect.cappedLongList(col("v"), cap).as("cl"))
      .filter(col("cl.n").between(2, cap))
    val reference = d.groupBy(col("k"))
      .agg(sort_array(collect_list(col("v"))).as("ids"))
      .filter(size(col("ids")).between(2, cap))
    // every group here is under the cap, so contents must be complete
    val a = capped.select(col("k"), sort_array(col("cl.ids")).as("ids"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val b = reference.collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(a === b)
  }

  test("Graph.pagerank matches a sequential integer reimplementation") {
    // directed: a<->b, a->c, c->a plus a sink edge b->d (d dangling)
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (2L, 4L))
    def ref(iters: Int): Map[Long, Long] = {
      val scale = 1000000000000L
      val out = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      var r = nodes.map(_ -> scale).toMap
      for (_ <- 1 to iters) {
        val inc = edges.groupBy(_._2).view.mapValues(
          _.map { case (s, _) => r(s) / out(s) }.sum).toMap
        r = nodes.map(n => n ->
          (scale * 15 / 100 + 85 * inc.getOrElse(n, 0L) / 100)).toMap
      }
      r
    }
    val got = graft.ops.Graph.pagerank(
        edges.toDF("src", "dst"), "src", "dst", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === ref(3))
    assert(got(1L) > got(4L), "hub outranks the dangling sink")
  }

  test("Expectations.check counts violations per rule exactly") {
    import graft.ops.Expectations._
    val d = Seq(
      (Some(1L), Some("a"), 5.0), (Some(2L), Some("b"), 50.0),
      (Some(2L), Some("z"), -1.0), (None, Some("a"), 200.0),
      (Some(4L), None, 7.0)
    ).toDF("k", "s", "v")
    val ref = Seq(1L, 2L, 3L).toDF("rk")
    val out = check(d, Seq(
      NotNull("k"), Unique("k"), InRange("v", 0, 100),
      InSet("s", Seq("a", "b")), ForeignKey("k", ref, "rk")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(out(("not_null", "k")) === ((1L, 5L, false)))
    assert(out(("unique", "k")) === ((1L, 5L, false))) // 2L twice
    assert(out(("in_range", "v")) === ((2L, 5L, false))) // -1, 200
    assert(out(("in_set", "s")) === ((1L, 5L, false))) // "z"; null skipped
    assert(out(("foreign_key", "k")) === ((1L, 5L, false))) // 4L missing
    assert(out.size === 5)
  }

  test("Stats.corrMatrix agrees with Spark's corr and pins n") {
    val rnd = new scala.util.Random(11) // seeded: deterministic test
    // values on the cent grid: scale=100 makes them exact integers
    val d = (1 to 300).map { _ =>
      val x = rnd.nextInt(10000) / 100.0
      (x, x * 3 + rnd.nextInt(1000) / 100.0, rnd.nextInt(5000) / 100.0)
    }.toDF("a", "b", "c").repartition(5)
    val out = graft.ops.Stats.corrMatrix(d, Seq("a", "b", "c"), scale = 100)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out.keySet === Set(("a", "b"), ("a", "c"), ("b", "c")))
    for (((x, y), (n, corr)) <- out) {
      assert(n === 300L)
      assert(math.abs(corr - d.stat.corr(x, y)) < 1e-9, s"($x,$y)")
    }
    assert(out(("a", "b"))._2 > 0.9, "strongly correlated pair")
  }

  test("corrMatrix domain bound: rationale exact, violations fail loudly") {
    // the bound is exactly the largest |scaled value| whose square
    // fits a signed 64-bit long — floor(sqrt(2^63 - 1)): the per-row
    // products multiply in 64-bit, only the sums go decimal(38,0)
    val b = 3037000499L
    assert(BigInt(b) * BigInt(b) <= BigInt(Long.MaxValue))
    assert(BigInt(b + 1) * BigInt(b + 1) > BigInt(Long.MaxValue))
    // a corpus past the bound (|v·scale| = 4e9 at scale=100) fails
    // LOUDLY, never wraps: under ANSI (the session default) the 64-bit
    // square itself raises ARITHMETIC_OVERFLOW at the corrMatrix
    // multiply; with ANSI off the wrap is silent and the max|v| guard
    // raises the documented bound error instead — both paths named so
    // the contract holds in either mode
    val hot = Seq((40000000.0, 1.0), (1.0, 2.0), (2.0, 3.0)).toDF("a", "b")
    val e = intercept[Exception] {
      graft.ops.Stats.corrMatrix(hot, Seq("a", "b"), scale = 100).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: messages(t.getCause)
    assert(messages(e).exists(m =>
      m.contains("3037000499") || m.contains("ARITHMETIC_OVERFLOW")),
      messages(e).mkString(" | "))
  }

  test("HeavyHitters.exact equals brute-force groupBy across random workloads") {
    val rnd = new scala.util.Random(7) // seeded: deterministic test
    for (trial <- 1 to 3) {
      // zipf-ish: key j drawn with weight ~ 1/(j+1); domain >> k
      val keys = (1 to 2000).map { _ =>
        val j = (math.pow(rnd.nextDouble(), 3) * 200).toInt
        Tuple1(s"k$j")
      }
      val d = keys.toDF("tok").repartition(7)
      val got = graft.ops.HeavyHitters.exact(d, "tok",
          thresholdNum = 1, thresholdDen = 50, k = 128)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val truth = d.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * 50 > keys.size.toLong)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === truth, s"trial $trial")
      assert(truth.nonEmpty, s"trial $trial should have heavy hitters")
    }
  }

  test("MisraGries summary never misses a key with share > 1/(k+1)") {
    // 600 copies of HOT in 1200 rows, k=3: share 1/2 > 1/4 must survive
    // any partitioning of the stream
    val rows = (Seq.fill(600)("HOT") ++ (1 to 600).map(i => s"u$i"))
    val d = scala.util.Random.shuffle(rows).map(Tuple1(_)).toDF("tok")
      .repartition(11)
    val s = d.agg(graft.functions.MisraGries.mg(col("tok"), 3).as("mg"))
      .select(col("mg.n"), col("mg.keys")).head
    assert(s.getLong(0) === 1200L)
    assert(s.getSeq[String](1).contains("HOT"))
  }

  test("CappedCollect at cap=Int.MaxValue keeps cross-partition elements") {
    // regression: merge() computed room as cap + 1 - len in Int, which
    // overflows to negative at Int.MaxValue and silently dropped every
    // merged-in partial buffer (uncapped callers lost all but one
    // partition's elements)
    val d = (1 to 100).map(i => (1, i.toLong)).toDF("k", "v").repartition(7)
    val row = d.groupBy(col("k"))
      .agg(CappedCollect.cappedLongList(col("v"), Int.MaxValue).as("cl"))
      .select(col("cl.n"), sort_array(col("cl.ids")).as("ids")).head
    assert(row.getLong(0) === 100L)
    assert(row.getSeq[Long](1) === (1 to 100).map(_.toLong))
  }

  test("CappedCollect equals collect_list-then-filter across random workloads") {
    val rnd = new scala.util.Random(42) // seeded: deterministic test
    for (trial <- 1 to 5) {
      val cap = 1 + rnd.nextInt(20)
      val nKeys = 1 + rnd.nextInt(10)
      // zipf-ish: low keys get many rows, so some groups exceed the cap
      val data = (1 to 500).map { _ =>
        val k = rnd.nextInt(nKeys * nKeys) % nKeys
        (k, rnd.nextLong())
      }.toDF("k", "v").repartition(7) // multiple partitions exercise merge()
      val capped = data.groupBy(col("k"))
        .agg(CappedCollect.cappedLongList(col("v"), cap).as("cl"))
        .filter(col("cl.n").between(2, cap))
        .select(col("k"), sort_array(col("cl.ids")).as("ids"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
      val reference = data.groupBy(col("k"))
        .agg(sort_array(collect_list(col("v"))).as("ids"))
        .filter(size(col("ids")).between(2, cap))
        .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
      assert(capped === reference, s"trial $trial cap=$cap nKeys=$nKeys")
    }
  }

  test("CappedCollect keeps the exact count past the cap") {
    val d = (1 to 1000).map(i => (1, i.toLong)).toDF("k", "v")
    val row = d.groupBy(col("k"))
      .agg(CappedCollect.cappedLongList(col("v"), 5).as("cl"))
      .select(col("cl.n"), size(col("cl.ids"))).head()
    assert(row.getLong(0) === 1000L)     // exact group size survives
    assert(row.getInt(1) <= 6)           // buffer stayed bounded
  }

  // ---- profiler ------------------------------------------------------

  test("Profile.table computes per-column stats in one pass") {
    val d = Seq((1L, "a", 2.5), (2L, "b", -1.0), (3L, null, 2.5))
      .toDF("id", "s", "x")
    val p = graft.ops.Profile.table(d).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet === Set("id", "s", "x"))
    assert(p("s").getAs[Long]("n_nulls") === 1L)
    assert(p("s").getAs[Long]("n_distinct") === 2L)
    assert(p("s").getAs[String]("max_str") === "b")
    assert(p("x").getAs[Double]("min_num") === -1.0)
    assert(p("x").getAs[Long]("n_distinct") === 2L)
    assert(p("id").getAs[Double]("max_num") === 3.0)
    assert(p.values.forall(_.getAs[Long]("n_rows") == 3L))
  }

  // ---- compaction ----------------------------------------------------

  test("compact merges the small-file tail on a flat table") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact")
      .resolve("t").toString
    val t = graft.sources.ParquetTable(spark, dir)
    // 12 appends of 1 row each → 12+ files
    (1 to 12).foreach(i => t.append(Seq((i.toLong, s"v$i")).toDF("id", "v")))
    def files = new java.io.File(t.dataDir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files >= 12)
    val before = t.read.collect().map(_.toSeq).toSet
    t.compact(targetFileBytes = 1024L * 1024 * 128)
    assert(files === 1)
    assert(t.read.collect().map(_.toSeq).toSet === before)
  }

  test("compact on a bucketed table touches only fragmented buckets") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-b")
      .resolve("t").toString
    val t = graft.sources.ParquetTable(spark, dir, buckets = 4, bucketKey = "id")
    // co-locate each bucket's rows in one task so every bucket dir
    // starts with exactly one file (and is therefore already compact)
    t.append((1L to 40L).map(i => i -> s"v$i").toDF("id", "v")
      .repartition(4, t.bucketExpr))
    // fragment ONE bucket with single-row appends for a key in it
    val frag = (1 to 8).map(_ => 1L -> "x")
    frag.foreach(r => t.append(Seq(r).toDF("id", "v")))
    val fragBucket = t.bucketIds.maxBy { b =>
      new java.io.File(s"$dir/__bucket=$b").listFiles()
        .count(_.getName.endsWith(".parquet"))
    }
    def bucketState(b: Int) = new java.io.File(s"$dir/__bucket=$b").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.length)).toSet
    val untouchedBefore = t.bucketIds.filterNot(_ == fragBucket)
      .map(b => b -> bucketState(b)).toMap
    val before = t.read.collect().map(_.toSeq)
      .groupBy(identity).view.mapValues(_.length).toMap
    t.compact(targetFileBytes = 1024L * 1024 * 128)
    // fragmented bucket now has 1 file; untouched buckets byte-identical
    assert(bucketState(fragBucket).size === 1)
    for ((b, st) <- untouchedBefore) assert(bucketState(b) === st, s"bucket $b changed")
    val after = t.read.collect().map(_.toSeq)
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(after === before)
  }

  test("compact uses per-bucket file targets: a small bucket is not shattered") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-mix")
      .resolve("t").toString
    val t = graft.sources.ParquetTable(spark, dir, buckets = 2, bucketKey = "id")
    // learn which ids land in which bucket
    val byBucket = (1L to 80L).toDF("id")
      .select($"id", t.bucketExpr.as("b")).collect()
      .groupBy(_.getInt(1)).view.mapValues(_.map(_.getLong(0)).toSeq).toMap
    assert(byBucket.keySet === Set(0, 1))
    val (bigIds, smallIds) = (byBucket(0), byBucket(1))
    // big bucket: heavily fragmented with padded rows; small bucket:
    // 3 tiny files wanting exactly 1
    bigIds.foreach(i => t.append(Seq((i, "x" * 400)).toDF("id", "v")))
    smallIds.grouped(math.max(1, smallIds.size / 3)).foreach(g =>
      t.append(g.map(i => (i, "s")).toDF("id", "v")))
    def files(b: Int) = new java.io.File(s"$dir/__bucket=$b").listFiles()
      .count(_.getName.endsWith(".parquet"))
    val smallBefore = files(1)
    val before = t.read.collect().map(_.toSeq).toSet
    // target sized so the big bucket wants ~4 files and the small wants 1
    t.compact(targetFileBytes = t.sizeBytes / 4)
    assert(files(0) > 1, "big bucket must stay parallel (not one file)")
    assert(files(1) === 1,
      s"small bucket must coalesce to its OWN target (was $smallBefore), " +
        "not shatter to the big bucket's")
    assert(t.read.collect().map(_.toSeq).toSet === before)
  }

  test("compact splits an oversized fragmented bucket across files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-split")
      .resolve("t").toString
    val t = graft.sources.ParquetTable(spark, dir, buckets = 1, bucketKey = "id")
    // 20 single-row appends -> 20 tiny files whose total exceeds the
    // compaction target several times over
    (1L to 20L).foreach(i => t.append(Seq((i, "v" * 200)).toDF("id", "v")))
    def files = new java.io.File(s"$dir/__bucket=0").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files === 20)
    val bytes = t.sizeBytes
    val target = bytes / 4 // want ~4 files
    val before = t.read.collect().map(_.toSeq).toSet
    t.compact(targetFileBytes = target)
    // the bucket must coalesce, but NOT serialize into a single file:
    // the (bucket, spread) shuffle keeps ~target-sized files
    assert(files > 1, "oversized bucket collapsed into one file")
    assert(files < 20, "bucket did not compact")
    assert(t.read.collect().map(_.toSeq).toSet === before)
  }

  // ---- k-means loop --------------------------------------------------

  test("kmeans converges on separable synthetic clusters") {
    // two tight clusters around orthogonal directions
    val vecs = (
      (1 to 20).map(i => (i.toLong, Seq(1.0, 0.0, 0.01 * i))) ++
      (21 to 40).map(i => (i.toLong, Seq(0.0, 1.0, 0.01 * (i - 20))))
    ).toDF("vec_id", "embedding")
    val init = Seq((0L, Seq(0.9, 0.1, 0.0)), (1L, Seq(0.1, 0.9, 0.0)))
      .toDF("cell_id", "cvec")
    val (cents, assign) = graft.ops.Similarity.kmeans(
      vecs, "vec_id", "embedding", init, iters = 10)
    val byCell = assign.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 20L).map(byCell).toSet.size === 1, "cluster 1 is pure")
    assert((21L to 40L).map(byCell).toSet.size === 1, "cluster 2 is pure")
    assert(byCell(1L) !== byCell(21L), "clusters are distinct")
    // centroid dominant dimensions match the generating directions
    val c = cents.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val cell1 = byCell(1L); val cell2 = byCell(21L)
    assert(c((cell1, 0L)) > 0.9 && c((cell1, 1L)) < 0.1)
    assert(c((cell2, 1L)) > 0.9 && c((cell2, 0L)) < 0.1)
  }

  test("l2normalize kernel: unit norm, null on zero vectors") {
    import graft.functions.Kernels
    val d = Seq((1L, Seq(3.0f, 4.0f)), (2L, Seq(0.0f, 0.0f)))
      .toDF("id", "v")
      .select(col("id"), Kernels.l2normalizeOf(col("v")).as("n"))
    val rows = d.orderBy("id").collect()
    assert(rows(0).getSeq[Double](1) === Seq(0.6, 0.8))
    assert(rows(1).isNullAt(1))
  }

  // ---- sketches (q46 has no oracle; pin error bounds here) -----------

  test("sketch estimates stay within error bounds of exact values") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val exact = orders.groupBy(col("o_orderpriority"))
      .agg(count_distinct(col("o_custkey")).as("nd"),
        expr("percentile(o_totalprice, 0.5D)").as("p50"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val approx = SparkEntry.queries("q46_sketches")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(approx.keySet === exact.keySet)
    for ((k, (nd, p50)) <- exact) {
      val (and, ap50) = approx(k)
      assert(math.abs(and - nd).toDouble / nd <= 0.05, s"$k distinct: $and vs $nd")
      assert(math.abs(ap50 - p50) / p50 <= 0.05, s"$k p50: $ap50 vs $p50")
    }
  }

  test("Funnel requires strict temporal order through the stages") {
    import graft.ops.Funnel
    import java.sql.Timestamp
    def t(s: Int) = new Timestamp(1700000000000L + s * 1000L)
    val events = Seq(
      // u1 full funnel in order
      (1L, t(0), "view"), (1L, t(1), "click"), (1L, t(2), "purchase"),
      // u2 clicked BEFORE viewing: click doesn't count, purchase can't
      (2L, t(0), "click"), (2L, t(1), "view"), (2L, t(2), "purchase"),
      // u3 view only
      (3L, t(0), "view"),
      // u4 never viewed: no stage counts
      (4L, t(0), "purchase"), (4L, t(1), "click"),
      // u5 same-timestamp click is NOT strictly after the view
      (5L, t(0), "view"), (5L, t(0), "click")
    ).toDF("user_id", "ts", "event_type")
    val out = Funnel.counts(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out === Map("view" -> 4L, "click" -> 1L, "purchase" -> 1L))
  }

  test("Funnel plans all stages on a single exchange") {
    import graft.ops.Funnel
    import java.sql.Timestamp
    val events = Seq((1L, new Timestamp(0L), "view"))
      .toDF("user_id", "ts", "event_type")
    val plan = Funnel.stageTimes(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges === 1, s"stage chain must reuse one shuffle:\n$plan")
    // all three Window nodes share one grouping sort on user_id — the
    // sort count must not grow with the stage count
    val sorts = "\\+- Sort ".r.findAllIn(plan).length
    assert(sorts === 1, s"stage chain must reuse one grouping sort:\n$plan")
  }

  test("Sweep.runningSum equals the naive global-window prefix sum") {
    import graft.ops.Sweep
    import org.apache.spark.sql.expressions.Window
    val rng = new scala.util.Random(7)
    // clustered timestamps (hot cells) + duplicates + negative deltas
    val pts = Seq.fill(500) {
      val t = if (rng.nextBoolean()) rng.nextInt(50).toLong
              else 1000000L + rng.nextInt(100000)
      (t, (rng.nextInt(7) - 3).toLong)
    }.toDF("t", "d")
    val naive = pts.groupBy($"t").agg(sum($"d").as("d"))
      .withColumn("running", sum($"d").over(
        Window.orderBy($"t").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    // few buckets → multiple cells actually exercised; exact regardless
    // of the bucket count AND of the input's partition layout
    for (b <- Seq(1, 3, 1024); nPart <- Seq(1, 7)) {
      val got = Sweep.runningSum(pts.repartition(nPart), "t", "d", buckets = b)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      assert(got === naive, s"buckets=$b parts=$nPart")
    }
    // a deliberately WRONG bounds hint (too narrow, offset) is still
    // exact — hints govern balance only
    val hinted = Sweep.runningSum(pts, "t", "d", buckets = 8,
        bounds = Some((500000L, 500100L)))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(hinted === naive)
  }

  test("Sweep.peak finds the max concurrency and its earliest time") {
    import graft.ops.Sweep
    // intervals [0,10] [5,20] [10,12] inclusive → +1@{0,5,10}, -1@{11,21,13}
    val pts = Seq((0L, 1L), (5L, 1L), (10L, 1L),
      (11L, -1L), (21L, -1L), (13L, -1L)).toDF("t", "d")
    val r = Sweep.peak(pts, "t", "d").head()
    assert((r.getLong(0), r.getLong(1)) === (3L, 10L))
    // single point and empty input stay well-formed
    val one = Sweep.peak(Seq((42L, 1L)).toDF("t", "d"), "t", "d").head()
    assert((one.getLong(0), one.getLong(1)) === (1L, 42L))
    assert(Sweep.runningSum(Seq.empty[(Long, Long)].toDF("t", "d"), "t", "d")
      .count() === 0L)
    // null t / null d rows are dropped, never folded into offsets
    val withNulls = Seq((Some(1L), Some(1L)), (None, Some(5L)),
      (Some(2L), Some(1L)), (Some(3L), None)).toDF("t", "d")
    assert(Sweep.runningSum(withNulls, "t", "d").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet === Set((1L, 1L), (2L, 2L)))
  }

  test("stratifiedByHash equals the window-rank formulation, no Window op") {
    import graft.ops.Sample
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextKernels
    // skewed strata: 'a' is hot, 'c' is smaller than n
    val df = ((1L to 400L).map(i => (i, "a")) ++
      (401L to 500L).map(i => (i, "b")) ++
      (501L to 503L).map(i => (i, "c"))).toDF("id", "cls")
    val got = Sample.stratifiedByHash(df, Seq("cls"), "id", n = 7)
    val h = TextKernels.hex60(col("id").cast("string"))
    val w = Window.partitionBy(col("cls")).orderBy(h.asc, col("id").asc)
    val want = df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 7).drop("rk")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got.collect().map(r => (r.getLong(0), r.getString(1))).toSet === want)
    // under-n stratum keeps all its rows
    assert(got.filter(col("cls") === "c").count() === 3L)
    // the big table must not be window-sorted (bounded heap + semi-join)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "selection must not plan a window rank")
    assert(plan.contains("ObjectHashAggregate"), plan)
  }

  test("stratifiedByHash: an id repeated across strata stays per-stratum") {
    import graft.ops.Sample
    // id 7 exists in BOTH strata; n=1 per stratum must return exactly
    // one row per stratum, never drag the other stratum's id-7 row in
    val df = Seq((7L, "en"), (7L, "fr"), (8L, "en"), (9L, "fr"))
      .toDF("id", "cls")
    val got = Sample.stratifiedByHash(df, Seq("cls"), "id", n = 1)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.groupBy(_._2).view.mapValues(_.length).toMap ===
      Map("en" -> 1, "fr" -> 1), s"got: ${got.toSeq}")
  }

  test("weightedSystematic: null-id weight is excluded from the total too") {
    import graft.ops.Sample
    // a null-id row cannot sit on the line; if its weight inflated the
    // total, step would overshoot and the tail point would miss
    val df = Seq((Some(1L), 50L), (None: Option[Long], 50L), (Some(2L), 50L))
      .toDF("id", "w")
    val got = Sample.weightedSystematic(df, "id", "w", k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got.values.sum === 2L, s"must place all k hits: $got")
    assert(got.keySet === Set(1L, 2L))
  }

  test("weightedSystematic: k hits, weight-proportional, integer-exact") {
    import graft.ops.Sample
    val rng = new scala.util.Random(11)
    val rows = (1L to 300L).map(i => (i, 1L + rng.nextInt(100)))
    val df = rows.toDF("id", "w")
    val got = Sample.weightedSystematic(df, "id", "w", k = 20).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // exactly k hits land (total >= k·step by construction)
    assert(got.map(_._3).sum === 20L)
    // every hit count matches the brute-force point-in-interval count
    val cum = rows.scanLeft((0L, 0L, 0L)) { case ((_, _, c), (id, w)) =>
      (id, w, c + w) }.drop(1)
    val step = math.max(cum.last._3 / 20, 1L)
    val expect = cum.map { case (id, w, c) =>
      (id, (1L to 20L).count(m => m * step > c - w && m * step <= c).toLong)
    }.filter(_._2 > 0).toMap
    assert(got.map(t => t._1 -> t._3).toMap === expect)
    // a row heavier than step gets multiple hits
    val heavy = Sample.weightedSystematic(
      Seq((1L, 1000L), (2L, 10L)).toDF("id", "w"), "id", "w", k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(heavy(1L) >= 3L, s"heavy row must absorb most points: $heavy")
    // zero/negative weights are never selected
    assert(Sample.weightedSystematic(
      Seq((1L, 0L), (2L, 5L)).toDF("id", "w"), "id", "w", k = 2)
      .collect().map(_.getLong(0)).toSet === Set(2L))
  }

  test("packIntoChunks: contiguous offsets, boundary-straddling spans") {
    import graft.ops.TextClean
    val toks = Seq((1L, 100L), (2L, 500L), (3L, 12L), (4L, 600L), (5L, 0L))
      .toDF("doc_id", "n_tok")
    val got = TextClean.packIntoChunks(toks, "doc_id", "n_tok", budget = 256L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got === Seq(
      (1L, 0L, 0L, 0L, 1L),     // fits in window 0
      (2L, 100L, 0L, 2L, 3L),   // straddles 0..2
      (3L, 600L, 2L, 2L, 1L),   // rides along in window 2
      (4L, 612L, 2L, 4L, 3L)))  // zero-token doc 5 dropped
    // offsets are contiguous: each doc starts where the previous ended
    val byId = got.map(t => t._1 -> t._2).toMap
    assert(byId(2L) === 100L && byId(3L) === 600L && byId(4L) === 612L)
  }

  test("Sweep never plans a whole-data single-partition sort") {
    import graft.ops.Sweep
    val pts = (1L to 100L).map(t => (t, 1L)).toDF("t", "d")
    val plan = Sweep.runningSum(pts, "t", "d").queryExecution.executedPlan.toString
    // the only SinglePartition exchange may feed the bucket-totals
    // window (≤ buckets rows), which sits downstream of the per-cell
    // aggregate — assert the big-side window is hash-partitioned
    assert(plan.contains("hashpartitioning(cell"),
      s"per-cell prefix must be distributed:\n$plan")
  }

  test("groupedTopK matches the window-rank reference, skips null scores") {
    import graft.ops.TopK
    val d = Seq(
      ("a", 1L, Some(10.0)), ("a", 2L, Some(30.0)), ("a", 3L, Some(30.0)),
      ("a", 4L, Some(5.0)), ("b", 5L, Some(1.0)), ("b", 6L, None))
      .toDF("g", "id", "score")
    val out = TopK.groupedTopK(d, Seq("g"), "score", "id", k = 2)
      .orderBy("g", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // ties break to the smaller id; the null-score row never ranks
    assert(out.toSeq === Seq(
      ("a", 1L, 2L, 30.0), ("a", 2L, 3L, 30.0), ("b", 1L, 5L, 1.0)))
  }

  test("groupedTopK plans the partial heap aggregate, not a window sort") {
    import graft.ops.TopK
    val d = (1L to 50L).map(i => (s"g${i % 3}", i, i.toDouble)).toDF("g", "id", "score")
    val plan = TopK.groupedTopK(d, Seq("g"), "score", "id", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Window"),
      "grouped top-k must not plan a per-group window sort")
  }

  test("Graph.triangleStats: exact per-node counts, cc, orientation-independent") {
    import graft.ops.Graph
    // K4 minus edge {3,4}, plus pendant 5; raw list has duplicates and
    // reversed edges to exercise canonicalization
    val edges = Seq(
      (1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (4L, 5L), (4L, 4L)).toDF("src", "dst")
    val out = Graph.triangleStats(edges, "src", "dst").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    // triangles: {1,2,3} and {1,2,4}
    assert(out(1L) === ((3L, 2L, Some(2.0 * 2 / (3 * 2)))))
    assert(out(2L) === ((3L, 2L, Some(2.0 * 2 / (3 * 2)))))
    assert(out(3L) === ((2L, 1L, Some(1.0))))
    assert(out(4L) === ((3L, 1L, Some(2.0 * 1 / (3 * 2)))))
    // pendant: degree 1, no triangles, cc undefined
    assert(out(5L) === ((1L, 0L, None)))
    // self-loop (4,4) was dropped: node 4's degree counts 1,2,5 only
  }

  test("Graph.assortativity: path is -1, regular graph is null, edges canonicalized") {
    import graft.ops.Graph
    // P3 path 1-2-3: perfectly disassortative (r = -1); duplicates and
    // a reversed edge must collapse before degrees are counted
    val path = Seq((1L, 2L), (2L, 1L), (2L, 3L)).toDF("src", "dst")
    val r1 = Graph.assortativity(path, "src", "dst").collect()(0)
    assert(r1.getLong(0) === 4L) // 2 undirected edges, both orientations
    assert(math.abs(r1.getDouble(1) - (-1.0)) < 1e-12)
    // 4-cycle: 2-regular, zero degree variance => correlation undefined
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val r2 = Graph.assortativity(cyc, "src", "dst").collect()(0)
    assert(r2.getLong(0) === 8L)
    assert(r2.isNullAt(1))
  }

  test("Skyline.frontier2D: exact dominance, ties dominated, partition-invariant") {
    import graft.ops.Skyline
    val pts = Seq(
      (1L, 5L), (1L, 5L),      // duplicate collapses
      (2L, 3L), (2L, 4L),      // (2,4) dominated by (2,3)
      (3L, 3L),                // dominated by (2,3): larger x, equal y
      (4L, 1L), (4L, 2L),      // (4,2) dominated by (4,1)
      (5L, 5L)                 // dominated by everything cheaper
    ).toDF("x", "y")
    val expected = Set((1L, 5L), (2L, 3L), (4L, 1L))
    def run(df: org.apache.spark.sql.DataFrame) =
      Skyline.frontier2D(df, "x", "y").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(pts) === expected)
    // the local-prune phase keys on spark_partition_id — the result
    // must not depend on the physical partitioning
    assert(run(pts.repartition(7)) === expected)
    assert(run(pts.coalesce(1)) === expected)
  }

  test("Skyline.frontier2D: anti-correlated input trips the loud size guard " +
      "before the single-partition global sort") {
    import graft.ops.Skyline
    // perfect x/y trade-off: every point is on the frontier, so the
    // local prune passes everything through — the exact hazard the
    // guard names
    val anti = spark.range(500).selectExpr("id AS x", "(500 - id) AS y")
    val ex = intercept[Exception] {
      Skyline.frontier2D(anti, "x", "y", maxGlobalRows = 100L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++
        messages(e.getCause))
    val msg = messages(ex).mkString("\n")
    assert(msg.contains("maxGlobalRows"), s"guard message missing: $msg")
    assert(msg.contains("Anti-correlated"), s"hazard not named: $msg")
    // same input under a sufficient limit: exact frontier = all points
    assert(Skyline.frontier2D(anti, "x", "y", maxGlobalRows = 500L)
      .count() === 500L)
  }

  test("Robust.medianMadOutliers: exact lower medians, MAD, integer outlier cut") {
    import graft.ops.Robust
    val df = Seq(
      ("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L), ("a", 100L),
      ("b", 5L), ("b", 5L), ("b", 5L), ("b", 5L),
      ("c", 1L), ("c", 2L), ("c", 3L), ("c", 10L)
    ).toDF("g", "v")
    val out = Robust.medianMadOutliers(df, "g", "v", k = 3).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // a: median 3, devs {2,1,0,1,97} -> MAD 1, outlier 97 > 3
    assert(out("a") === ((5L, 3L, 1L, 1L)))
    // b: constant group -> MAD 0, nothing exceeds 0 strictly... except
    // nothing deviates at all
    assert(out("b") === ((4L, 5L, 0L, 0L)))
    // c: even n=4 -> lower median 2; devs {1,0,1,8} -> MAD 1; 8 > 3
    assert(out("c") === ((4L, 2L, 1L, 1L)))
  }

  test("TimeSeries.seasonalNaiveMase: hand cases -- perfect season, constant, gaps") {
    import graft.ops.TimeSeries
    // perfectly 2-periodic: the season-2 forecast is exact (mase 0),
    // while the naive scale is large
    val periodic = Seq(0L, 1L, 2L, 3L, 4L, 5L).map(t =>
      ("a", t, if (t % 2 == 0) 1L else 5L)).toDF("g", "t", "x")
    val r1 = TimeSeries.seasonalNaiveMase(periodic, "g", "t", "x",
      season = 2).head()
    assert((r1.getLong(1), r1.getLong(2), r1.getLong(3)) === ((4L, 5L, 0L)))
    // constant series: zero naive scale -> NULL verdict, no crash
    val const = Seq(0L, 1L, 2L, 3L).map(t => ("c", t, 7L))
      .toDF("g", "t", "x")
    val r2 = TimeSeries.seasonalNaiveMase(const, "g", "t", "x",
      season = 2).head()
    assert(r2.isNullAt(3) && r2.getLong(1) === 2L)
    // observed-pairs rule: a missing day pairs with nothing
    val gappy = Seq(("g2", 0L, 10L), ("g2", 1L, 20L), ("g2", 3L, 40L))
      .toDF("g", "t", "x")
    val r3 = TimeSeries.seasonalNaiveMase(gappy, "g", "t", "x",
      season = 2).head()
    // season pairs: (3,1) -> |40-20| = 20, n = 1; naive: (1,0) -> 10, n = 1
    assert((r3.getLong(1), r3.getLong(2), r3.getLong(3)) ===
      ((1L, 1L, 2000000L)))
  }
}
