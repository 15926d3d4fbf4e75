package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ParquetTable
import graft.streaming.StreamingLift

/** End-to-end micro-batch runs of the [EXT] streaming lift (W2):
  * file-stream → watermark → dedup-within-watermark → foreachBatch
  * upsert, with semantics matching the batch q8 keep-latest dedup.
  */
class StreamingLiftSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def events(rows: Seq[(Long, Timestamp, String)]): DataFrame =
    rows.toDF("user_id", "ts", "v")

  test("upsertStream merges micro-batches into the destination (q8 semantics)") {
    val srcDir = Files.createTempDirectory("graft-stream-src").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
    val dest = ParquetTable(spark,
      Files.createTempDirectory("graft-stream-dst").resolve("t").toString)
    val schema = events(Nil).schema

    // batch 1: two users, one duplicate key (later ts must win)
    events(Seq(
      (1L, ts("2024-01-01 10:00:00"), "old"),
      (1L, ts("2024-01-01 10:05:00"), "newer"),
      (2L, ts("2024-01-01 10:01:00"), "b")))
      .write.parquet(srcDir + "/f1")

    val q1 = StreamingLift.upsertStream(spark, srcDir + "/*", schema, dest,
      key = "user_id", tsCol = "ts", checkpoint = ckpt)
    q1.awaitTermination(60000)
    val after1 = dest.read.orderBy("user_id").as[(Long, Timestamp, String)].collect()
    assert(after1.map(_._1).toSeq === Seq(1L, 2L))
    assert(after1(0)._3 === "newer", "within-batch dedup keeps latest ts")

    // batch 2 (new files, restarted query from the same checkpoint):
    // update user 1, add user 3 — checkpoint must skip f1
    events(Seq(
      (1L, ts("2024-01-01 11:00:00"), "updated"),
      (3L, ts("2024-01-01 11:02:00"), "c")))
      .write.parquet(srcDir + "/f2")

    val q2 = StreamingLift.upsertStream(spark, srcDir + "/*", schema, dest,
      key = "user_id", tsCol = "ts", checkpoint = ckpt)
    q2.awaitTermination(60000)
    val after2 = dest.read.orderBy("user_id").as[(Long, Timestamp, String)].collect()
    assert(after2.map(_._1).toSeq === Seq(1L, 2L, 3L))
    assert(after2(0)._3 === "updated", "upsert replaces on key collision")
    assert(after2(1)._3 === "b", "untouched keys survive")
  }

  test("maintainAggStream folds CDC micro-batches into the aggregate (streaming q107)") {
    import graft.ops.Cdc
    val srcDir = Files.createTempDirectory("graft-ivm-src").toString
    val ckpt = Files.createTempDirectory("graft-ivm-ckpt").toString
    val snap = ParquetTable(spark,
      Files.createTempDirectory("graft-ivm-snap").resolve("agg").toString)

    def rows(kvs: Seq[(Long, String, Double)]): DataFrame =
      kvs.toDF("k", "g", "v")
    def agg(df: DataFrame): DataFrame =
      df.groupBy(org.apache.spark.sql.functions.col("g"))
        .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n_rows"),
          org.apache.spark.sql.functions.sum(
            org.apache.spark.sql.functions.col("v")).as("v"))

    val state0 = rows(Seq((1L, "a", 10.0), (2L, "b", 5.0)))
    val state1 = rows(Seq((1L, "a", 11.0), (3L, "b", 2.0))) // upd, del, ins
    snap.overwrite(agg(state0))
    val changes = Cdc.changeSet(state0, state1, "k")
    changes.write.parquet(srcDir + "/c1")

    val q = StreamingLift.maintainAggStream(spark, srcDir + "/*",
      changes.schema, snap, "g", Seq("v"), ckpt)
    q.awaitTermination(60000)
    val got = snap.read.orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = agg(state1).orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === want)

    // second change file from the same checkpoint: only c2 applies
    val state2 = rows(Seq((1L, "a", 11.0), (3L, "b", 2.0), (4L, "c", 7.0)))
    Cdc.changeSet(state1, state2, "k").write.parquet(srcDir + "/c2")
    val q2 = StreamingLift.maintainAggStream(spark, srcDir + "/*",
      changes.schema, snap, "g", Seq("v"), ckpt)
    q2.awaitTermination(60000)
    val got2 = snap.read.orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got2 === agg(state2).orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq)

    // replay protection: a fresh checkpoint re-delivers every change
    // file from batch 0 — the snapshot's applied-batch metadata must
    // refuse the re-application (delta-merge is not idempotent)
    val ckpt2 = Files.createTempDirectory("graft-ivm-ckpt2").toString
    val q3 = StreamingLift.maintainAggStream(spark, srcDir + "/*",
      changes.schema, snap, "g", Seq("v"), ckpt2)
    q3.awaitTermination(60000)
    assert(snap.read.orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq === got2,
      "replayed batches must not double-apply")
  }

  test("sketchMaintainStream: folded KMV states == one-pass batch sketch, replay-safe") {
    import org.apache.spark.sql.functions.col
    import graft.functions.SketchAgg
    val srcDir = Files.createTempDirectory("graft-kmvs-src").toString
    val ckpt = Files.createTempDirectory("graft-kmvs-ckpt").toString
    val states = ParquetTable(spark,
      Files.createTempDirectory("graft-kmvs-st").resolve("st").toString)
    val K = 16
    def rows(r: Range): DataFrame =
      r.map(i => (s"s${i % 3}", s"key$i")).toDF("src", "k")
    val schema = rows(1 to 1).schema

    rows(1 to 40).write.parquet(srcDir + "/b1")
    val q1 = StreamingLift.sketchMaintainStream(spark, srcDir + "/*",
      schema, states, "src", "k", ckpt, k = K)
    q1.awaitTermination(60000)

    // second slice OVERLAPS the first — the fold must union, not add
    rows(30 to 80).write.parquet(srcDir + "/b2")
    val q2 = StreamingLift.sketchMaintainStream(spark, srcDir + "/*",
      schema, states, "src", "k", ckpt, k = K)
    q2.awaitTermination(60000)

    def stateMap(df: DataFrame) = df.collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val got = stateMap(states.read)
    val want = stateMap(rows(1 to 80).groupBy(col("src"))
      .agg(SketchAgg.kmvSketch(col("k"), K).as("st")))
    assert(got === want,
      "maintained states must be bit-identical to a one-pass batch rebuild")

    // the report over the maintained table = the batch rebuild's report
    val est = states.read
      .select(col("src"), SketchAgg.kmvReportOf(col("st"), K).as("r"))
      .collect().map(r => r.getString(0) -> r.getStruct(1).getLong(3)).toMap
    val distinct = rows(1 to 80).groupBy(col("src"))
      .agg(org.apache.spark.sql.functions.countDistinct(col("k")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    est.foreach { case (src, e) =>
      assert(e > 0 && math.abs(e - distinct(src)).toDouble / distinct(src) < 0.8,
        s"$src: estimate $e vs exact ${distinct(src)}")
    }

    // fresh checkpoint replays everything as batch 0: the applied-batch
    // guard skips it (and the fold is idempotent by algebra anyway)
    val ckpt2 = Files.createTempDirectory("graft-kmvs-ckpt2").toString
    val q3 = StreamingLift.sketchMaintainStream(spark, srcDir + "/*",
      schema, states, "src", "k", ckpt2, k = K)
    q3.awaitTermination(60000)
    assert(stateMap(states.read) === want, "replay must not perturb the states")
  }

  test("momentsMaintainStream: maintained power sums == one-pass rebuild; guard blocks double-count") {
    import org.apache.spark.sql.functions.col
    import graft.functions.SketchAgg
    val srcDir = Files.createTempDirectory("graft-moms-src").toString
    val ckpt = Files.createTempDirectory("graft-moms-ckpt").toString
    val states = ParquetTable(spark,
      Files.createTempDirectory("graft-moms-st").resolve("st").toString)
    def rows(r: Range): DataFrame =
      r.map(i => (s"s${i % 2}", (i * 7 % 101).toLong)).toDF("src", "x")
    val schema = rows(1 to 1).schema

    rows(1 to 50).write.parquet(srcDir + "/b1")
    StreamingLift.momentsMaintainStream(spark, srcDir + "/*", schema,
      states, "src", "x", ckpt).awaitTermination(60000)
    rows(51 to 90).write.parquet(srcDir + "/b2")
    StreamingLift.momentsMaintainStream(spark, srcDir + "/*", schema,
      states, "src", "x", ckpt).awaitTermination(60000)

    def stateMap(df: DataFrame) = df.collect()
      .map(r => r.getString(0) ->
        r.getSeq[java.math.BigDecimal](1).map(BigDecimal(_))).toMap
    val want = stateMap(rows(1 to 90).groupBy(col("src"))
      .agg(SketchAgg.momentsSketch(col("x")).as("st")))
    assert(stateMap(states.read) === want)

    // power sums are NOT replay-idempotent — only the applied-batch
    // guard keeps a fresh-checkpoint replay from double-counting
    val ckpt2 = Files.createTempDirectory("graft-moms-ckpt2").toString
    StreamingLift.momentsMaintainStream(spark, srcDir + "/*", schema,
      states, "src", "x", ckpt2).awaitTermination(60000)
    assert(stateMap(states.read) === want, "replay must not double-count")
  }

  test("logHistMaintainStream: maintained quantile states == one-pass rebuild") {
    import org.apache.spark.sql.functions.col
    import graft.functions.SketchAgg
    val srcDir = Files.createTempDirectory("graft-lh-src").toString
    val ckpt = Files.createTempDirectory("graft-lh-ckpt").toString
    val states = ParquetTable(spark,
      Files.createTempDirectory("graft-lh-st").resolve("st").toString)
    def rows(r: Range): DataFrame =
      r.map(i => (s"s${i % 2}", (i.toLong * 13) % 5000)).toDF("src", "x")
    val schema = rows(1 to 1).schema

    rows(1 to 60).write.parquet(srcDir + "/b1")
    StreamingLift.logHistMaintainStream(spark, srcDir + "/*", schema,
      states, "src", "x", ckpt).awaitTermination(60000)
    rows(61 to 120).write.parquet(srcDir + "/b2")
    StreamingLift.logHistMaintainStream(spark, srcDir + "/*", schema,
      states, "src", "x", ckpt).awaitTermination(60000)

    def stateMap(df: DataFrame) = df.collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val want = stateMap(rows(1 to 120).groupBy(col("src"))
      .agg(SketchAgg.logHistSketch(col("x")).as("st")))
    assert(stateMap(states.read) === want)

    // the maintained table serves percentile brackets directly
    val rep = states.read
      .select(col("src"), SketchAgg.logHistReportOf(col("st")).as("r"))
      .select("src", "r.n", "r.p50_lo", "r.p50_hi").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    rep.foreach { case (src, (n, lo, hi)) =>
      assert(n === 60L && lo <= hi && hi > 0L, s"$src: ($n, $lo, $hi)")
    }
  }

  test("tumblingCounts: closed windows emit aggregated counts") {
    val srcDir = Files.createTempDirectory("graft-tumble").toString
    val data = events(Seq(
      (1L, ts("2024-01-01 10:10:00"), "a"),
      (2L, ts("2024-01-01 10:20:00"), "a"),
      (3L, ts("2024-01-01 11:10:00"), "b")))
      .withColumn("value", org.apache.spark.sql.functions.lit(1.5))
    data.write.parquet(srcDir + "/f1")

    val stream = spark.readStream.schema(data.schema).parquet(srcDir + "/*")
    val ckpt = Files.createTempDirectory("graft-tumble-ckpt").toString
    // update mode: append only emits windows closed by a LATER batch's
    // watermark — a single AvailableNow batch would emit nothing.
    val q = StreamingLift.tumblingCounts(stream, "ts", "v", "value")
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .format("memory").queryName("tumble_out").start()
    q.awaitTermination(60000)
    val rows = spark.table("tumble_out").collect()
    assert(rows.exists(r => r.getAs[String]("v") == "a" && r.getAs[Long]("n_events") == 2L))
  }

  test("append mode drops data later than the watermark") {
    import org.apache.spark.sql.functions.lit
    val srcDir = Files.createTempDirectory("graft-late").toString
    val ckpt = Files.createTempDirectory("graft-late-ckpt").toString
    def mk(rows: Seq[(Long, Timestamp, String)]) =
      events(rows).withColumn("value", lit(1.0))
    val schema = mk(Nil).schema

    // run 1: an on-time event in the 10:00 window plus a 13:00 event
    // that advances the watermark (delay 1h) to 12:00 at run end
    mk(Seq(
      (1L, ts("2024-01-01 10:10:00"), "a"),
      (2L, ts("2024-01-01 13:00:00"), "b")))
      .write.parquet(srcDir + "/f1")
    // memory sink cannot recover a checkpoint; a parquet sink can, and
    // append mode only ever adds rows to it
    val outDir = Files.createTempDirectory("graft-late-out").toString
    def run() = {
      val stream = spark.readStream.schema(schema).parquet(srcDir + "/*")
      val q = StreamingLift.tumblingCounts(stream, "ts", "v", "value")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .format("parquet").option("path", outDir).start()
      q.awaitTermination(60000)
      spark.read.parquet(outDir).collect()
    }
    run()

    // run 2: a LATE event for the already-closing 10:00 window (10:20
    // < watermark 12:00) must be dropped; the window then emits with
    // only the on-time row counted
    mk(Seq((1L, ts("2024-01-01 10:20:00"), "a")))
      .write.parquet(srcDir + "/f2")
    val out = run()
    val win10 = out.filter(r => r.getAs[String]("v") == "a")
    assert(win10.nonEmpty, "watermark passing 11:00 must flush the window")
    assert(win10.map(_.getAs[Long]("n_events")).sum === 1L,
      "the late 10:20 event must not be counted")
  }

  test("sessionCounts groups gap-separated activity into sessions") {
    val srcDir = Files.createTempDirectory("graft-sess").toString
    val data = events(Seq(
      (1L, ts("2024-01-01 10:00:00"), "u1"),
      (1L, ts("2024-01-01 10:10:00"), "u1"),   // same session (gap 30m)
      (1L, ts("2024-01-01 12:00:00"), "u1")))  // new session
    data.write.parquet(srcDir + "/f1")

    val stream = spark.readStream.schema(data.schema).parquet(srcDir + "/*")
    val ckpt = Files.createTempDirectory("graft-sess-ckpt").toString
    // session windows support append/complete, not update
    val q = StreamingLift.sessionCounts(stream, "ts", "v")
      .writeStream.outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .format("memory").queryName("sess_out").start()
    q.awaitTermination(60000)
    val rows = spark.table("sess_out").collect()
    assert(rows.map(_.getAs[Long]("n_events")).sorted.toSeq === Seq(1L, 2L))
  }

  test("streaming session_window agrees with batch Sessionize on real events") {
    import org.apache.spark.sql.functions._
    // same gap rule, two surfaces: batch ops.Sessionize (lag + running
    // sum) vs Structured Streaming session_window. Boundary note: an
    // event EXACTLY gap after its predecessor joins the session in
    // batch (gap > threshold opens) but opens a new window in
    // session_window (strict merge t2 < t1+gap); the real events data
    // has no exact-1800s gaps, so counts must match bit-for-bit.
    // Tables.events absorbs the testdata's ts physical type (legacy
    // long-nanos vs TIMESTAMP_NTZ) the same way every query does.
    val src = graft.sources.Tables.events(spark, sf)
      .filter(col("user_id") < 20)
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"), col("event_id"))
    val srcDir = Files.createTempDirectory("graft-sess-parity").toString
    src.write.parquet(srcDir + "/f1")

    val batch = graft.ops.Sessionize.profile(src, "user_id", "ts", "event_id",
      maxGapUs = 1800L * 1000000L)
      .select(col("user_id"), col("n_sessions")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    val stream = spark.readStream.schema(src.schema).parquet(srcDir + "/*")
    val ckpt = Files.createTempDirectory("graft-sess-parity-ckpt").toString
    val q = StreamingLift.sessionCounts(stream, "ts", "user_id", gap = "30 minutes")
      .writeStream.outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .format("memory").queryName("sess_parity_out").start()
    q.awaitTermination(120000)
    val streaming = spark.table("sess_parity_out")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_sessions"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(streaming === batch)
    assert(batch.nonEmpty)
  }

  test("runningCounts: mapGroupsWithState accumulates across micro-batches") {
    val srcDir = Files.createTempDirectory("graft-state").toString
    val schema = events(Nil).schema
    events(Seq(
      (1L, ts("2024-01-01 10:00:00"), "u1"),
      (1L, ts("2024-01-01 10:05:00"), "u1"),
      (2L, ts("2024-01-01 10:01:00"), "u2"))).write.parquet(srcDir + "/f1")

    val stream = spark.readStream.schema(schema).parquet(srcDir + "/*")
    val q = StreamingLift.runningCounts(stream, "v", "ts")
      .writeStream.outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("graft-state-ckpt").toString)
      .format("memory").queryName("state_out").start()
    q.processAllAvailable()
    events(Seq((1L, ts("2024-01-01 11:00:00"), "u1"))).write.parquet(srcDir + "/f2")
    q.processAllAvailable()
    q.stop()

    // memory sink in update mode appends each update; the LAST row per
    // key is the current state
    val last = spark.table("state_out").collect()
      .map(r => (r.getAs[String]("v"), r.getAs[Long]("n_events")))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    assert(last("u1") === 3L, "state must accumulate across batches")
    assert(last("u2") === 1L)
  }

  test("closedSessions: flatMapGroupsWithState emits each session exactly once") {
    val srcDir = Files.createTempDirectory("graft-close").toString
    val schema = events(Nil).schema
    // batch 1: user 1 has two events in one session; user 2 one event
    events(Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, ts("2024-01-01 10:05:00"), "b"),
      (2L, ts("2024-01-01 10:02:00"), "c"))).write.parquet(srcDir + "/f1")
    val stream = spark.readStream.schema(schema).parquet(srcDir + "/*")
    val q = StreamingLift.closedSessions(stream, "user_id", "ts",
        gapMs = 1800000L, watermarkDelay = "0 seconds")
      .writeStream.outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-close-ckpt").toString)
      .format("memory").queryName("close_out").start()
    q.processAllAvailable()
    assert(spark.table("close_out").isEmpty, "open sessions must not emit")
    // batch 2: an over-gap event for user 1 closes their session INLINE
    // and advances the watermark to 12:00
    events(Seq((1L, ts("2024-01-01 12:00:00"), "d"))).write.parquet(srcDir + "/f2")
    q.processAllAvailable()
    // batch 3: an unrelated event advances the watermark to 14:00 —
    // draining all batches times out user 2's idle session (end + gap
    // = 10:32) AND user 1's 12:00 singleton (12:30); only user 3's
    // fresh session (timeout 14:30) stays open and unemitted
    events(Seq((3L, ts("2024-01-01 14:00:00"), "e"))).write.parquet(srcDir + "/f3")
    q.processAllAvailable()
    q.stop()
    val got = spark.table("close_out").collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[Timestamp]("session_start").toString,
        r.getAs[Timestamp]("session_end").toString,
        r.getAs[Long]("n_events"))).sortBy(x => (x._1, x._2)).toSeq
    assert(got === Seq(
      (1L, "2024-01-01 10:00:00.0", "2024-01-01 10:05:00.0", 2L),
      (1L, "2024-01-01 12:00:00.0", "2024-01-01 12:00:00.0", 1L),
      (2L, "2024-01-01 10:02:00.0", "2024-01-01 10:02:00.0", 1L)))
  }

  test("attachStreams mirrors micro-batch progress into the audit shape") {
    import graft.engine.AuditSink
    val srcDir = Files.createTempDirectory("graft-audit-src").toString
    events(Seq((1L, ts("2024-01-01 10:00:00"), "a"))).write.parquet(srcDir + "/f1")
    val sink = new AuditSink(spark)
    val listener = sink.attachStreams()
    try {
      val stream = spark.readStream.schema(events(Nil).schema).parquet(srcDir + "/*")
      val q = stream.writeStream.outputMode("append")
        .option("checkpointLocation", Files.createTempDirectory("graft-audit-ck").toString)
        .format("memory").queryName("audit_probe").start()
      q.processAllAvailable()
      q.stop()
      q.awaitTermination(60000)
      // listener events are delivered asynchronously on the listener bus
      val deadline = System.currentTimeMillis() + 30000
      def states() = sink.toDf.select("state").collect().map(_.getString(0)).toSet
      while (!states().contains("streamTerminated") &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      val got = sink.toDf
      assert(got.filter(got("state") === "streamProgress")
        .filter(got("name") === "audit_probe").count() >= 1,
        "per-micro-batch progress event")
      assert(got.filter(got("state") === "streamTerminated").count() >= 1)
      assert(got.columns.toSeq === Seq("state", "time", "name", "duration", "data"),
        "same audit row shape as the batch books")
    } finally spark.streams.removeListener(listener)
  }

  test("closedSessions: late cross-batch events extend or emit, never corrupt") {
    val srcDir = Files.createTempDirectory("graft-late").toString
    val schema = events(Nil).schema
    events(Seq((1L, ts("2024-01-01 12:00:00"), "a"))).write.parquet(srcDir + "/f1")
    val stream = spark.readStream.schema(schema).parquet(srcDir + "/*")
    val q = StreamingLift.closedSessions(stream, "user_id", "ts",
        gapMs = 1800000L, watermarkDelay = "2 hours")
      .writeStream.outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-late-ckpt").toString)
      .format("memory").queryName("late_out").start()
    q.processAllAvailable()
    // batch 2, both LATE but above the 10:00 watermark (12:00 - 2h;
    // anything older is dropped by Spark's late-row filter before the
    // state function ever sees it): 11:50 is in-gap before the open
    // session's start → extends it backward; 10:30 is beyond the gap
    // in the past → its own closed singleton
    events(Seq(
      (1L, ts("2024-01-01 11:50:00"), "b"),
      (1L, ts("2024-01-01 10:30:00"), "c"))).write.parquet(srcDir + "/f2")
    q.processAllAvailable()
    // batch 3: unrelated user advances the watermark to 14:00, timing
    // out user 1's open session (end 12:00 + gap = 12:30)
    events(Seq((2L, ts("2024-01-01 16:00:00"), "d"))).write.parquet(srcDir + "/f3")
    q.processAllAvailable()
    q.stop()
    val got = spark.table("late_out").collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[Timestamp]("session_start").toString,
        r.getAs[Timestamp]("session_end").toString,
        r.getAs[Long]("n_events"))).sortBy(x => (x._1, x._2)).toSeq
    assert(got === Seq(
      (1L, "2024-01-01 10:30:00.0", "2024-01-01 10:30:00.0", 1L),
      (1L, "2024-01-01 11:50:00.0", "2024-01-01 12:00:00.0", 2L)))
  }

  test("intervalJoin matches right events within the horizon only") {
    val impDir = Files.createTempDirectory("graft-ij-imp").toString
    val clkDir = Files.createTempDirectory("graft-ij-clk").toString
    val schema = events(Nil).schema
    // impressions (left) and clicks (right) on the same schema
    events(Seq(
      (1L, ts("2024-01-01 10:00:00"), "imp_a"),
      (2L, ts("2024-01-01 10:00:00"), "imp_b"),
      (3L, ts("2024-01-01 10:00:00"), "imp_c"))).write.parquet(impDir + "/f1")
    events(Seq(
      (1L, ts("2024-01-01 10:04:00"), "clk_in"),      // within 10 min
      (2L, ts("2024-01-01 10:20:00"), "clk_late"),    // past the horizon
      (1L, ts("2024-01-01 09:59:00"), "clk_before"))) // before the impression
      .write.parquet(clkDir + "/f1")
    val imp = spark.readStream.schema(schema).parquet(impDir + "/*")
      .toDF("user_id", "imp_ts", "imp_v")
    val clk = spark.readStream.schema(schema).parquet(clkDir + "/*")
      .toDF("user_id", "clk_ts", "clk_v")
    val joined = StreamingLift.intervalJoin(imp, clk, "user_id",
        "imp_ts", "clk_ts", horizon = "10 minutes")
      .select($"l.user_id", $"imp_v", $"clk_v")
    val q = joined.writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ij-ckpt").toString)
      .format("memory").queryName("ij_out").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ij_out").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got === Set((1L, "imp_a", "clk_in")),
      "only the in-horizon, same-key click joins")
  }

  test("dedupStream drops cross-batch re-deliveries within the watermark") {
    val srcDir = Files.createTempDirectory("graft-dedup").toString
    val schema = events(Nil).schema
    events(Seq(
      (1L, ts("2024-01-01 10:00:00"), "first"),
      (1L, ts("2024-01-01 10:01:00"), "dup-within-batch"),
      (2L, ts("2024-01-01 10:02:00"), "other")))
      .write.parquet(srcDir + "/f1")
    // memory sinks cannot recover a checkpoint, so keep ONE live query
    // and feed it two micro-batches.
    val q = StreamingLift.dedupStream(spark, srcDir + "/*", schema, "user_id", "ts")
      .writeStream.outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-dedup-ckpt").toString)
      .format("memory").queryName("dedup_out").start()
    q.processAllAvailable()
    // re-delivery of key 1 in a later batch, still within the watermark
    events(Seq((1L, ts("2024-01-01 10:03:00"), "dup-across-batch")))
      .write.parquet(srcDir + "/f2")
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup_out").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("v"))).sorted.toSeq
    // within a batch the surviving row is arbitrary (processing order,
    // not event time); the contract is ONE emission per key and the
    // cross-batch re-delivery dropped.
    assert(got.map(_._1) === Seq(1L, 2L), "exactly one emission per key")
    assert(!got.exists(_._2 == "dup-across-batch"), "later re-delivery must be dropped")
  }

  test("enrichAsOf joins each event to the dimension version valid at its event time") {
    val srcDir = Files.createTempDirectory("graft-asof-src").toString
    val schema = events(Nil).schema
    // SCD2 dimension: user 1 was "bronze" until 10:05, "gold" after
    // (open validity); user 2 has one closed version only
    val dim = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 10:05:00"), "bronze"),
      (1L, ts("2024-01-01 10:05:00"), null.asInstanceOf[Timestamp], "gold"),
      (2L, ts("2024-01-01 00:00:00"), ts("2024-01-01 10:00:00"), "trial")
    ).toDF("user_id", "valid_from", "valid_to", "tier")
    events(Seq(
      (1L, ts("2024-01-01 10:00:00"), "early"), // bronze era
      (1L, ts("2024-01-01 10:05:00"), "boundary"), // valid_to is exclusive → gold
      (1L, ts("2024-01-01 11:00:00"), "late"), // gold era (open version)
      (2L, ts("2024-01-01 12:00:00"), "expired"), // no valid version → null
      (3L, ts("2024-01-01 12:00:00"), "unknown") // key absent → null
    )).write.parquet(srcDir + "/f1")
    val stream = spark.readStream.schema(schema).parquet(srcDir + "/*")
    val enriched = StreamingLift.enrichAsOf(stream, dim,
      keyCol = "user_id", tsCol = "ts",
      validFrom = "valid_from", validTo = "valid_to")
    val q = enriched.writeStream.format("memory").queryName("asof_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("asof_out").collect()
      .map(r => r.getAs[String]("v") -> Option(r.getAs[String]("tier"))).toMap
    assert(got === Map("early" -> Some("bronze"), "boundary" -> Some("gold"),
      "late" -> Some("gold"), "expired" -> None, "unknown" -> None))
    // left join: every event emits exactly once
    assert(spark.table("asof_out").count() === 5)
  }

  test("curationStream gates quality, dedups within and across batches, and ledgers every drop") {
    val srcDir = Files.createTempDirectory("graft-cur-src").toString
    val ckpt = Files.createTempDirectory("graft-cur-ckpt").toString
    val base = Files.createTempDirectory("graft-cur-dst")
    val dest = ParquetTable(spark, base.resolve("corpus").toString)
    val audit = ParquetTable(spark, base.resolve("ledger").toString)
    val stop = Seq("the", "a", "of", "and", "to", "in")
    val good1 = "the quick brown fox jumps over the lazy dog again and again"
    val good2 = "a different corpus document with the usual stopwords in it and more"
    def docs(rows: Seq[(Long, String)]): DataFrame = rows.toDF("doc_id", "text")
    val schema = docs(Nil).schema

    // batch 1: one good doc, one exact in-batch duplicate of it under
    // another id, one too-short (quality-gated) doc
    docs(Seq((1L, good1), (2L, good1), (3L, "too short")))
      .write.parquet(srcDir + "/f1")
    val q1 = StreamingLift.curationStream(spark, srcDir + "/*", schema,
      dest, audit, "doc_id", "text", stop, ckpt)
    q1.awaitTermination()
    assert(dest.read.select("doc_id").collect().map(_.getLong(0)).toSeq === Seq(1L))

    // batch 2: a re-crawl of good1 under a NEW id (corpus dup) + a
    // genuinely new good doc
    docs(Seq((10L, good1), (11L, good2))).write.parquet(srcDir + "/f2")
    val q2 = StreamingLift.curationStream(spark, srcDir + "/*", schema,
      dest, audit, "doc_id", "text", stop, ckpt)
    q2.awaitTermination()
    assert(dest.read.select("doc_id").collect().map(_.getLong(0)).sorted
      === Seq(1L, 11L))
    // persisted content hashes back the cross-batch probe
    assert(dest.read.columns.contains("__content_hash"))

    // the ledger accounts for every drop, batch by batch
    // (in, lowq, blocklisted, batchdup, corpusdup, loaded)
    val ledger = audit.read.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6))).toMap
    assert(ledger(0L) === ((3L, 1L, 0L, 1L, 0L, 1L)))
    assert(ledger(1L) === ((2L, 0L, 0L, 0L, 1L, 1L)))

    // replay with a FRESH checkpoint (same files): data path stays
    // exactly-once — nothing new lands
    val ckpt2 = Files.createTempDirectory("graft-cur-ckpt2").toString
    val q3 = StreamingLift.curationStream(spark, srcDir + "/*", schema,
      dest, audit, "doc_id", "text", stop, ckpt2)
    q3.awaitTermination()
    assert(dest.read.select("doc_id").collect().map(_.getLong(0)).sorted
      === Seq(1L, 11L))
  }

  test("side-output views: crash-window replays collapse to the exactly-once " +
      "set while raw output shows the duplicates") {
    import org.apache.spark.sql.functions.col
    val srcDir = Files.createTempDirectory("graft-view-src").toString
    val ckpt = Files.createTempDirectory("graft-view-ckpt").toString
    val base = Files.createTempDirectory("graft-view-dst")
    val dest = ParquetTable(spark, base.resolve("corpus").toString)
    val audit = ParquetTable(spark, base.resolve("ledger").toString)
    val stop = Seq("the", "a", "of", "and", "to", "in")
    val good1 = "the quick brown fox jumps over the lazy dog again and again"
    val good2 = "a different corpus document with the usual stopwords in it and more"
    def docs(rows: Seq[(Long, String)]): DataFrame = rows.toDF("doc_id", "text")
    val schema = docs(Nil).schema
    def run(at: String): Unit = StreamingLift.curationStream(spark,
      srcDir + "/*", schema, dest, audit, "doc_id", "text", stop, at)
      .awaitTermination()

    docs(Seq((1L, good1))).write.parquet(srcDir + "/f1"); run(ckpt)
    docs(Seq((10L, good1), (11L, good2))).write.parquet(srcDir + "/f2")
    run(ckpt)
    // inject the crash: the driver died between batch 1's ledger append
    // and its checkpoint commit. Simulated as a RESTART: clone the
    // checkpoint minus commits/1 to a fresh path (Spark 4 caches the
    // commit log per checkpoint path, so in-place deletion on a live
    // session reads as concurrent modification, not a crash) — the
    // clone replays batch 1 under the SAME batch id
    val ckpt2 = Files.createTempDirectory("graft-view-ckpt2").toString
    val srcRoot = java.nio.file.Paths.get(ckpt)
    java.nio.file.Files.walk(srcRoot).forEach { p =>
      val t = java.nio.file.Paths.get(ckpt2).resolve(srcRoot.relativize(p))
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    assert(new java.io.File(ckpt2 + "/commits/1").delete(),
      "commit file for batch 1 must exist to be deleted")
    // the local ChecksumFileSystem's shadow file would otherwise make
    // the replay's commit write fail as FileAlreadyExists
    new java.io.File(ckpt2 + "/commits/.1.crc").delete()
    run(ckpt2)
    // data path exactly-once: the replay loaded nothing new
    assert(dest.read.select("doc_id").collect().map(_.getLong(0)).sorted
      === Seq(1L, 11L))
    // RAW ledger is at-least-once: two rows for batch 1 — the original
    // (loaded=1, corpus-dup=1) and the replay (loaded=0, corpus-dup=2,
    // having observed its own docs already in the corpus)
    val raw = audit.read.filter(col("batch_id") === 1L).collect()
      .map(r => (r.getLong(5), r.getLong(6))).toSet
    assert(raw === Set((1L, 1L), (2L, 0L)),
      s"raw ledger must show the non-identical replay row, got $raw")
    // ledgerView reconstructs the truthful original row per batch —
    // grouped on (lineage, batch_id); the crash clone copied the
    // checkpoint's _GRAFT_LINEAGE, so the replay folds with the
    // original instead of forking a new lineage
    assert(StreamingLift.ledgerView(audit).select("lineage")
      .distinct().count() === 1L,
      "a cloned checkpoint must carry the SAME lineage id")
    val view = StreamingLift.ledgerView(audit)
      .select("batch_id", "n_input", "n_low_quality", "n_blocklisted",
        "n_dup_in_batch", "n_dup_in_corpus", "n_loaded")
      .collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(view.size === 2)
    assert(view(0L) === ((1L, 0L, 0L, 0L, 0L, 1L)))
    assert(view(1L) === ((2L, 0L, 0L, 0L, 1L, 1L)),
      "view must reconstruct batch 1's original (loaded=1) row")

    // pairsView: bit-identical replayed side-output rows collapse. A
    // nearDup/span/drift replay re-appends rows identical by
    // construction (computed against the unchanged pre-publish index);
    // injecting a copy of an existing batch's rows is exactly that.
    val pairs = ParquetTable(spark, base.resolve("pairs").toString)
    import spark.implicits._
    val rows = Seq((1L, 2L, "in_batch", 0L), (1L, 4L, "vs_corpus", 1L))
      .toDF("doc_a", "doc_b", "pair_kind", "batch_id")
    pairs.append(rows)
    pairs.append(rows.filter(col("batch_id") === 1L)) // the replay
    assert(pairs.read.count() === 3L, "raw output keeps the duplicate")
    assert(StreamingLift.pairsView(pairs).count() === 2L,
      "the view is the exactly-once set")

    // recordDrift's table overload reads through the view: one event
    // per alert, not per appended copy
    val alerts = ParquetTable(spark, base.resolve("alerts").toString)
    val alertRows = Seq((0L, "g", 5L, 5L, 900000L, true))
      .toDF("batch_id", "src", "n_batch", "n_hist", "tvd_ppm", "alerted")
    alerts.append(alertRows); alerts.append(alertRows) // replayed copy
    val sink = new graft.engine.AuditSink(spark)
    assert(sink.recordDrift(alerts, "src") === 1,
      "table-overload recordDrift must collapse the replayed alert row")
  }

  test("curationStream blocklist gate drops banned docs and ledgers them") {
    val srcDir = Files.createTempDirectory("graft-curb-src").toString
    val ckpt = Files.createTempDirectory("graft-curb-ckpt").toString
    val base = Files.createTempDirectory("graft-curb-dst")
    val dest = ParquetTable(spark, base.resolve("corpus").toString)
    val audit = ParquetTable(spark, base.resolve("ledger").toString)
    val stop = Seq("the", "a", "of", "and", "to", "in")
    val clean = "the quick brown fox jumps over the lazy dog again and again"
    val banned = "the quick brown fox shares a banned phrase in the middle of it"
    def docs(rows: Seq[(Long, String)]): DataFrame = rows.toDF("doc_id", "text")
    docs(Seq((1L, clean), (2L, banned), (3L, "too short")))
      .write.parquet(srcDir + "/f1")
    StreamingLift.curationStream(spark, srcDir + "/*", docs(Nil).schema,
      dest, audit, "doc_id", "text", stop, ckpt,
      blocklist = Seq("banned phrase")).awaitTermination()
    assert(dest.read.select("doc_id").collect().map(_.getLong(0)).toSeq
      === Seq(1L))
    val r = audit.read.head()
    // (in=3, lowq=1, blocklisted=1, batchdup=0, corpusdup=0, loaded=1)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6)) === ((3L, 1L, 1L, 0L, 0L, 1L)))
  }

  test("histDriftStream: exact integer TVD, zero on same-dist, full on disjoint") {
    import org.apache.spark.sql.functions.col
    val base = Files.createTempDirectory("graft-drift")
    val srcDir = base.resolve("src").toString
    val states = ParquetTable(spark, base.resolve("st").toString)
    val alerts = ParquetTable(spark, base.resolve("al").toString)
    val ckpt = base.resolve("ckpt").toString
    def rows(vs: Seq[Long]): DataFrame =
      vs.map(v => ("g", v)).toDF("src", "x")
    val schema = rows(Nil).schema
    def run(): Unit =
      StreamingLift.histDriftStream(spark, srcDir + "/*", schema, states,
        alerts, "src", "x", ckpt).awaitTermination(60000)
    def alertRows() = alerts.read.collect().map(r => r.getLong(0) ->
      ((r.getLong(2), if (r.isNullAt(4)) -1L else r.getLong(4),
        r.getBoolean(5)))).toMap

    rows(1L to 15L).write.parquet(srcDir + "/f1")
    run()
    assert(alertRows() === Map(0L -> ((15L, -1L, false))),
      "first sight of a group: no baseline, no drift verdict")

    // identical distribution → TVD is exactly 0
    rows(1L to 15L).write.parquet(srcDir + "/f2")
    run()
    assert(alertRows()(1L) === ((15L, 0L, false)))

    // fully disjoint buckets → TVD is exactly 1,000,000 ppm
    rows((1L to 15L).map(_ + 100000L)).write.parquet(srcDir + "/f3")
    run()
    assert(alertRows()(2L) === ((15L, 1000000L, true)))

    // the baseline folded every batch: total mass = 45
    val mass = states.read
      .select(org.apache.spark.sql.functions.aggregate(col("st"),
        org.apache.spark.sql.functions.lit(0L), (a, x) => a + x).as("m"))
      .head().getLong(0)
    assert(mass === 45L)

    // a batch whose group carries only NULL values has zero mass:
    // no verdict (NULL tvd), never a divide-by-zero stream crash
    Seq(("g", None: Option[Long])).toDF("src", "x")
      .write.parquet(srcDir + "/f4")
    run()
    assert(alertRows()(3L) === ((0L, -1L, false)))
  }

  test("curationStream heals a pre-widening 6-column audit ledger before appending") {
    import org.apache.spark.sql.functions.col
    val base = Files.createTempDirectory("graft-cur-legacy")
    val srcDir = base.resolve("src").toString
    val dest = ParquetTable(spark, base.resolve("dest").toString)
    val audit = ParquetTable(spark, base.resolve("audit").toString)
    // a ledger written before the blocklist gate existed: 6 columns
    audit.append(Seq((-1L, 5L, 2L, 1L, 0L, 2L))
      .toDF("batch_id", "n_input", "n_low_quality",
        "n_dup_in_batch", "n_dup_in_corpus", "n_loaded"))
    assert(!audit.read.columns.contains("n_blocklisted"))
    val good = "useful sentence with the stopwords and plenty of " +
      "varied readable words to pass every gopher gate easily " * 3
    val b = Seq((1L, good)).toDF("doc_id", "text")
    b.write.parquet(srcDir + "/f1")
    StreamingLift.curationStream(spark, srcDir + "/*", b.schema, dest,
      audit, "doc_id", "text", Seq("the", "and", "of", "to", "with"),
      base.resolve("ckpt").toString, blocklist = Seq("never matches"))
      .awaitTermination(60000)
    // one coherent 7-column schema, no mixed-footer directory
    val rows = audit.read
      .select("batch_id", "n_input", "n_blocklisted", "n_loaded")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows(-1L) === ((5L, 0L, 2L)),
      "legacy row migrated with its true zero blocklist count")
    assert(rows(0L)._1 === 1L)
    assert(audit.read.columns.toSeq === Seq("batch_id", "n_input",
      "n_low_quality", "n_blocklisted", "n_dup_in_batch",
      "n_dup_in_corpus", "n_loaded", "lineage"))
    // the legacy row healed with the empty lineage; the new row
    // carries the checkpoint's
    assert(audit.read.filter(col("batch_id") === -1L)
      .head().getAs[String]("lineage") === "")
    assert(audit.read.filter(col("batch_id") === 0L)
      .head().getAs[String]("lineage").nonEmpty)
  }

  test("histDriftStream: TVD stays exact past the long cross-multiplication range") {
    import org.apache.spark.sql.functions.col
    val base = Files.createTempDirectory("graft-drift-big")
    val srcDir = base.resolve("src").toString
    val states = ParquetTable(spark, base.resolve("st").toString)
    val alerts = ParquetTable(spark, base.resolve("al").toString)
    val ckpt = base.resolve("ckpt").toString
    // seed the baseline with weighted mass 4e18 at value 1: every
    // c·n cross-product with a batch now exceeds 2^63, where the old
    // LongType zip_with wrapped silently into wrong tvd_ppm
    val H = 4000000000000000000L
    states.overwrite(Seq(("g", 1L, H)).toDF("src", "x", "w")
      .groupBy(col("src"))
      .agg(graft.functions.SketchAgg.logHistSketchW(col("x"), col("w")).as("st")))
    val schema = Seq(("g", 1L)).toDF("src", "x").schema
    def run(): Unit =
      StreamingLift.histDriftStream(spark, srcDir + "/*", schema, states,
        alerts, "src", "x", ckpt).awaitTermination(60000)
    // batch 1: same bucket as the entire baseline → TVD exactly 0
    Seq(("g", 1L), ("g", 1L), ("g", 1L)).toDF("src", "x")
      .write.parquet(srcDir + "/f1")
    run()
    val r1 = alerts.read.filter(col("batch_id") === 0L).head()
    assert(r1.getLong(2) === 3L && r1.getLong(3) === H)
    assert(r1.getLong(4) === 0L && !r1.getBoolean(5))
    // batch 2: fully disjoint bucket → TVD exactly 1,000,000 ppm
    Seq(("g", 1000000L)).toDF("src", "x").write.parquet(srcDir + "/f2")
    run()
    val r2 = alerts.read.filter(col("batch_id") === 1L).head()
    assert(r2.getLong(3) === H + 3L)
    assert(r2.getLong(4) === 1000000L && r2.getBoolean(5))
  }

  test("histDriftStream: cross-bucket total mass past 2^63 fails loudly") {
    import org.apache.spark.sql.functions.col
    val base = Files.createTempDirectory("graft-drift-overflow")
    val srcDir = base.resolve("src").toString
    val states = ParquetTable(spark, base.resolve("st").toString)
    val alerts = ParquetTable(spark, base.resolve("al").toString)
    val ckpt = base.resolve("ckpt").toString
    // two DISJOINT buckets each holding ~6.9e18 — every per-bucket
    // counter respects the sketch's addExact bound, but their SUM
    // exceeds Long.MaxValue: a plain long fold would wrap n_hist
    // silently (wrong tvd_ppm, missed alerts); the guard must fail
    // LOUDLY instead
    val W = 6000000000000000000L
    states.overwrite(Seq(("g", 1L, W), ("g", 1000000L, W))
      .toDF("src", "x", "w")
      .groupBy(col("src"))
      .agg(graft.functions.SketchAgg.logHistSketchW(col("x"), col("w")).as("st")))
    val schema = Seq(("g", 1L)).toDF("src", "x").schema
    Seq(("g", 1L)).toDF("src", "x").write.parquet(srcDir + "/f1")
    val ex = intercept[Exception] {
      StreamingLift.histDriftStream(spark, srcDir + "/*", schema, states,
        alerts, "src", "x", ckpt).awaitTermination(60000)
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++
        messages(e.getCause))
    val msg = messages(ex).mkString("\n")
    assert(msg.contains("cross-bucket total mass"),
      s"overflowing total mass must fail loudly, got: $msg")
  }

  test("nearDupStream: in-batch + vs-corpus candidates, exactly-once index") {
    import org.apache.spark.sql.functions.col
    import graft.ops.Dedup
    val base = Files.createTempDirectory("graft-nd-stream")
    val srcDir = base.resolve("src").toString
    val index = ParquetTable(spark, base.resolve("idx").toString)
    val pairsOut = ParquetTable(spark, base.resolve("pairs").toString)
    def docs(rows: (Long, String)*): DataFrame = rows.toDF("doc_id", "text")
    val t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val t2 = "completely different words nothing shared with anything here now"
    val b1 = docs(1L -> t1, 2L -> t1, 3L -> t2)
    b1.write.parquet(srcDir + "/f1")
    val schema = b1.schema
    val ckpt = base.resolve("ckpt").toString

    StreamingLift.nearDupStream(spark, srcDir + "/*", schema, index,
      pairsOut, "doc_id", "text", ckpt).awaitTermination(60000)
    def pairs() = pairsOut.read.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(pairs() === Set((1L, 2L, "in_batch", 0L)))
    def keysOf(df: DataFrame) = Dedup.bandKeyRows(df, "doc_id", "text")
      .distinct().collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    def indexSet() = index.read.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(indexSet() === keysOf(b1))

    // batch 2: doc 4 re-crawls t1, doc 5 re-crawls t2 — both must pair
    // against HISTORY without the corpus being re-signed
    val b2 = docs(4L -> t1, 5L -> t2)
    b2.write.parquet(srcDir + "/f2")
    StreamingLift.nearDupStream(spark, srcDir + "/*", schema, index,
      pairsOut, "doc_id", "text", ckpt).awaitTermination(60000)
    assert(pairs() === Set(
      (1L, 2L, "in_batch", 0L),
      (1L, 4L, "vs_corpus", 1L), (2L, 4L, "vs_corpus", 1L),
      (3L, 5L, "vs_corpus", 1L)))
    val fullIndex = keysOf(b1.unionByName(b2))
    assert(indexSet() === fullIndex)

    // fresh checkpoint replays everything as batch 0: the index publish
    // is skipped (exactly-once), pairs replay at-least-once by design
    val ckpt2 = Files.createTempDirectory("graft-nd-ckpt2").toString
    StreamingLift.nearDupStream(spark, srcDir + "/*", schema, index,
      pairsOut, "doc_id", "text", ckpt2).awaitTermination(60000)
    assert(indexSet() === fullIndex, "replay must not perturb the index")
    assert(pairsOut.read.filter(col("pair_kind") === "in_batch").count() >= 1)
  }

  test("spanDedupStream maintains the window index and reports spans per batch") {
    import org.apache.spark.sql.functions._
    val base = Files.createTempDirectory("graft-span-stream")
    val srcDir = base.resolve("src").toString
    val index = ParquetTable(spark, base.resolve("idx").toString)
    val spansOut = ParquetTable(spark, base.resolve("spans").toString)
    def docs(rows: (Long, String)*): DataFrame = rows.toDF("doc_id", "text")
    val b1 = docs(
      1L -> "alpha beta gamma delta unique one",
      2L -> "totally different content here now")
    val b2 = docs(
      // repeats doc 1's 4-token prefix → a 4-token span on BOTH docs
      3L -> "pre alpha beta gamma delta post",
      4L -> "nothing shared with anyone else at all")
    b1.write.parquet(srcDir + "/f1")
    val schema = b1.schema
    // ONE checkpoint across invocations — the authoritative record of
    // which files were ingested (reprocessing a batch would violate
    // the disjoint-batch index contract)
    val ckpt = base.resolve("ckpt").toString

    val q1 = StreamingLift.spanDedupStream(spark, srcDir + "/*", schema,
      index, spansOut, "doc_id", "text", ckpt, k = 3, minDocs = 2)
    q1.awaitTermination()
    // batch 1 alone: no cross-doc repetition, no spans, index persisted
    assert(!spansOut.exists || spansOut.read.isEmpty)
    val idx1 = graft.ops.TextClean.spanIndex(b1, "doc_id", "text", k = 3)
      .collect().map(r => r.getAs[Array[Byte]](0).toSeq -> r.getLong(1)).toMap
    assert(index.read.collect()
      .map(r => r.getAs[Array[Byte]](0).toSeq -> r.getLong(1)).toMap === idx1)

    b2.write.parquet(srcDir + "/f2")
    val q2 = StreamingLift.spanDedupStream(spark, srcDir + "/*", schema,
      index, spansOut, "doc_id", "text", ckpt, k = 3, minDocs = 2)
    q2.awaitTermination()
    // batch 2 reports ITS duplicated span at full length against the
    // index — doc 1's matching text is found without rescanning it
    val got = spansOut.read
      .select("doc_id", "span_start", "span_len", "span_text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(got === Set((3L, 2L, 4L, "alpha beta gamma delta")))
    // the maintained index equals the from-scratch union index
    val unionIdx = graft.ops.TextClean.spanIndex(
        b1.unionByName(b2), "doc_id", "text", k = 3)
      .collect().map(r => r.getAs[Array[Byte]](0).toSeq -> r.getLong(1)).toMap
    assert(index.read.collect()
      .map(r => r.getAs[Array[Byte]](0).toSeq -> r.getLong(1)).toMap === unionIdx)

    // replay safety: a FRESH checkpoint reprocesses everything as
    // batch 0, but the live index's span_batch_id already covers it —
    // the batch is skipped, the index stays the union index, and no
    // duplicate spans land (the double-merge corruption a naive
    // re-merge would cause)
    val ckpt2 = base.resolve("ckpt2").toString
    val q3 = StreamingLift.spanDedupStream(spark, srcDir + "/*", schema,
      index, spansOut, "doc_id", "text", ckpt2, k = 3, minDocs = 2)
    q3.awaitTermination()
    assert(index.read.collect()
      .map(r => r.getAs[Array[Byte]](0).toSeq -> r.getLong(1)).toMap === unionIdx)
    assert(spansOut.read.count() === 1)
  }

  test("spanDedupStream compaction: reports identical across the boundary, state bounded") {
    import org.apache.spark.sql.functions._
    val base = Files.createTempDirectory("graft-span-compact")
    val srcDir = base.resolve("src").toString
    def docs(rows: (Long, String)*): DataFrame = rows.toDF("doc_id", "text")
    // three micro-batches: the shared phrase pairs in b2 (within the
    // 1-batch horizon) and again in b3 (retained forever once
    // n_docs >= 2); each batch also carries never-repeating junk that
    // only the compacting stream prunes
    val b1 = docs(1L -> "alpha beta gamma delta shared",
      2L -> "junk one singleton content xyz")
    val b2 = docs(3L -> "pre alpha beta gamma delta post",
      4L -> "other junk nobody repeats ever")
    val b3 = docs(5L -> "again alpha beta gamma delta end",
      6L -> "final junk also entirely unique")
    val schema = b1.schema
    // two parallel streams over the SAME source files: one unbounded
    // (default horizon), one compacting singletons after 1 batch
    case class S(tag: String, horizon: Long) {
      val index = ParquetTable(spark, base.resolve(s"idx-$tag").toString)
      val spans = ParquetTable(spark, base.resolve(s"spans-$tag").toString)
      val ckpt = base.resolve(s"ckpt-$tag").toString
      def run(): Unit = {
        val q = StreamingLift.spanDedupStream(spark, srcDir + "/*", schema,
          index, spans, "doc_id", "text", ckpt, k = 3, minDocs = 2,
          compactAfterBatches = horizon)
        q.awaitTermination()
      }
    }
    val full = S("full", Long.MaxValue)
    val compact = S("compact", 1L)
    Seq(b1 -> "f1", b2 -> "f2", b3 -> "f3").foreach { case (b, f) =>
      b.write.parquet(srcDir + "/" + f)
      full.run(); compact.run()
    }
    def spansOf(t: ParquetTable) = t.read
      .select("doc_id", "span_start", "span_len", "span_text", "batch_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4))).toSet
    // report-equivalence across the compaction boundary: every span
    // the unbounded stream reports, the compacting stream reports
    // bit-identically (all re-pairings here happen within the horizon
    // or against already-repeated windows)
    val got = spansOf(compact.spans)
    assert(got === spansOf(full.spans))
    assert(got.map(t => (t._1, t._4)) === Set(
      3L -> "alpha beta gamma delta", 5L -> "alpha beta gamma delta"))
    // the repeated windows survive compaction with their exact counts
    // (n_docs >= 2 rows are watermark-immune)...
    val keptRepeated = compact.index.read.filter(col("n_docs") >= 2)
      .collect().map(r => r.getAs[Array[Byte]](0).toSeq -> r.getLong(1)).toMap
    val fullRepeated = full.index.read.filter(col("n_docs") >= 2)
      .collect().map(r => r.getAs[Array[Byte]](0).toSeq -> r.getLong(1)).toMap
    assert(keptRepeated === fullRepeated && keptRepeated.nonEmpty)
    // ...while out-of-horizon singleton junk is gone: only b3's own
    // singletons (last_batch = 2 > watermark 1) remain
    val compactSingles = compact.index.read.filter(col("n_docs") === 1)
    assert(compactSingles.agg(min(col("last_batch"))).head().getLong(0) === 2L)
    assert(compactSingles.count() <
      full.index.read.filter(col("n_docs") === 1).count())
  }

  /** All live parquet data files under `root`, relative path → size. */
  private def parquetFiles(root: String): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    val base = java.nio.file.Paths.get(root)
    if (!java.nio.file.Files.exists(base)) Map.empty
    else {
      val s = java.nio.file.Files.walk(base)
      try s.iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .map(p => base.relativize(p).toString -> java.nio.file.Files.size(p))
        .toMap
      finally s.close()
    }
  }

  test("nearDupStream bucketed: reports identical to flat, publish appends only touched buckets") {
    import org.apache.spark.sql.functions._
    val base = Files.createTempDirectory("graft-nd-bucketed")
    val srcDir = base.resolve("src").toString
    def docs(rows: (Long, String)*): DataFrame = rows.toDF("doc_id", "text")
    val t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val t2 = "completely different words nothing shared with anything here now"
    val batches = Seq(
      docs(1L -> t1, 2L -> t1, 3L -> t2),
      docs(4L -> t1, 5L -> t2),
      docs(6L -> t1, 7L -> "yet another brand new unrelated document body text"))
    val schema = batches.head.schema
    case class S(tag: String, buckets: Int) {
      val index = ParquetTable(spark, base.resolve(s"idx-$tag").toString,
        buckets = buckets, bucketKey = "band_key")
      val pairs = ParquetTable(spark, base.resolve(s"pairs-$tag").toString)
      val ckpt = base.resolve(s"ckpt-$tag").toString
      def run(ck: String = ckpt): Unit =
        StreamingLift.nearDupStream(spark, srcDir + "/*", schema, index,
          pairs, "doc_id", "text", ck).awaitTermination(60000)
      def pairSet() = pairs.read.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
        .toSet
    }
    val flat = S("flat", 0)
    val buck = S("buck", 8)
    assert(buck.index.isBucketed && !flat.index.isBucketed)

    batches.zipWithIndex.foreach { case (b, i) =>
      b.write.parquet(srcDir + s"/f$i")
      val before = parquetFiles(buck.index.path)
      flat.run(); buck.run()
      // the two layouts report bit-identically, batch by batch
      assert(buck.pairSet() === flat.pairSet(), s"pair divergence at batch $i")
      // O(batch) publish: append-only — every pre-existing file of the
      // bucketed index survives the batch untouched (same path + size),
      // and new files land only in the buckets the batch's keys hash to
      val after = parquetFiles(buck.index.path)
      before.foreach { case (p, sz) =>
        assert(after.get(p).contains(sz), s"batch $i rewrote index file $p")
      }
      val touched = graft.ops.Dedup.bandKeyRows(b, "doc_id", "text")
        .select(pmod(hash(col("band_key")), lit(8)).as("b"))
        .distinct().collect().map(_.getInt(0)).toSet
      val newDirs = (after.keySet -- before.keySet).map(_.split("/").head)
      assert(newDirs.nonEmpty &&
        newDirs.forall(d => touched.contains(d.stripPrefix("__bucket=").toInt)),
        s"batch $i wrote outside its touched buckets: $newDirs vs $touched")
    }
    // vs_corpus pairs actually flowed (doc 6 pairs with 1, 2, 4 history)
    assert(buck.pairSet().exists(_._3 == "vs_corpus"))
    // consolidated index content matches the flat index exactly
    def keySet(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val flatKeys = keySet(flat.index.read)
    assert(keySet(StreamingLift.nearDupIndexView(buck.index, "doc_id")) === flatKeys)
    // fresh checkpoint replays everything as batch 0: the table-meta
    // applied-batch guard skips the publish; view unchanged
    buck.run(base.resolve("ckpt-replay").toString)
    assert(keySet(StreamingLift.nearDupIndexView(buck.index, "doc_id")) === flatKeys)
  }

  test("nearDupStream bucketed: overflow band collapses to a tombstone, never pairs again") {
    import org.apache.spark.sql.functions._
    val base = Files.createTempDirectory("graft-nd-tomb")
    val srcDir = base.resolve("src").toString
    def docs(rows: (Long, String)*): DataFrame = rows.toDF("doc_id", "text")
    val t = "omega psi chi phi upsilon tau sigma rho pi omicron"
    val schema = docs().schema
    case class S(tag: String, buckets: Int) {
      val index = ParquetTable(spark, base.resolve(s"idx-$tag").toString,
        buckets = buckets, bucketKey = "band_key")
      val pairs = ParquetTable(spark, base.resolve(s"pairs-$tag").toString)
      val ckpt = base.resolve(s"ckpt-$tag").toString
      def run(): Unit =
        StreamingLift.nearDupStream(spark, srcDir + "/*", schema, index,
          pairs, "doc_id", "text", ckpt, maxBucket = 2,
          compactFileThreshold = 0).awaitTermination(60000)
    }
    val flat = S("flat", 0)
    val buck = S("buck", 4)
    // batch 1: THREE copies of t — every band bucket is degenerate
    // (3 > maxBucket = 2): no in-batch pairs on either path
    docs(1L -> t, 2L -> t, 3L -> t).write.parquet(srcDir + "/f1")
    flat.run(); buck.run()
    assert(flat.pairs.read.isEmpty && buck.pairs.read.isEmpty)
    // compaction (forced by threshold 0) collapsed each overflow band
    // group to ONE tombstone row (NULL doc id) — state bounded, while
    // the flat index keeps all 3 rows per group forever
    val rows1 = buck.index.read.collect()
    assert(rows1.nonEmpty && rows1.forall(_.isNullAt(0)))
    val groups = rows1.map(r => (r.getInt(1), r.getString(2)))
    assert(groups.distinct.length === groups.length,
      "exactly one tombstone row per poisoned band group")
    assert(StreamingLift.nearDupIndexView(buck.index, "doc_id").isEmpty)
    // batch 2: a fourth copy — the poisoned bands must NOT pair on
    // either path (flat: probe count 3 > maxBucket; bucketed: tombstone)
    docs(4L -> t).write.parquet(srcDir + "/f2")
    flat.run(); buck.run()
    assert(flat.pairs.read.isEmpty && buck.pairs.read.isEmpty)
    // ...and re-compaction folds doc 4's appended keys back into the
    // tombstone: still one row per group
    val rows2 = buck.index.read.collect()
    assert(rows2.forall(_.isNullAt(0)) &&
      rows2.map(r => (r.getInt(1), r.getString(2))).distinct.length === rows2.length)
  }

  test("bandIndexProbe batch twin == the stream's vs_corpus pairs (q214's contract)") {
    import org.apache.spark.sql.functions.col
    import graft.ops.Dedup
    val base = Files.createTempDirectory("graft-nd-twin")
    val srcDir = base.resolve("src").toString
    val index = ParquetTable(spark, base.resolve("idx").toString,
      buckets = 8, bucketKey = "band_key")
    val pairsOut = ParquetTable(spark, base.resolve("pairs").toString)
    def docs(rows: (Long, String)*): DataFrame = rows.toDF("doc_id", "text")
    val t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val t2 = "completely different words nothing shared with anything here now"
    val b1 = docs(1L -> t1, 2L -> t1, 3L -> t2)
    val b2 = docs(4L -> t1, 5L -> t2)
    val schema = b1.schema
    val ckpt = base.resolve("ckpt").toString
    Seq(b1 -> "f1", b2 -> "f2").foreach { case (b, f) =>
      b.write.parquet(srcDir + "/" + f)
      StreamingLift.nearDupStream(spark, srcDir + "/*", schema, index,
        pairsOut, "doc_id", "text", ckpt).awaitTermination(60000)
    }
    val streamed = pairsOut.read
      .filter(col("pair_kind") === "vs_corpus" && col("batch_id") === 1L)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the batch operator replays the same probe relationally: corpus
    // index from batch 1, probe keys from batch 2 — pair-for-pair equal
    val twin = Dedup.bandIndexProbe(
        Dedup.bandKeyRows(b1, "doc_id", "text"),
        Dedup.bandKeyRows(b2, "doc_id", "text"), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === twin && twin.nonEmpty)
  }

  test("bucketed crash window: an appended-but-unstamped delta replays bit-identically") {
    import org.apache.spark.sql.functions._
    import graft.ops.{Dedup, TextClean}
    val base = Files.createTempDirectory("graft-crash-window")
    def docs(rows: (Long, String)*): DataFrame = rows.toDF("doc_id", "text")
    val t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b1 = docs(1L -> t1, 2L -> t1,
      3L -> "completely different words nothing shared with anything here now")
    val b2 = docs(4L -> t1, 5L -> "pre alpha beta gamma delta post tail")
    val schema = b1.schema

    // ---- nearDupStream: control (clean run) vs crashed publish -----
    case class ND(tag: String, poison: Boolean) {
      val index = ParquetTable(spark, base.resolve(s"nd-idx-$tag").toString,
        buckets = 8, bucketKey = "band_key")
      val pairs = ParquetTable(spark, base.resolve(s"nd-pairs-$tag").toString)
      val src = base.resolve(s"nd-src-$tag").toString
      val ckpt = base.resolve(s"nd-ckpt-$tag").toString
      def run(): Unit =
        StreamingLift.nearDupStream(spark, src + "/*", schema, index,
          pairs, "doc_id", "text", ckpt).awaitTermination(60000)
      def go(): Unit = {
        b1.write.parquet(src + "/f1"); run()
        if (poison)
          // simulate the crash: batch 1's delta APPENDED, the meta
          // stamp never written (meta still says batch 0) — the replay
          // must probe the exact pre-batch state and absorb the
          // re-append
          index.append(Dedup.bandKeyRows(b2, "doc_id", "text")
            .withColumn("src_batch", lit(1L))
            .repartition(8, index.bucketExpr))
        b2.write.parquet(src + "/f2"); run()
      }
      def pairSet() = pairs.read.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
        .toSet
    }
    val clean = ND("clean", poison = false)
    val crashed = ND("crash", poison = true)
    clean.go(); crashed.go()
    assert(crashed.pairSet() === clean.pairSet(),
      "replayed pairs must match a never-crashed run")
    def keySet(t: ParquetTable) =
      StreamingLift.nearDupIndexView(t, "doc_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(keySet(crashed.index) === keySet(clean.index),
      "the re-appended delta must consolidate away on read")

    // ---- spanDedupStream: same protocol ----------------------------
    case class SP(tag: String, poison: Boolean) {
      val index = ParquetTable(spark, base.resolve(s"sp-idx-$tag").toString,
        buckets = 4, bucketKey = "wh")
      val spans = ParquetTable(spark, base.resolve(s"sp-spans-$tag").toString)
      val src = base.resolve(s"sp-src-$tag").toString
      val ckpt = base.resolve(s"sp-ckpt-$tag").toString
      def run(): Unit =
        StreamingLift.spanDedupStream(spark, src + "/*", schema, index,
          spans, "doc_id", "text", ckpt, k = 3, minDocs = 2)
          .awaitTermination(60000)
      def go(): Unit = {
        b1.write.parquet(src + "/f1"); run()
        if (poison)
          index.append(TextClean.spanIndexAged(b2, "doc_id", "text",
              batchId = 1L, k = 3)
            .withColumn("src_batch", lit(1L))
            .repartition(4, index.bucketExpr))
        b2.write.parquet(src + "/f2"); run()
      }
      def spanSet() = spans.read
        .select("doc_id", "span_start", "span_len", "span_text", "batch_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3), r.getLong(4))).toSet
    }
    val spClean = SP("clean", poison = false)
    val spCrash = SP("crash", poison = true)
    spClean.go(); spCrash.go()
    assert(spCrash.spanSet() === spClean.spanSet() && spClean.spanSet().nonEmpty,
      "replayed spans must match a never-crashed run")
    def idxMap(t: ParquetTable) = StreamingLift.spanIndexView(t).collect()
      .map(r => r.getAs[Array[Byte]](0).toSeq -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(idxMap(spCrash.index) === idxMap(spClean.index),
      "counts must fold the crashed delta exactly once")
  }

  test("standalone compaction inside a crash window must not consolidate " +
      "the unstamped delta") {
    // the maintenance hazard: a publish APPENDED its delta
    // (src_batch = N) and crashed before the meta stamp; standalone
    // compaction 'between runs' would fold those rows to src_batch = -1,
    // and the replay's src_batch =!= N exclusion would then probe the
    // batch's own windows as corpus (spurious vs_corpus pairs,
    // double-counted n_docs). The compactors' watermark guard carries
    // unstamped rows through verbatim instead.
    import org.apache.spark.sql.functions._
    import graft.ops.{Dedup, TextClean}
    val base = Files.createTempDirectory("graft-crash-compact")
    def docs(rows: (Long, String)*): DataFrame = rows.toDF("doc_id", "text")
    val t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b1 = docs(1L -> t1, 2L -> t1,
      3L -> "completely different words nothing shared with anything here now")
    val b2 = docs(4L -> t1, 5L -> "pre alpha beta gamma delta post tail")
    val schema = b1.schema

    // ---- nearDupStream ---------------------------------------------
    case class ND(tag: String, poison: Boolean) {
      val index = ParquetTable(spark, base.resolve(s"nd-idx-$tag").toString,
        buckets = 8, bucketKey = "band_key")
      val pairs = ParquetTable(spark, base.resolve(s"nd-pairs-$tag").toString)
      val src = base.resolve(s"nd-src-$tag").toString
      val ckpt = base.resolve(s"nd-ckpt-$tag").toString
      def run(): Unit =
        StreamingLift.nearDupStream(spark, src + "/*", schema, index,
          pairs, "doc_id", "text", ckpt).awaitTermination(60000)
      def go(): Unit = {
        b1.write.parquet(src + "/f1"); run()
        if (poison) {
          index.append(Dedup.bandKeyRows(b2, "doc_id", "text")
            .withColumn("src_batch", lit(1L))
            .repartition(8, index.bucketExpr))
          // maintenance runs in the window, over EVERY bucket
          StreamingLift.compactNearDupIndex(index, "doc_id",
            maxBucket = 10000, bucketIds = index.bucketIds)
          assert(index.read.filter(col("src_batch") === 1L).count() > 0,
            "the unstamped delta must survive compaction un-consolidated")
        }
        b2.write.parquet(src + "/f2"); run()
      }
      def pairSet() = pairs.read.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
        .toSet
    }
    val clean = ND("clean", poison = false)
    val crashed = ND("crash", poison = true)
    clean.go(); crashed.go()
    assert(crashed.pairSet() === clean.pairSet(),
      "pairs after a mid-window compaction must match a never-crashed run")
    def keySet(t: ParquetTable) =
      StreamingLift.nearDupIndexView(t, "doc_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(keySet(crashed.index) === keySet(clean.index))

    // ---- spanDedupStream -------------------------------------------
    case class SP(tag: String, poison: Boolean) {
      val index = ParquetTable(spark, base.resolve(s"sp-idx-$tag").toString,
        buckets = 4, bucketKey = "wh")
      val spans = ParquetTable(spark, base.resolve(s"sp-spans-$tag").toString)
      val src = base.resolve(s"sp-src-$tag").toString
      val ckpt = base.resolve(s"sp-ckpt-$tag").toString
      def run(): Unit =
        StreamingLift.spanDedupStream(spark, src + "/*", schema, index,
          spans, "doc_id", "text", ckpt, k = 3, minDocs = 2)
          .awaitTermination(60000)
      def go(): Unit = {
        b1.write.parquet(src + "/f1"); run()
        if (poison) {
          index.append(TextClean.spanIndexAged(b2, "doc_id", "text",
              batchId = 1L, k = 3)
            .withColumn("src_batch", lit(1L))
            .repartition(4, index.bucketExpr))
          StreamingLift.compactSpanIndex(index,
            watermarkBatch = Long.MinValue, bucketIds = index.bucketIds)
          assert(index.read.filter(col("src_batch") === 1L).count() > 0,
            "the unstamped delta must survive compaction un-consolidated")
        }
        b2.write.parquet(src + "/f2"); run()
      }
      def spanSet() = spans.read
        .select("doc_id", "span_start", "span_len", "span_text", "batch_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3), r.getLong(4))).toSet
    }
    val spClean = SP("clean", poison = false)
    val spCrash = SP("crash", poison = true)
    spClean.go(); spCrash.go()
    assert(spCrash.spanSet() === spClean.spanSet() && spClean.spanSet().nonEmpty,
      "spans after a mid-window compaction must match a never-crashed run")
    def idxMap(t: ParquetTable) = StreamingLift.spanIndexView(t).collect()
      .map(r => r.getAs[Array[Byte]](0).toSeq -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(idxMap(spCrash.index) === idxMap(spClean.index),
      "counts must fold the crashed delta exactly once despite compaction")
  }

  test("migrateIndex: flat→bucketed reports stay bit-identical and the " +
      "stream resumes exactly-once on the same checkpoint") {
    import org.apache.spark.sql.functions._
    val base = Files.createTempDirectory("graft-migrate")
    def docs(rows: (Long, String)*): DataFrame = rows.toDF("doc_id", "text")
    val t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b1 = docs(1L -> t1,
      2L -> "completely different words nothing shared with anything here now")
    val b2 = docs(4L -> t1,
      5L -> "yet another unrelated document body with its own vocabulary set")
    val b3 = docs(6L -> t1, 7L -> t1,
      8L -> "final filler document sharing nothing with the earlier feed")
    val schema = b1.schema
    def cloneCkptWithout(ckpt: String, commit: Long): String = {
      val to = Files.createTempDirectory("graft-migrate-ck").toString
      val root = java.nio.file.Paths.get(ckpt)
      java.nio.file.Files.walk(root).forEach { p =>
        val t = java.nio.file.Paths.get(to).resolve(root.relativize(p))
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.createDirectories(t)
        else java.nio.file.Files.copy(p, t,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      assert(new java.io.File(s"$to/commits/$commit").delete())
      new java.io.File(s"$to/commits/.$commit.crc").delete()
      to
    }

    // ---- nearDupStream ---------------------------------------------
    // control: bucketed from birth, all three batches
    val cIdx = ParquetTable(spark, base.resolve("nd-c-idx").toString,
      buckets = 8, bucketKey = "band_key")
    val cPairs = ParquetTable(spark, base.resolve("nd-c-pairs").toString)
    val cSrc = base.resolve("nd-c-src").toString
    val cCkpt = base.resolve("nd-c-ckpt").toString
    def runNd(idx: ParquetTable, pairs: ParquetTable, src: String,
        ckpt: String): Unit =
      StreamingLift.nearDupStream(spark, src + "/*", schema, idx, pairs,
        "doc_id", "text", ckpt).awaitTermination(60000)
    b1.write.parquet(cSrc + "/f1"); runNd(cIdx, cPairs, cSrc, cCkpt)
    b2.write.parquet(cSrc + "/f2"); runNd(cIdx, cPairs, cSrc, cCkpt)
    b3.write.parquet(cSrc + "/f3"); runNd(cIdx, cPairs, cSrc, cCkpt)
    // migrated: flat for batches 0-1, then flat→bucketed, then batch 2
    val flat = ParquetTable(spark, base.resolve("nd-m-flat").toString)
    val mPairs = ParquetTable(spark, base.resolve("nd-m-pairs").toString)
    val mSrc = base.resolve("nd-m-src").toString
    val mCkpt = base.resolve("nd-m-ckpt").toString
    b1.write.parquet(mSrc + "/f1"); runNd(flat, mPairs, mSrc, mCkpt)
    b2.write.parquet(mSrc + "/f2"); runNd(flat, mPairs, mSrc, mCkpt)
    val mIdx = ParquetTable(spark, base.resolve("nd-m-bucketed").toString,
      buckets = 8, bucketKey = "band_key")
    assert(StreamingLift.migrateIndex(flat, mIdx) === 1L,
      "migration must carry the flat index's applied-batch watermark")
    // exactly-once across the boundary: a crash replay of PRE-migration
    // batch 1 against the bucketed index must be refused by the
    // migrated watermark — nothing appended, no pairs re-emitted
    val replayCkpt = cloneCkptWithout(mCkpt, 1L)
    val pairsBefore = mPairs.read.count()
    runNd(mIdx, mPairs, mSrc, replayCkpt)
    assert(mPairs.read.count() === pairsBefore,
      "replayed pre-migration batch must not re-emit pairs")
    assert(mIdx.read.filter(col("src_batch") === 1L).count() === 0L,
      "replayed pre-migration batch must not re-append its delta")
    // resume: batch 2 probes the migrated state
    b3.write.parquet(mSrc + "/f3"); runNd(mIdx, mPairs, mSrc, replayCkpt)
    def pairSet(t: ParquetTable) = t.read.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(pairSet(mPairs) === pairSet(cPairs) && pairSet(cPairs).exists(
        p => p._3 == "vs_corpus" && p._4 == 2L),
      "pair reports must be bit-identical across the migration boundary")
    def keySet(t: ParquetTable) =
      StreamingLift.nearDupIndexView(t, "doc_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(keySet(mIdx) === keySet(cIdx),
      "index content must be layout-independent after migration")

    // ---- spanDedupStream -------------------------------------------
    val sCIdx = ParquetTable(spark, base.resolve("sp-c-idx").toString,
      buckets = 4, bucketKey = "wh")
    val sCSpans = ParquetTable(spark, base.resolve("sp-c-spans").toString)
    val sCSrc = base.resolve("sp-c-src").toString
    val sCCkpt = base.resolve("sp-c-ckpt").toString
    def runSp(idx: ParquetTable, spans: ParquetTable, src: String,
        ckpt: String): Unit =
      StreamingLift.spanDedupStream(spark, src + "/*", schema, idx, spans,
        "doc_id", "text", ckpt, k = 3, minDocs = 2).awaitTermination(60000)
    b1.write.parquet(sCSrc + "/f1"); runSp(sCIdx, sCSpans, sCSrc, sCCkpt)
    b2.write.parquet(sCSrc + "/f2"); runSp(sCIdx, sCSpans, sCSrc, sCCkpt)
    b3.write.parquet(sCSrc + "/f3"); runSp(sCIdx, sCSpans, sCSrc, sCCkpt)
    val sFlat = ParquetTable(spark, base.resolve("sp-m-flat").toString)
    val sMSpans = ParquetTable(spark, base.resolve("sp-m-spans").toString)
    val sMSrc = base.resolve("sp-m-src").toString
    val sMCkpt = base.resolve("sp-m-ckpt").toString
    b1.write.parquet(sMSrc + "/f1"); runSp(sFlat, sMSpans, sMSrc, sMCkpt)
    b2.write.parquet(sMSrc + "/f2"); runSp(sFlat, sMSpans, sMSrc, sMCkpt)
    val sMIdx = ParquetTable(spark, base.resolve("sp-m-bucketed").toString,
      buckets = 4, bucketKey = "wh")
    assert(StreamingLift.migrateIndex(sFlat, sMIdx) === 1L)
    b3.write.parquet(sMSrc + "/f3"); runSp(sMIdx, sMSpans, sMSrc, sMCkpt)
    def spanSet(t: ParquetTable) = t.read
      .select("doc_id", "span_start", "span_len", "span_text", "batch_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4))).toSet
    assert(spanSet(sMSpans) === spanSet(sCSpans) &&
      spanSet(sCSpans).exists(_._5 == 2L),
      "span reports must be bit-identical across the migration boundary")
    def idxMap(t: ParquetTable) = StreamingLift.spanIndexView(t).collect()
      .map(r => r.getAs[Array[Byte]](0).toSeq -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(idxMap(sMIdx) === idxMap(sCIdx),
      "span index content must be layout-independent after migration")

    // ---- vocabTrackStream (buckets on wh like span, but stamps
    // AppliedBatchKey — the r15 dispatch gap: keying the watermark on
    // the target's bucket key alone left a flat vocab index stuck flat)
    val vCIdx = ParquetTable(spark, base.resolve("vo-c-idx").toString,
      buckets = 4, bucketKey = "wh")
    val vCLed = ParquetTable(spark, base.resolve("vo-c-led").toString)
    val vCSrc = base.resolve("vo-c-src").toString
    val vCCkpt = base.resolve("vo-c-ckpt").toString
    def runVo(idx: ParquetTable, led: ParquetTable, src: String,
        ckpt: String): Unit =
      StreamingLift.vocabTrackStream(spark, src + "/*", schema, idx, led,
        "text", ckpt).awaitTermination(60000)
    b1.write.parquet(vCSrc + "/f1"); runVo(vCIdx, vCLed, vCSrc, vCCkpt)
    b2.write.parquet(vCSrc + "/f2"); runVo(vCIdx, vCLed, vCSrc, vCCkpt)
    b3.write.parquet(vCSrc + "/f3"); runVo(vCIdx, vCLed, vCSrc, vCCkpt)
    val vFlat = ParquetTable(spark, base.resolve("vo-m-flat").toString)
    val vMLed = ParquetTable(spark, base.resolve("vo-m-led").toString)
    val vMSrc = base.resolve("vo-m-src").toString
    val vMCkpt = base.resolve("vo-m-ckpt").toString
    b1.write.parquet(vMSrc + "/f1"); runVo(vFlat, vMLed, vMSrc, vMCkpt)
    b2.write.parquet(vMSrc + "/f2"); runVo(vFlat, vMLed, vMSrc, vMCkpt)
    val vMIdx = ParquetTable(spark, base.resolve("vo-m-bucketed").toString,
      buckets = 4, bucketKey = "wh")
    assert(StreamingLift.migrateIndex(vFlat, vMIdx) === 1L,
      "vocab migration must carry the flat index's applied watermark")
    // pre-migration replay refused by the migrated watermark: no ledger
    // row re-appended, no index delta under the replayed batch id
    val vReplayCkpt = cloneCkptWithout(vMCkpt, 1L)
    val ledBefore = vMLed.read.count()
    runVo(vMIdx, vMLed, vMSrc, vReplayCkpt)
    assert(vMLed.read.count() === ledBefore,
      "replayed pre-migration vocab batch must not re-append its ledger row")
    assert(vMIdx.read.filter(col("src_batch") === 1L).count() === 0L,
      "replayed pre-migration vocab batch must not re-append its words")
    b3.write.parquet(vMSrc + "/f3"); runVo(vMIdx, vMLed, vMSrc, vReplayCkpt)
    def wordSet(t: ParquetTable) = StreamingLift.vocabIndexView(t)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(wordSet(vMIdx) === wordSet(vCIdx) && wordSet(vCIdx).nonEmpty,
      "vocab index content must be layout-independent after migration")
    def ledSet(t: ParquetTable) = StreamingLift.vocabLedgerView(t)
      .select("batch_id", "n_docs", "n_tokens", "n_distinct_words",
        "n_new_words", "cum_vocab")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(ledSet(vMLed) === ledSet(vCLed) && ledSet(vCLed).exists(_._1 == 2L),
      "vocab ledger rows must be bit-identical across the migration boundary")

    // guard-rails: wrong kind, existing target, non-stream-managed source
    val wrongKind = ParquetTable(spark, base.resolve("wrong").toString,
      buckets = 4, bucketKey = "doc_id")
    assertThrows[IllegalArgumentException] {
      StreamingLift.migrateIndex(flat, wrongKind)
    }
    assertThrows[IllegalArgumentException] { // require -> IAE
      StreamingLift.migrateIndex(flat, mIdx) // target already exists
    }
    // a never-stream-managed flat table (no applied-batch key at all)
    val plain = ParquetTable(spark, base.resolve("plain-flat").toString)
    plain.append(Seq((42L, "word")).toDF("wh", "word"))
    val plainTarget = ParquetTable(spark, base.resolve("plain-bkt").toString,
      buckets = 4, bucketKey = "wh")
    assertThrows[IllegalStateException] {
      StreamingLift.migrateIndex(plain, plainTarget)
    }
  }

  test("spanDedupStream bucketed: spans identical to flat across horizons, append-only publish") {
    import org.apache.spark.sql.functions._
    val base = Files.createTempDirectory("graft-span-bucketed")
    val srcDir = base.resolve("src").toString
    def docs(rows: (Long, String)*): DataFrame = rows.toDF("doc_id", "text")
    val b1 = docs(1L -> "alpha beta gamma delta shared",
      2L -> "junk one singleton content xyz")
    val b2 = docs(3L -> "pre alpha beta gamma delta post",
      4L -> "other junk nobody repeats ever")
    val b3 = docs(5L -> "again alpha beta gamma delta end",
      6L -> "final junk also entirely unique")
    val schema = b1.schema
    case class S(tag: String, buckets: Int, horizon: Long) {
      val index = ParquetTable(spark, base.resolve(s"idx-$tag").toString,
        buckets = buckets, bucketKey = "wh")
      val spans = ParquetTable(spark, base.resolve(s"spans-$tag").toString)
      val ckpt = base.resolve(s"ckpt-$tag").toString
      def run(ck: String = ckpt): Unit =
        StreamingLift.spanDedupStream(spark, srcDir + "/*", schema, index,
          spans, "doc_id", "text", ck, k = 3, minDocs = 2,
          compactAfterBatches = horizon).awaitTermination(60000)
      def spanSet() =
        if (!spans.exists) Set.empty[(Long, Long, Long, String, Long)]
        else spans.read
          .select("doc_id", "span_start", "span_len", "span_text", "batch_id")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getString(3), r.getLong(4))).toSet
    }
    val flatFull = S("flat-full", 0, Long.MaxValue)
    val buckFull = S("buck-full", 4, Long.MaxValue)
    val flatComp = S("flat-comp", 0, 1L)
    val buckComp = S("buck-comp", 4, 1L)
    val all = Seq(flatFull, buckFull, flatComp, buckComp)
    Seq(b1 -> "f1", b2 -> "f2", b3 -> "f3").foreach { case (b, f) =>
      b.write.parquet(srcDir + "/" + f)
      val before = parquetFiles(buckFull.index.path)
      all.foreach(_.run())
      // report equivalence, batch by batch, at BOTH horizons
      assert(buckFull.spanSet() === flatFull.spanSet())
      assert(buckComp.spanSet() === flatComp.spanSet())
      // O(batch) publish: the unbounded bucketed stream (no compaction
      // fires at default threshold) never rewrites an existing file
      val after = parquetFiles(buckFull.index.path)
      before.foreach { case (p, sz) =>
        assert(after.get(p).contains(sz), s"span publish rewrote $p")
      }
    }
    assert(buckFull.spanSet().nonEmpty)
    // consolidated view of the bucketed index == the flat index, exactly
    def idxMap(df: DataFrame) = df.collect()
      .map(r => r.getAs[Array[Byte]](0).toSeq -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(idxMap(StreamingLift.spanIndexView(buckFull.index)) ===
      idxMap(flatFull.index.read))
    // maintenance compaction over ALL buckets converges the lazily
    // compacted index to the eager flat-compact state bit-for-bit
    // (watermark of the last applied batch: id 2, horizon 1)
    StreamingLift.compactSpanIndex(buckComp.index, watermarkBatch = 1L,
      bucketIds = buckComp.index.bucketIds)
    assert(idxMap(StreamingLift.spanIndexView(buckComp.index)) ===
      idxMap(flatComp.index.read))
    // fresh checkpoint replays everything as batch 0: the table-meta
    // guard skips — spans and index unchanged
    val spansBefore = buckFull.spanSet()
    buckFull.run(base.resolve("ckpt-replay").toString)
    assert(buckFull.spanSet() === spansBefore)
    assert(idxMap(StreamingLift.spanIndexView(buckFull.index)) ===
      idxMap(flatFull.index.read))

    // AUTO-compaction (threshold 0 → every touched bucket consolidates
    // each trigger): reports still identical to the flat compacting
    // stream, and the index is ALREADY at the eager state — no
    // maintenance pass needed
    val eagerSrc = base.resolve("src-eager").toString
    val eagerIdx = ParquetTable(spark, base.resolve("idx-eager").toString,
      buckets = 4, bucketKey = "wh")
    val eagerSpans = ParquetTable(spark, base.resolve("spans-eager").toString)
    val eagerCkpt = base.resolve("ckpt-eager").toString
    Seq(b1 -> "f1", b2 -> "f2", b3 -> "f3").foreach { case (b, f) =>
      b.write.parquet(eagerSrc + "/" + f)
      StreamingLift.spanDedupStream(spark, eagerSrc + "/*", schema,
        eagerIdx, eagerSpans, "doc_id", "text", eagerCkpt,
        k = 3, minDocs = 2, compactAfterBatches = 1L,
        compactFileThreshold = 0).awaitTermination(60000)
    }
    def spanSetOf(t: ParquetTable) = t.read
      .select("doc_id", "span_start", "span_len", "span_text", "batch_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4))).toSet
    assert(spanSetOf(eagerSpans) === flatComp.spanSet())
    // auto-compaction is still PARTITION-scoped (touched buckets only):
    // a batch-1 singleton in a bucket batch 2 never touched survives on
    // disk until its next touch — the horizon-filtered view (what the
    // probe reads) is the eager-equivalent comparison
    assert(idxMap(graft.ops.TextClean.spanIndexCompact(
        StreamingLift.spanIndexView(eagerIdx), watermarkBatch = 1L)) ===
      idxMap(flatComp.index.read))
  }

  test("bandIndexProbe == brute-force reference over seeded random inputs") {
    import graft.ops.Dedup
    val rnd = new scala.util.Random(20260815L)
    for (case_ <- 1 to 5) {
      val maxBucket = 1 + rnd.nextInt(3)
      // index rows: (id, band_idx, band_key), some groups tombstoned
      val nGroups = 4 + rnd.nextInt(4)
      val groups = (0 until nGroups).map(g => (g % 2, s"bk$g"))
      val index0 = groups.flatMap { case (bi, bk) =>
        val n = 1 + rnd.nextInt(5)
        val tomb = rnd.nextInt(6) == 0
        val live = (1 to n).map(i =>
          (Option(100L * bi + i * 7L + bk.hashCode.abs % 13), bi, bk))
        if (tomb) live :+ ((None: Option[Long], bi, bk)) else live
      }
      val batch0 = groups.filter(_ => rnd.nextBoolean()).flatMap {
        case (bi, bk) => (1 to 1 + rnd.nextInt(2)).map(i =>
          (1000L + rnd.nextInt(50), bi, bk))
      }
      if (batch0.nonEmpty) {
        val index = index0.toDF("doc_id", "band_idx", "band_key")
        val batch = batch0.toDF("doc_id", "band_idx", "band_key")
        val got = Dedup.bandIndexProbe(index, batch, "doc_id", maxBucket)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        // brute force: pair batch keys against index groups that are
        // neither tombstoned nor larger than maxBucket
        val byGroup = index0.groupBy(t => (t._2, t._3))
        val want = (for {
          (id2, bi, bk) <- batch0
          rows = byGroup.getOrElse((bi, bk), Nil)
          if rows.lengthCompare(maxBucket) <= 0 && rows.forall(_._1.isDefined)
          (Some(id1), _, _) <- rows
          if id1 != id2
        } yield (math.min(id1, id2), math.max(id1, id2))).toSet
        assert(got === want, s"case $case_ (maxBucket=$maxBucket)")
      }
    }
  }

  // ---- streaming vocabulary tracker ----------------------------------

  test("vocabTrackStream: per-batch OOV ledger, flat and bucketed agree, " +
      "replay under a fresh checkpoint refused") {
    def docs(rows: Seq[(Long, String)]): DataFrame = rows.toDF("doc_id", "text")
    val schema = docs(Nil).schema
    def drive(bucketed: Boolean): (ParquetTable, ParquetTable) = {
      val tag = if (bucketed) "b" else "f"
      val srcDir = Files.createTempDirectory(s"graft-voc$tag-src").toString
      val ckpt = Files.createTempDirectory(s"graft-voc$tag-ckpt").toString
      val base = Files.createTempDirectory(s"graft-voc$tag-dst")
      val index =
        if (bucketed) ParquetTable(spark, base.resolve("idx").toString,
          buckets = 8, bucketKey = "wh")
        else ParquetTable(spark, base.resolve("idx").toString)
      val ledger = ParquetTable(spark, base.resolve("led").toString)
      docs(Seq((1L, "a b c"), (2L, "b c d"))).write.parquet(srcDir + "/f1")
      StreamingLift.vocabTrackStream(spark, srcDir + "/*", schema, index,
        ledger, "text", ckpt).awaitTermination()
      docs(Seq((3L, "c d e"))).write.parquet(srcDir + "/f2")
      StreamingLift.vocabTrackStream(spark, srcDir + "/*", schema, index,
        ledger, "text", ckpt).awaitTermination()
      // replay the same files under a FRESH checkpoint: batch ids
      // restart at 0, the applied stamp refuses both — nothing lands
      val ckpt2 = Files.createTempDirectory(s"graft-voc$tag-ckpt2").toString
      StreamingLift.vocabTrackStream(spark, srcDir + "/*", schema, index,
        ledger, "text", ckpt2).awaitTermination()
      (index, ledger)
    }
    for (bucketed <- Seq(false, true)) {
      val (index, ledger) = drive(bucketed)
      val rows = StreamingLift.vocabLedgerView(ledger)
        .select("batch_id", "n_docs", "n_tokens", "n_distinct_words",
          "n_new_words", "cum_vocab")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
      assert(rows === Map(
        0L -> ((2L, 6L, 4L, 4L, 4L)),   // a b c d all new
        1L -> ((1L, 3L, 3L, 1L, 5L))),  // only e is new
        s"bucketed=$bucketed")
      assert(StreamingLift.vocabIndexView(index)
        .select("word").collect().map(_.getString(0)).sorted.toSeq
        === Seq("a", "b", "c", "d", "e"), s"bucketed=$bucketed")
      // the fresh-checkpoint replay appended no third/fourth raw row
      assert(ledger.read.count() === 2L, s"bucketed=$bucketed")
    }
  }

  test("vocabTrackStream: crash-window replay re-appends a BIT-IDENTICAL " +
      "ledger row; views and compaction stay exact") {
    import org.apache.spark.sql.functions.col
    def docs(rows: Seq[(Long, String)]): DataFrame = rows.toDF("doc_id", "text")
    val schema = docs(Nil).schema
    val srcDir = Files.createTempDirectory("graft-vocc-src").toString
    val ckpt = Files.createTempDirectory("graft-vocc-ckpt").toString
    val base = Files.createTempDirectory("graft-vocc-dst")
    val index = ParquetTable(spark, base.resolve("idx").toString,
      buckets = 8, bucketKey = "wh")
    val ledger = ParquetTable(spark, base.resolve("led").toString)
    def run(at: String): Unit = StreamingLift.vocabTrackStream(spark,
      srcDir + "/*", schema, index, ledger, "text", at).awaitTermination()

    docs(Seq((1L, "a b c"), (2L, "b c d"))).write.parquet(srcDir + "/f1")
    run(ckpt)
    docs(Seq((3L, "c d e"))).write.parquet(srcDir + "/f2")
    run(ckpt)
    // inject the crash WINDOW: batch 1's ledger row landed but neither
    // its index stamp nor its checkpoint commit did — roll the stamp
    // back and clone the checkpoint minus commits/1 (+ its .crc shadow)
    index.putTableMeta(StreamingLift.AppliedBatchKey -> "0")
    val ckpt2 = Files.createTempDirectory("graft-vocc-ckpt2").toString
    val srcRoot = java.nio.file.Paths.get(ckpt)
    java.nio.file.Files.walk(srcRoot).forEach { p =>
      val t = java.nio.file.Paths.get(ckpt2).resolve(srcRoot.relativize(p))
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    assert(new java.io.File(ckpt2 + "/commits/1").delete())
    new java.io.File(ckpt2 + "/commits/.1.crc").delete()
    run(ckpt2)
    // raw ledger is at-least-once: TWO rows for batch 1 — and because
    // the replay's probe excluded the crashed publish's own src_batch
    // rows, they are bit-identical (same n_new_words)
    val raw = ledger.read.filter(col("batch_id") === 1L)
      .select("n_new_words").collect().map(_.getLong(0)).toSeq
    assert(raw === Seq(1L, 1L), s"got $raw")
    // the views stay exactly-once and exact
    assert(StreamingLift.vocabLedgerView(ledger).count() === 2L)
    assert(StreamingLift.vocabIndexView(index).count() === 5L)
    assert(index.tableMeta(StreamingLift.AppliedBatchKey) === "1")
    // crash-window carve-out: with the stamp rolled back to 0, batch
    // 1's word ("e", src_batch above the watermark) is carried
    // verbatim — folding it would make a replay see its own crashed
    // publish as corpus; the bit-identical re-append still collapses
    index.putTableMeta(StreamingLift.AppliedBatchKey -> "0")
    StreamingLift.compactVocabIndex(index, index.bucketIds)
    assert(index.read.filter(col("src_batch") === 1L).count() === 1L,
      "the crashed-window word must survive compaction verbatim, once")
    assert(StreamingLift.vocabIndexView(index).count() === 5L)
    // with the stamp restored, compaction folds everything to one row
    // per word, one file per bucket, views unchanged
    index.putTableMeta(StreamingLift.AppliedBatchKey -> "1")
    StreamingLift.compactVocabIndex(index, index.bucketIds)
    assert(StreamingLift.vocabIndexView(index)
      .select("word").collect().map(_.getString(0)).sorted.toSeq
      === Seq("a", "b", "c", "d", "e"))
    assert(index.read.count() === 5L,
      "compaction must fold replay duplicates to one row per word")
    assert(index.read.filter(col("src_batch") =!= -1L).count() === 0L)
    assert(index.bucketIds.forall(index.bucketFileCount(_) === 1))
  }
}
