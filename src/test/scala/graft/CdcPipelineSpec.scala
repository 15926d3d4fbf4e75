package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Cdc, Interleave, ShardExport}

/** Behavioral contracts for the CDC/IVM, shard-export, and mixture-
  * interleave operators (the DuckDB oracle checks their q107–q109
  * query forms; here we pin the edge semantics the oracle data never
  * exercises: group moves, emptied groups, null sums, per-shard write
  * order, and schedule/weight tracking).
  */
class CdcPipelineSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def agg(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(col("g")).agg(count(lit(1)).as("n_rows"), sum(col("v")).as("v"))

  test("Cdc.applyDelta matches a full recompute, including group moves and emptied groups") {
    // old state: groups a(2 rows), b(1), c(1); new state: b's row MOVES
    // to a, c empties out, d appears, one a-row's value changes
    val olds = Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 5.0), (4L, "c", 7.0))
      .toDF("k", "g", "v")
    val news = Seq((1L, "a", 11.0), (2L, "a", 20.0), (3L, "a", 5.0), (5L, "d", 9.0))
      .toDF("k", "g", "v")
    val got = Cdc.applyDelta(agg(olds), Cdc.changeSet(olds, news, "k"), "g", Seq("v"))
      .orderBy("g").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val want = agg(news)
      .orderBy("g").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === want.toSeq) // c absent from both: count hit 0 → dropped
    assert(!got.exists(_._1 == "c"))
  }

  test("Cdc.applyDelta preserves null sums (does not invent zero)") {
    val olds = Seq((1L, "a", null.asInstanceOf[java.lang.Double])).toDF("k", "g", "v")
    val news = Seq((1L, "a", null.asInstanceOf[java.lang.Double]),
      (2L, "a", null.asInstanceOf[java.lang.Double])).toDF("k", "g", "v")
    val row = Cdc.applyDelta(agg(olds), Cdc.changeSet(olds, news, "k"), "g", Seq("v"))
      .collect()
    assert(row.length === 1 && row(0).getLong(1) === 2L && row(0).isNullAt(2))
  }

  test("Cdc.applyDelta no-op changeSet returns the snapshot unchanged") {
    val olds = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "g", "v")
    val got = Cdc.applyDelta(agg(olds), Cdc.changeSet(olds, olds, "k"), "g", Seq("v"))
      .orderBy("g").collect().toSeq
    assert(got === agg(olds).orderBy("g").collect().toSeq)
  }

  test("ShardExport.write lands each shard sorted by ord, and assign is input-order independent") {
    val docs = (1L to 200L).map(i => (i, i * 3)).toDF("doc_id", "n_chars")
    val assigned = ShardExport.assign(docs, "doc_id", numShards = 4, seed = 1L)
    val dir = Files.createTempDirectory("graft-shard-").toString
    ShardExport.write(assigned, numShards = 4, dir)
    val expect = assigned.collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(0))) // shard, ord, id
      .groupBy(_._1).view.mapValues(_.sortBy(x => (x._2, x._3)).map(_._3).toSeq).toMap
    for (shard <- 0L until 4L) {
      val got = spark.read.parquet(s"$dir/shard=$shard")
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      assert(got === expect(shard), s"shard $shard not in ord order")
    }
    // shuffling the input rows changes nothing: placement is pure (id, seed)
    val reshuffled = ShardExport.assign(
      docs.orderBy(rand(42)), "doc_id", numShards = 4, seed = 1L)
    assert(reshuffled.orderBy("doc_id").collect().toSeq ===
      assigned.orderBy("doc_id").collect().toSeq)
  }

  test("ShardExport.manifest perm_check pins the within-shard permutation") {
    val docs = (1L to 100L).map(i => (i, i)).toDF("doc_id", "n_chars")
    val assigned = ShardExport.assign(docs, "doc_id", numShards = 2, seed = 7L)
    val m = ShardExport.manifest(assigned, "doc_id", "n_chars")
      .orderBy("shard").collect()
    // independent reference: positions from a driver-side sort
    val byShard = assigned.collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(0)))
      .groupBy(_._1)
    for (row <- m) {
      val rows = byShard(row.getLong(0)).sortBy(x => (x._2, x._3))
      val M = 1000000007L
      val check = rows.zipWithIndex
        .map { case ((_, _, id), i) => ((i + 1L) % M) * (id % M) % M }
        .sum % M
      assert(row.getLong(1) === rows.length.toLong)
      assert(row.getAs[Long]("perm_check") === check)
    }
  }

  test("Interleave.schedule tracks weights and the rank prune is exact") {
    val docs = (1L to 300L).map { i =>
      (i, if (i % 3 == 0) "heavy" else "light")
    }.toDF("id", "src")
    // heavy:3 light:1 → of any early window, ~3/4 of slots are heavy
    val sched = Interleave.schedule(docs, "src", "id",
      Map("heavy" -> 3, "light" -> 1), topN = 80)
    val rows = sched.collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq === (1L to 80L)) // dense positions
    val mix = Interleave.realizedMix(sched, "src").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mix("heavy") === 60L && mix("light") === 20L)
    // prune exactness: a huge topN (no pruning) agrees on the prefix
    val full = Interleave.schedule(docs, "src", "id",
      Map("heavy" -> 3, "light" -> 1), topN = 300)
      .filter(col("position") <= 80).collect()
    assert(full.map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1).toSeq ===
      rows.map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1).toSeq)
  }

  test("Interleave.schedule excludes sources absent from the weights map") {
    val docs = (1L to 60L).map { i =>
      (i, if (i % 2 == 0) "wanted" else "unlisted")
    }.toDF("id", "src")
    val sched = Interleave.schedule(docs, "src", "id",
      Map("wanted" -> 2), topN = 20).collect()
    assert(sched.length === 20)
    assert(sched.forall(_.getString(2) == "wanted")) // weight 0 ⇒ no slots
  }

  test("Cdc.refreshGroups matches recompute where deltas cannot (max under delete)") {
    val olds = Seq((1L, "a", 10.0), (2L, "a", 99.0), (3L, "b", 5.0), (4L, "c", 7.0))
      .toDF("k", "g", "v")
    // the a-group's MAX row is deleted (99 → 10), c empties, d appears
    val news = Seq((1L, "a", 10.0), (3L, "b", 5.0), (5L, "d", 9.0)).toDF("k", "g", "v")
    def aggFn(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("g")).agg(count(lit(1)).as("n_rows"),
        min(col("v")).as("mn"), max(col("v")).as("mx"))
    val got = Cdc.refreshGroups(aggFn(olds), news,
        Cdc.changeSet(olds, news, "k"), "g")(aggFn)
      .orderBy("g").collect().toSeq
    assert(got === aggFn(news).orderBy("g").collect().toSeq)
    // untouched group b carried over, emptied group c gone
    assert(got.map(_.getString(0)) === Seq("a", "b", "d"))
  }

  test("Interleave.epochSchedule wraps exhausted sources into later epochs") {
    val docs = ((1L to 2L).map((_, "tiny")) ++ (10L to 60L).map((_, "big")))
      .toDF("id", "src")
    val sched = Interleave.schedule(docs, "src", "id",
      Map("tiny" -> 4, "big" -> 1), topN = 12)
    val esched = Interleave.epochSchedule(docs, "src", "id",
      Map("tiny" -> 4, "big" -> 1), topN = 12).collect()
    // tiny (weight 4, 2 docs) exhausts after 2 slots; epochSchedule
    // keeps emitting it: slots at vtime 3,6,9,12… are tiny forever
    val tiny = esched.filter(_.getString(3) == "tiny")
    assert(tiny.length > 2, "wrap-around slots missing")
    assert(tiny.map(_.getLong(2)).max > 1L, "no epoch ever exceeded 1")
    // within an epoch the per-source document order repeats exactly
    val byEpoch = tiny.groupBy(_.getLong(2)).view
      .mapValues(_.sortBy(_.getLong(1)).map(_.getLong(4)).toSeq).toMap
    assert(byEpoch(2L).take(2) === byEpoch(1L).take(2))
    // before the first wrapped slot (lcm(4,1)=4 ⇒ tiny's step is 1,
    // so its m=3 wrap lands at vtime 3) the schedules are identical —
    // wrap-around only ADDS slots after that
    val plainPre = sched.collect().filter(_.getLong(1) < 3)
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sortBy(_._1).toSeq
    val epochPre = esched.filter(_.getLong(1) < 3)
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).sortBy(_._1).toSeq
    assert(epochPre.nonEmpty)
    assert(epochPre === plainPre)
  }

  test("AggView: delta refresh tracks the base, falls back to full past retention") {
    import graft.sources.{AggView, ParquetTable}
    val root = Files.createTempDirectory("graft-aggview-").toString
    val base = ParquetTable(spark, s"$root/base")
    val av = AggView(ParquetTable(spark, s"$root/view"), "g", Seq("v"))
    def rows(kvs: (Long, String, Double)*) = kvs.toDF("k", "g", "v")
    def expect(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("g").agg(count(lit(1)).as("n_rows"), sum("v").as("v"))
        .orderBy("g").collect().toSeq

    val s1 = rows((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 5.0))
    base.overwrite(s1)
    assert(av.build(base).mode === "full")
    assert(av.view.read.orderBy("g").collect().toSeq === expect(s1))

    // one publish ahead: delta path, matches recompute
    val s2 = rows((1L, "a", 11.0), (3L, "b", 5.0), (4L, "c", 7.0))
    base.overwrite(s2)
    val r2 = av.refresh(base, "k")
    assert(r2.mode === "delta" && r2.from.isDefined)
    assert(av.view.read.orderBy("g").collect().toSeq === expect(s2))
    assert(av.refresh(base, "k").mode === "noop")

    // two publishes ahead: applied version GC'd → loud full rebuild
    base.overwrite(rows((4L, "c", 8.0)))
    val s4 = rows((4L, "c", 9.0), (5L, "d", 1.0))
    base.overwrite(s4)
    val r4 = av.refresh(base, "k")
    assert(r4.mode === "full")
    assert(av.view.read.orderBy("g").collect().toSeq === expect(s4))
  }

  test("AggView catches IN-PLACE base mutations: append and bucketed upsert force a rebuild") {
    import graft.sources.{AggView, ParquetTable}
    val root = Files.createTempDirectory("graft-aggview-mut-").toString
    def rows(kvs: (Long, String, Double)*) = kvs.toDF("k", "g", "v")
    def expect(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("g").agg(count(lit(1)).as("n_rows"), sum("v").as("v"))
        .orderBy("g").collect().toSeq

    // flat base: append mutates the live version without renaming it
    val base = ParquetTable(spark, s"$root/base")
    val av = AggView(ParquetTable(spark, s"$root/view"), "g", Seq("v"))
    val s1 = rows((1L, "a", 10.0), (2L, "b", 5.0))
    base.overwrite(s1)
    av.build(base)
    base.append(rows((3L, "a", 7.0)))
    // pre-fix: version name unchanged → "noop" → view silently missing
    // the appended row forever
    val r = av.refresh(base, "k")
    assert(r.mode === "full", s"in-place append must force a rebuild: $r")
    assert(av.view.read.orderBy("g").collect().toSeq === expect(base.read))
    assert(av.refresh(base, "k").mode === "noop", "stable after rebuild")

    // bucketed base: the partition-scoped upsert is also in-place
    val bbase = ParquetTable(spark, s"$root/bbase", buckets = 4, bucketKey = "k")
    val bav = AggView(ParquetTable(spark, s"$root/bview"), "g", Seq("v"))
    bbase.overwrite(s1)
    bav.build(bbase)
    graft.ops.TableOps.insertData(bbase, rows((1L, "a", 99.0)), "k",
      mergeOnDuplicates = true)
    val rb = bav.refresh(bbase, "k")
    assert(rb.mode === "full", s"bucketed upsert must force a rebuild: $rb")
    assert(bav.view.read.orderBy("g").collect().toSeq === expect(bbase.read))

    // and a RETAINED old version mutated after the view applied it
    // cannot serve as a delta base either
    val base2 = ParquetTable(spark, s"$root/base2")
    val av2 = AggView(ParquetTable(spark, s"$root/view2"), "g", Seq("v"))
    base2.overwrite(s1)
    av2.build(base2)
    base2.append(rows((9L, "c", 1.0)))     // mutates v-0 after apply
    base2.overwrite(rows((1L, "a", 10.0))) // v-1; v-0 retained, mutated
    val r2 = av2.refresh(base2, "k")
    assert(r2.mode === "full",
      s"delta against a post-apply-mutated retained version is unsound: $r2")
    assert(av2.view.read.orderBy("g").collect().toSeq === expect(base2.read))
  }

  test("bucket layout mismatch is rejected, not silently mis-bucketed") {
    import graft.sources.ParquetTable
    val root = Files.createTempDirectory("graft-bucketcheck-").toString
    val t8 = ParquetTable(spark, s"$root/t", buckets = 8, bucketKey = "k")
    t8.overwrite(Seq((1L, "x")).toDF("k", "v"))
    val t16 = ParquetTable(spark, s"$root/t", buckets = 16, bucketKey = "k")
    val e = intercept[IllegalArgumentException](
      t16.append(Seq((2L, "y")).toDF("k", "v")))
    assert(e.getMessage.contains("bucket layout mismatch"))
    val tk = ParquetTable(spark, s"$root/t", buckets = 8, bucketKey = "v")
    intercept[IllegalArgumentException](tk.readBuckets(Seq(0)))
    // the matching layout still works
    t8.append(Seq((2L, "y")).toDF("k", "v"))
    assert(t8.read.count() === 2)
  }

  test("bucket-layout guard survives overwrite GC and heals from version meta") {
    import graft.sources.ParquetTable
    import org.apache.hadoop.fs.Path
    val root = Files.createTempDirectory("graft-bucketgc-").toString
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val t8 = ParquetTable(spark, s"$root/t", buckets = 8, bucketKey = "k")
    t8.overwrite(Seq((1L, "x")).toDF("k", "v"))
    t8.overwrite(Seq((1L, "x2")).toDF("k", "v")) // second GC pass
    // the root guard outlives every overwrite's GC...
    assert(fs.exists(new Path(s"$root/t", "_GRAFT_BUCKETS")),
      "gc must spare the root-level bucket-layout guard")
    // ...and a mismatched caller is rejected AFTER overwrites too
    intercept[IllegalArgumentException](
      ParquetTable(spark, s"$root/t", buckets = 16, bucketKey = "k")
        .append(Seq((2L, "y")).toDF("k", "v")))
    // even with the root guard lost, the version-pinned copy rejects
    // the mismatch and the next matching access re-heals the root file
    fs.delete(new Path(s"$root/t", "_GRAFT_BUCKETS"), false)
    intercept[IllegalArgumentException](
      ParquetTable(spark, s"$root/t", buckets = 4, bucketKey = "k")
        .readBuckets(Seq(0)))
    assert(t8.readBuckets(Seq.range(0, 8)).count() === 1)
    assert(fs.exists(new Path(s"$root/t", "_GRAFT_BUCKETS")),
      "a matching access must re-heal the root guard from version meta")
  }

  test("overwrite after rollback never reuses a version name") {
    import graft.sources.ParquetTable
    val t = ParquetTable(spark,
      Files.createTempDirectory("graft-vname-").resolve("t").toString)
    t.overwrite(Seq((1L, "v0")).toDF("k", "s")) // v-00000000
    t.overwrite(Seq((2L, "v1")).toDF("k", "s")) // v-00000001
    val demoted = t.liveVersion.get
    t.rollback() // live back to v-00000000; demoted dir still on disk
    t.overwrite(Seq((3L, "v2")).toDF("k", "s"))
    assert(t.liveVersion.get > demoted,
      "a post-rollback overwrite must take a FRESH name, not recycle the demoted one")
    assert(t.read.collect().map(_.getString(1)).toSeq === Seq("v2"))
  }

  test("AggView survives a base rollback: full rebuild, not a throw or silent noop") {
    import graft.sources.{AggView, ParquetTable}
    val root = Files.createTempDirectory("graft-aggroll-").toString
    val base = ParquetTable(spark, s"$root/base")
    val av = AggView(ParquetTable(spark, s"$root/view"), "g", Seq("v"))
    base.overwrite(Seq((1L, "a", 1.0)).toDF("k", "g", "v"))
    base.overwrite(Seq((1L, "a", 2.0), (2L, "b", 3.0)).toDF("k", "g", "v"))
    av.build(base) // applied = the newer version
    base.rollback() // live regresses BELOW the applied version
    val r = av.refresh(base, "k")
    assert(r.mode === "full", s"rolled-back base must force rebuild, got $r")
    assert(av.view.read.orderBy("g").collect().map(r2 =>
      (r2.getString(0), r2.getLong(1), r2.getDouble(2))).toSeq ===
      Seq(("a", 1L, 1.0)))
  }

  test("RefreshView maintains MIN/MAX across versions by touched-group refresh") {
    import graft.sources.{ParquetTable, RefreshView}
    val root = Files.createTempDirectory("graft-refview-").toString
    val base = ParquetTable(spark, s"$root/base")
    def aggFn(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("g")).agg(count(lit(1)).as("n_rows"),
        min(col("v")).as("mn"), max(col("v")).as("mx"))
    val rv = RefreshView(ParquetTable(spark, s"$root/view"), "g")(aggFn)

    val s1 = Seq((1L, "a", 10.0), (2L, "a", 99.0), (3L, "b", 5.0)).toDF("k", "g", "v")
    base.overwrite(s1)
    assert(rv.build(base).mode === "full")
    // delete a's max row (delta could not patch this), add group c
    val s2 = Seq((1L, "a", 10.0), (3L, "b", 5.0), (4L, "c", 7.0)).toDF("k", "g", "v")
    base.overwrite(s2)
    val r = rv.refresh(base, "k")
    assert(r.mode === "delta")
    assert(rv.view.read.orderBy("g").collect().toSeq ===
      aggFn(s2).orderBy("g").collect().toSeq)
    assert(rv.refresh(base, "k").mode === "noop")
  }

  test("AggView.refreshWith applies a stored feed once and refuses replays") {
    import graft.sources.{AggView, ParquetTable}
    val root = Files.createTempDirectory("graft-aggfeed-").toString
    val base = ParquetTable(spark, s"$root/base")
    val av = AggView(ParquetTable(spark, s"$root/view"), "g", Seq("v"))
    val s1 = Seq((1L, "a", 10.0)).toDF("k", "g", "v")
    val s2 = Seq((1L, "a", 10.0), (2L, "a", 5.0)).toDF("k", "g", "v")
    base.overwrite(s1)
    av.build(base)
    val from = base.liveVersion.get
    base.overwrite(s2)
    val to = base.liveVersion.get
    val feed = Cdc.changeSet(s1, s2, "k")
    assert(av.refreshWith(feed, from, to).mode === "delta")
    val snap = av.view.read.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(snap === Seq(("a", 2L, 15.0)))
    // replaying the same segment must be refused, leaving the view unchanged
    assert(av.refreshWith(feed, from, to).mode === "stale")
    assert(av.view.read.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      === snap)
  }

  test("versionMeta tolerates malformed lines as absent metadata") {
    import graft.sources.ParquetTable
    val dir = Files.createTempDirectory("graft-badmeta-").resolve("t").toString
    val t = ParquetTable(spark, dir)
    t.overwrite(Seq((1L, "x")).toDF("k", "s"), meta = Map("ok" -> "1"))
    val v = t.liveVersion.get
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$dir/$v/_GRAFT_META"), true)
    out.write("garbage-without-equals\nok=1\n".getBytes("UTF-8")); out.close()
    assert(t.currentMeta === Map("ok" -> "1")) // no exception, bad line dropped
  }

  test("versionMeta is pinned to its snapshot across overwrites and rollback") {
    import graft.sources.ParquetTable
    val t = graft.sources.ParquetTable(spark,
      Files.createTempDirectory("graft-meta-").resolve("t").toString)
    t.overwrite(Seq((1L, "x")).toDF("k", "s"), meta = Map("gen" -> "1"))
    t.overwrite(Seq((2L, "y")).toDF("k", "s"), meta = Map("gen" -> "2"))
    assert(t.currentMeta === Map("gen" -> "2"))
    val Seq(newer, older) = t.versions.take(2)
    assert(t.versionMeta(older) === Map("gen" -> "1"))
    t.rollback()
    assert(t.currentMeta === Map("gen" -> "1"), "meta follows the pointer")
    // metadata-free versions read empty, and the data read ignores the
    // underscore-prefixed meta file
    assert(t.read.count() === 1L)
  }

  test("ParquetTable.diffVersions still classifies through Cdc.changeSet") {
    // the refactor keeps the on-disk CDC path intact: insert/update/
    // delete against a two-version table
    val dir = Files.createTempDirectory("graft-cdc-").toString
    val t = graft.sources.ParquetTable(spark, s"$dir/t")
    t.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
    t.overwrite(Seq((2L, "B"), (3L, "c")).toDF("k", "s"))
    val vs = t.versions // newest first
    val d = t.diffVersions(vs.last, vs.head, "k")
      .select(col("k"), col("change")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d === Map(1L -> "delete", 2L -> "update", 3L -> "insert"))
  }

  test("streamed maintain == AggView refresh on the same feed (one guarded-publish contract)") {
    import graft.sources.{AggView, ParquetTable}
    import graft.streaming.StreamingLift
    val dir = Files.createTempDirectory("graft-ivm-unify")
    def rows(kvs: Seq[(Long, String, Double)]) = kvs.toDF("k", "g", "v")
    val s0 = rows(Seq((1L, "a", 10.0), (2L, "b", 5.0), (3L, "a", 1.0)))
    val s1 = rows(Seq((1L, "a", 11.0), (3L, "b", 2.0))) // upd, del, move
    val s2 = rows(Seq((1L, "a", 11.0), (3L, "b", 2.0), (4L, "c", 7.0)))

    // batch surface: versioned base + AggView delta refresh
    val baseT = ParquetTable(spark, dir.resolve("base").toString)
    val view = AggView(ParquetTable(spark, dir.resolve("view").toString),
      "g", Seq("v"))
    baseT.overwrite(s0)
    view.build(baseT)

    // streaming surface: the SAME feed as CDC change files, folded by
    // maintainAggStream into a snapshot seeded identically
    val snap = ParquetTable(spark, dir.resolve("snap").toString)
    snap.overwrite(view.view.read)
    val srcDir = dir.resolve("src").toString
    val ckpt = dir.resolve("ckpt").toString
    val chSchema = Cdc.changeSet(s0, s1, "k").schema
    def stream(ck: String = ckpt): Unit =
      StreamingLift.maintainAggStream(spark, srcDir + "/*", chSchema,
        snap, "g", Seq("v"), ck).awaitTermination(60000)
    def viewRows(t: ParquetTable) = t.read.orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq

    // step 1: both surfaces advance on changeSet(s0, s1)
    Cdc.changeSet(s0, s1, "k").write.parquet(srcDir + "/c1")
    stream()
    baseT.overwrite(s1)
    val v1 = baseT.liveVersion.get
    assert(view.refresh(baseT, "k").mode === "delta")
    assert(viewRows(snap) === viewRows(view.view))

    // step 2
    Cdc.changeSet(s1, s2, "k").write.parquet(srcDir + "/c2")
    stream()
    baseT.overwrite(s2)
    val v2 = baseT.liveVersion.get
    assert(view.refresh(baseT, "k").mode === "delta")
    assert(viewRows(snap) === viewRows(view.view))
    assert(viewRows(snap) === agg(s2).orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq)

    // replay refusal comes from the SAME guard on both surfaces
    // (AggView.guardedPublish): a fresh checkpoint re-delivers every
    // change file -- refused; re-applying the stored feed segment the
    // view already covers -- stale, no write
    val before = viewRows(snap)
    stream(dir.resolve("ckpt2").toString)
    assert(viewRows(snap) === before, "stream replay refused")
    val again = view.refreshWith(Cdc.changeSet(s1, s2, "k"), from = v1, to = v2)
    assert(again.mode === "stale" && viewRows(view.view) === before,
      "view replay refused")
  }
}
