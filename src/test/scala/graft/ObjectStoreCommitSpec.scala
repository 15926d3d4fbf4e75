package graft

import java.io.IOException
import java.net.URI
import java.nio.file.Files

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TableOps
import graft.sources.{ParquetTable, VersionedLayout}

/** Simulates an S3-class object store with NO usable rename: any
  * table-level rename (staging swaps, publish-by-rename) throws.
  * Renames under the write job's internal staging dirs (`_temporary`,
  * `.spark-staging-`) are allowed — on a real cluster those belong to
  * the committer layer (S3A magic committer / EMRFS), configured per
  * deployment and orthogonal to the TABLE layout under test here.
  */
class RenamelessFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "renameless"
  override def getUri: URI = URI.create("renameless:///")
  override def rename(src: Path, dst: Path): Boolean = {
    val s = src.toString
    if (s.contains("_temporary") || s.contains(".spark-staging"))
      super.rename(src, dst)
    else throw new IOException(s"object store has no rename: $src -> $dst")
  }
}

/** The versioned-pointer commit must work on a store where directory
  * rename is unavailable (round-3 verdict #3: the old staged
  * rename-swap silently broke there).
  */
class ObjectStoreCommitSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val scheme: String = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.renameless.impl", classOf[RenamelessFileSystem].getName)
    "renameless"
  }

  private def tmpTable(buckets: Int = 0): ParquetTable = {
    val dir = Files.createTempDirectory("graft-oss").resolve("t").toString
    ParquetTable(spark, s"$scheme://$dir", buckets = buckets, bucketKey = "id")
  }

  private def rows(r: (Long, String)*): DataFrame = r.toDF("id", "v")

  test("flat overwrite commits without any table-level rename") {
    val t = tmpTable()
    t.overwrite(rows(1L -> "a", 2L -> "b"))
    assert(t.read.as[(Long, String)].collect().sorted.toSeq ===
      Seq(1L -> "a", 2L -> "b"))
    t.overwrite(rows(3L -> "c"))
    assert(t.read.as[(Long, String)].collect().toSeq === Seq(3L -> "c"))
    assert(t.dataDir.endsWith("v-00000001"), t.dataDir)
  }

  test("upsert flow (create + merge) works end-to-end on the store") {
    val t = tmpTable()
    TableOps.insertData(t, rows(1L -> "a", 2L -> "b"))
    TableOps.insertData(t, rows(2L -> "B", 3L -> "c"))
    assert(t.read.as[(Long, String)].collect().toMap ===
      Map(1L -> "a", 2L -> "B", 3L -> "c"))
  }

  test("bucketed incremental upsert works on the store") {
    val t = tmpTable(buckets = 4)
    TableOps.insertData(t, rows((1L to 16L).map(i => i -> s"v$i"): _*))
    TableOps.insertData(t, rows(7L -> "UPDATED"))
    val got = t.read.as[(Long, String)].collect().toMap
    assert(got.size === 16 && got(7L) === "UPDATED" && got(8L) === "v8")
  }

  test("a crashed never-published write reads as absent and recovers") {
    val t = tmpTable()
    val fs = new Path(t.path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(t.path, "v-00000000")) // crash before publish
    assert(!t.exists, "unpublished version dir must not count as data")
    assert(TableOps.getMax(t, "v").isEmpty)
    TableOps.insertData(t, rows(1L -> "a")) // recreates via overwrite
    assert(t.exists && t.read.count() === 1)
  }

  test("search-index sink commits without table-level renames too") {
    import graft.connections.SearchConnection
    val root = Files.createTempDirectory("graft-oss-idx").toString
    val c = new SearchConnection(spark, "es", s"$scheme://$root")
    c.insertData("docs", Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      key = "id", mergeOnDuplicates = true)
    c.insertData("docs", Seq((2L, "B"), (3L, "c")).toDF("id", "v"),
      key = "id", mergeOnDuplicates = true)
    val got = c.getAll("docs").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("v"))).toMap
    assert(got === Map(1L -> "a", 2L -> "B", 3L -> "c"))
  }

  test("legacy reader stays on old data while a first overwrite is mid-write") {
    val t = tmpTable()
    t.append(rows(1L -> "old", 2L -> "old2")) // legacy layout: data at root
    // simulate the first overwrite mid-write (or crashed before
    // publish): a real, file-bearing v-* dir nested under the root
    rows(9L -> "partial").write.parquet(s"${t.path}/v-00000000")
    // a lock-free reader must neither fail partition discovery on the
    // mixed-depth layout nor see the unpublished files
    assert(t.read.as[(Long, String)].collect().toMap ===
      Map(1L -> "old", 2L -> "old2"))
    assert(t.sizeBytes > 0L) // and size excludes the partial version
    val fs = new Path(t.path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val partialBytes = fs.getContentSummary(
      new Path(t.path, "v-00000000")).getLength
    // sizeBytes counts DATA files only: root-level _GRAFT_* metadata
    // (the append path's mutation counter, the bucket-layout guard)
    // is engine bookkeeping, not table contents
    val metaBytes = fs.listStatus(new Path(t.path))
      .filter(_.getPath.getName.startsWith("_GRAFT_"))
      .map(st => fs.getContentSummary(st.getPath).getLength).sum
    assert(t.sizeBytes ===
      fs.getContentSummary(new Path(t.path)).getLength - partialBytes - metaBytes)
  }

  test("a torn pointer read heals to the committed version") {
    val t = tmpTable()
    t.overwrite(rows(1L -> "a"))
    val fs = new Path(t.path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // truncate-then-write stores can expose a partial pointer: content
    // that is nonEmpty but names no version directory
    val out = fs.create(new Path(t.path, "_CURRENT"), true)
    out.write("v-000".getBytes("UTF-8")); out.close()
    // reader routes through retry-then-heal (newest _SUCCESS version)
    assert(t.read.as[(Long, String)].collect().toSeq === Seq(1L -> "a"))
    assert(t.dataDir.endsWith("v-00000000"), t.dataDir)
  }

  test("crash leftovers and legacy files are GC'd by the next commit") {
    val t = tmpTable()
    // legacy layout: append-created table, data at the root
    t.append(rows(1L -> "old"))
    assert(t.read.count() === 1)
    // plant a crashed un-published version write
    val fs = new Path(t.path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(t.path, "v-00000099"))
    // first overwrite migrates to versioned layout and cleans both;
    // the crashed name is SKIPPED, not recycled (freshVersion — names
    // stay publish-unique even across crash debris)
    t.overwrite(rows(2L -> "new"))
    assert(t.read.as[(Long, String)].collect().toSeq === Seq(2L -> "new"))
    // root-level _GRAFT_* metadata (here: the legacy-era mutation
    // counter the append wrote) is deliberately SPARED by gc — the
    // bucket-layout guard rides the same exemption
    val names = fs.listStatus(new Path(t.path)).map(_.getPath.getName).toSet
    assert(names === Set("_CURRENT", "v-00000100", "_GRAFT_MUTS"), names)
  }

  test("rollback re-publishes the retained prior snapshot atomically") {
    val t = tmpTable()
    t.overwrite(rows(1L -> "good"))
    t.overwrite(rows(2L -> "bad"))
    // the pre-rollback state is readable as the retained snapshot
    assert(t.versions === Seq("v-00000001", "v-00000000"))
    assert(t.readVersion("v-00000000").as[(Long, String)]
      .collect().toSeq === Seq(1L -> "good"))
    t.rollback()
    assert(t.read.as[(Long, String)].collect().toSeq === Seq(1L -> "good"))
    // the rolled-back-FROM version survives for forensics...
    assert(t.readVersion("v-00000001").as[(Long, String)]
      .collect().toSeq === Seq(2L -> "bad"))
    // ...and the next forward commit supersedes it under a FRESH name
    // (the demoted v-00000001's name is never recycled for different
    // data — consumers key snapshots by name); GC then drops the bad
    // version and the rolled-back-to v-00000000 is the retained prior
    t.overwrite(rows(3L -> "fixed"))
    assert(t.read.as[(Long, String)].collect().toSeq === Seq(3L -> "fixed"))
    assert(t.versions === Seq("v-00000002", "v-00000000"))
    assert(t.readVersion("v-00000000").as[(Long, String)]
      .collect().toSeq === Seq(1L -> "good"))
  }

  test("rollback ignores a crashed never-published newer version") {
    val t = tmpTable()
    t.overwrite(rows(1L -> "good"))
    t.overwrite(rows(2L -> "bad"))
    // simulate a crash AFTER the v-00000002 write job finished
    // (_SUCCESS present) but BEFORE its pointer PUT: the directory is
    // on disk and complete, yet it was never committed
    rows(3L -> "crashed").write.parquet(s"${t.path}/v-00000002")
    assert(t.versions.contains("v-00000002"))
    assert(t.read.as[(Long, String)].collect().toSeq === Seq(2L -> "bad"))
    t.rollback()
    // must land on the committed prior (v0), NOT the crashed v2
    assert(t.read.as[(Long, String)].collect().toSeq === Seq(1L -> "good"))
  }

  test("rollback with no prior snapshot refuses instead of corrupting") {
    val t = tmpTable()
    t.overwrite(rows(1L -> "only"))
    val e = intercept[IllegalArgumentException](t.rollback())
    assert(e.getMessage.contains("no prior snapshot"))
    assert(t.read.count() === 1)
  }

  test("a torn pointer heals to the write-ahead intent: crashed rollback stays rolled back") {
    val t = tmpTable()
    t.overwrite(rows(1L -> "good")) // v-00000000
    t.overwrite(rows(2L -> "bad"))  // v-00000001 live
    val fs = new Path(t.path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def write(p: Path, s: String): Unit = {
      val out = fs.create(p, true)
      try out.write(s.getBytes("UTF-8")) finally out.close()
    }
    // simulate rollback() crashing mid-pointer-PUT: the intent record
    // names the rollback target, the pointer is torn
    write(VersionedLayout.intent(t.path), "v-00000000")
    write(VersionedLayout.pointer(t.path), "v-0")
    // newest-_SUCCESS fallback would resurrect the bad v1; the intent
    // must win
    assert(t.read.as[(Long, String)].collect().toSeq === Seq(1L -> "good"))
  }

  test("an absent pointer with a live intent reads as the in-flight publish") {
    val t = tmpTable()
    t.overwrite(rows(1L -> "a")) // v-00000000
    t.overwrite(rows(2L -> "b")) // v-00000001
    val fs = new Path(t.path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // mid-overwrite-rename window: pointer momentarily gone, intent present
    val out = fs.create(VersionedLayout.intent(t.path), true)
    try out.write("v-00000001".getBytes("UTF-8")) finally out.close()
    fs.delete(VersionedLayout.pointer(t.path), false)
    assert(t.read.as[(Long, String)].collect().toSeq === Seq(2L -> "b"))
  }

  test("pointer absent AND intent already consumed: reader re-reads before concluding legacy") {
    // The narrowest mid-publish window: a rename-based publish consumes
    // the intent file as it installs the pointer. A reader can observe
    // pointer-absent (before the rename lands) and then intent-absent
    // (after the rename consumed it) — both probes miss, yet the table
    // is versioned and published. Concluding "legacy layout" here makes
    // readRaw list an empty root. The reader must re-read the pointer
    // once before giving up.
    val t = tmpTable()
    t.overwrite(rows(1L -> "a")) // v-00000000 published, pointer on disk
    val conf = spark.sparkContext.hadoopConfiguration
    val inner = new Path(t.path).getFileSystem(conf)
    // an fs whose FIRST _CURRENT existence probe misses (the reader
    // arriving just before the rename lands); every later probe sees
    // the real file — exactly the interleaving above
    val fs = new RawLocalFileSystem {
      private var blinks = 1
      override def exists(p: Path): Boolean = {
        if (p.getName == VersionedLayout.Current && blinks > 0) {
          blinks -= 1
          false
        } else super.exists(p)
      }
    }
    fs.initialize(java.net.URI.create("file:///"), conf)
    val root = new Path(t.path).toUri.getPath // strip scheme for the raw-local fs
    assert(VersionedLayout.currentVersion(fs, root) === Some("v-00000000"))
    // and with the pointer truly absent (legacy layout), still None
    inner.delete(VersionedLayout.pointer(t.path), false)
    assert(VersionedLayout.currentVersion(inner, t.path) === None)
  }

  test("diffVersions emits the keyed insert/delete/update change set") {
    val t = tmpTable()
    t.overwrite(rows(1L -> "a", 2L -> "b", 3L -> "c")) // v-00000000
    t.overwrite(rows(2L -> "B", 3L -> "c", 4L -> "d")) // v-00000001
    val d = t.diffVersions("v-00000000", "v-00000001", "id")
      .orderBy("id").collect()
    assert(d.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq(1L -> "delete", 2L -> "update", 4L -> "insert"),
      "unchanged rows (id 3) must not appear")
    val upd = d(1)
    assert(upd.getStruct(2).getAs[String]("v") === "b") // before
    assert(upd.getStruct(3).getAs[String]("v") === "B") // after
    val ins = d(2)
    assert(ins.isNullAt(2) && ins.getStruct(3).getAs[String]("v") === "d")
    // swapped arguments would silently invert insert/delete — refused
    val e = intercept[IllegalArgumentException](
      t.diffVersions("v-00000001", "v-00000000", "id"))
    assert(e.getMessage.contains("older, newer"))
  }

  test("diffVersions aligns evolved schemas by name and matches null keys") {
    val t = tmpTable()
    t.overwrite(Seq((Some(1L), "a"), (Some(2L), "b"), (None: Option[Long], "n"))
      .toDF("id", "v"))                                  // v-00000000
    t.overwrite(Seq((Some(1L), "a", Some(7L)), (None: Option[Long], "n", None: Option[Long]))
      .toDF("id", "v", "w"))                             // v-00000001: +w column
    val d = t.diffVersions("v-00000000", "v-00000001", "id").collect()
      .map(r => (Option(r.get(0)), r.getString(1))).toSet
    // id 2 deleted; id 1 updated (w went null -> 7); the null-keyed row
    // is UNCHANGED modulo the all-null new column — null-safe struct
    // equality must not emit a delete+insert pair for it
    assert(d === Set(Some(2L) -> "delete", Some(1L) -> "update"))
  }

  test("publishVersion redoes a mistaken rollback") {
    val t = tmpTable()
    t.overwrite(rows(1L -> "old"))
    t.overwrite(rows(2L -> "new"))
    t.rollback() // oops — "new" was actually fine
    assert(t.read.as[(Long, String)].collect().toSeq === Seq(1L -> "old"))
    t.publishVersion("v-00000001")
    assert(t.read.as[(Long, String)].collect().toSeq === Seq(2L -> "new"))
    // but only versions that exist on disk are publishable
    val e = intercept[IllegalArgumentException](t.publishVersion("v-00000042"))
    assert(e.getMessage.contains("not on disk"))
  }
}
