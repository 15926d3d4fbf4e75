package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ParquetTable, TableLease}
import graft.streaming.StreamingLift

/** The table-scoped single-writer contract as CODE: a live stream's
  * lease refuses standalone maintenance; terminated/crashed holders
  * reclaim; cross-host holders refuse until broken.
  */
class TableLeaseSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(name).resolve("t").toString

  test("second acquire refuses while the holder is alive, succeeds after release") {
    val t = ParquetTable(spark, tmp("graft-lease"))
    val l = TableLease.acquire(t, "first")
    val e = intercept[IllegalStateException](TableLease.acquire(t, "second"))
    assert(e.getMessage.contains("first"), s"refusal must name the holder: $e")
    l.release()
    TableLease.withLease(t, "second")(()) // now free
  }

  test("a dead same-host pid is crash-stale and reclaimed automatically") {
    val t = ParquetTable(spark, tmp("graft-lease-stale"))
    // forge a lease whose recorded pid cannot be running (far above
    // any real pid_max) on THIS host — the crashed-JVM shape
    val fs = new org.apache.hadoop.fs.Path(t.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(t.path, TableLease.LeaseFile)
    val host = java.net.InetAddress.getLocalHost.getHostName
    val out = fs.create(p, false)
    out.write((s"token=dead-1\nowner=crashed\npid=1999999999\n" +
      s"host=$host\nepoch=0\n").getBytes("UTF-8"))
    out.close()
    TableLease.withLease(t, "survivor")(()) // reclaims, no throw
  }

  test("a different-host holder refuses until broken explicitly") {
    val t = ParquetTable(spark, tmp("graft-lease-remote"))
    val fs = new org.apache.hadoop.fs.Path(t.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(t.path, TableLease.LeaseFile)
    val out = fs.create(p, false)
    out.write(("token=far-1\nowner=other-box\npid=42\n" +
      "host=some-other-host\nepoch=0\n").getBytes("UTF-8"))
    out.close()
    val e = intercept[IllegalStateException](TableLease.acquire(t, "local"))
    assert(e.getMessage.contains("other-box"))
    TableLease.break(t)
    TableLease.withLease(t, "local")(())
  }

  test("release is token-guarded: a broken-then-reacquired lease is not deleted by the old holder") {
    val t = ParquetTable(spark, tmp("graft-lease-token"))
    val old = TableLease.acquire(t, "old")
    TableLease.break(t) // operator force-reclaim
    val neu = TableLease.acquire(t, "new")
    old.release() // must NOT delete new's lease file
    assert(TableLease.holder(t).exists(_.get("owner").contains("new")),
      "old.release() must not orphan the re-acquired lease")
    neu.release()
  }

  test("standalone compaction refuses while a LIVE stream holds the index lease, runs after termination") {
    import org.apache.spark.sql.streaming.Trigger
    val srcDir = Files.createTempDirectory("graft-lease-src").toString
    val ckpt = Files.createTempDirectory("graft-lease-ckpt").toString
    val base = Files.createTempDirectory("graft-lease-nd")
    val index = ParquetTable(spark, base.resolve("idx").toString,
      buckets = 8, bucketKey = "band_key")
    val pairs = ParquetTable(spark, base.resolve("pairs").toString)
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    docs.write.parquet(srcDir + "/f1")
    // a CONTINUOUS (non-availableNow) stream: stays active after the
    // first batch drains — the live-holder window we need
    val q = StreamingLift.nearDupStream(spark, srcDir + "/*", docs.schema,
      index, pairs, "doc_id", "text", ckpt, availableNow = false)
    try {
      q.processAllAvailable()
      assert(q.isActive)
      val e = intercept[IllegalStateException](
        StreamingLift.compactNearDupIndex(index, "doc_id", 10000,
          index.bucketIds))
      assert(e.getMessage.contains("nearDupStream"),
        s"refusal must name the live stream: $e")
      // the side output's lease refuses consolidation too
      val e2 = intercept[IllegalStateException](
        StreamingLift.consolidateSideOutput(pairs,
          StreamingLift.lineageOf(spark, ckpt), 0L))
      assert(e2.getMessage.contains("nearDupStream"))
    } finally q.stop()
    q.awaitTermination()
    // terminated holder = reclaimable: maintenance now proceeds
    StreamingLift.compactNearDupIndex(index, "doc_id", 10000, index.bucketIds)
    StreamingLift.consolidateSideOutput(pairs,
      StreamingLift.lineageOf(spark, ckpt), 0L)
  }

  test("a second stream on the same index refuses while the first is live") {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val srcDir = Files.createTempDirectory("graft-lease2-src").toString
    val base = Files.createTempDirectory("graft-lease2")
    val index = ParquetTable(spark, base.resolve("idx").toString)
    val pairs = ParquetTable(spark, base.resolve("pairs").toString)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
      .write.parquet(srcDir + "/f1")
    val q = StreamingLift.nearDupStream(spark, srcDir + "/*", schema,
      index, pairs, "doc_id", "text",
      Files.createTempDirectory("graft-lease2-ck1").toString,
      availableNow = false)
    try {
      q.processAllAvailable()
      intercept[IllegalStateException] {
        StreamingLift.nearDupStream(spark, srcDir + "/*", schema,
          index, pairs, "doc_id", "text",
          Files.createTempDirectory("graft-lease2-ck2").toString)
      }
    } finally q.stop()
    q.awaitTermination()
  }

  test("optimizeLayout/rollback self-lease: refused under a held lease") {
    val t = ParquetTable(spark, tmp("graft-lease-maint"))
    t.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    t.overwrite(Seq((3L, "c")).toDF("id", "v"))
    val l = TableLease.acquire(t, "stream-ish")
    intercept[IllegalStateException](t.optimizeLayout(Seq("id")))
    intercept[IllegalStateException](t.rollback())
    intercept[IllegalStateException](t.compact())
    l.release()
    t.rollback() // free again
    assert(t.read.count() === 2L)
  }
}
