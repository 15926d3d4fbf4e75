package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.util.Pin

/** The lineage-cut escape hatch for driver-looped algorithms: locally
  * Pin is an eager localCheckpoint; with a checkpoint dir configured
  * (the cluster deployment signal) it must upgrade to a RELIABLE
  * storage checkpoint — same results, blocks on storage instead of
  * pinned executor memory, so losing an executor mid-loop cannot kill
  * a 100 TB job.
  *
  * Order-sensitive: the shared SparkContext has no public way to unset
  * a checkpoint dir, so the no-dir tests run first (declaration order)
  * and the suite leaves `spark.graft.checkpoint=local` behind so later
  * suites keep the local-cut behavior they were written against.
  */
class PinSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
    .toDF("src", "dst")

  test("auto mode without a checkpoint dir cuts locally") {
    assume(spark.sparkContext.getCheckpointDir.isEmpty)
    val df = Pin.cut(edges)
    assert(df.count() === 4)
  }

  test("reliable mode without a dir fails fast with a clear message") {
    assume(spark.sparkContext.getCheckpointDir.isEmpty)
    spark.conf.set("spark.graft.checkpoint", "reliable")
    try {
      val e = intercept[IllegalArgumentException] { Pin.cut(edges) }
      assert(e.getMessage.contains("setCheckpointDir"))
    } finally spark.conf.unset("spark.graft.checkpoint")
  }

  test("auto mode with a checkpoint dir writes a reliable checkpoint and preserves results") {
    val baseline = graft.ops.Graph.pagerank(edges, "src", "dst", iterations = 3)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val reliable = graft.ops.Graph.pagerank(edges, "src", "dst", iterations = 3)
        .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(reliable === baseline)
      // the reliable path must have materialized RDD checkpoint files
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => java.nio.file.Files.isRegularFile(p)).count()
      assert(wrote > 0, s"expected checkpoint files under $dir")
    } finally {
      // no public unset for the dir — pin later suites to local cuts
      spark.conf.set("spark.graft.checkpoint", "local")
    }
  }

  test("cutReplacing retires superseded reliable checkpoints; the live cut survives") {
    assume(spark.sparkContext.getCheckpointDir.isDefined)
    spark.conf.set("spark.graft.checkpoint", "reliable")
    try {
      val root = java.nio.file.Paths.get(
        new java.net.URI(spark.sparkContext.getCheckpointDir.get).getPath)
      def rddDirs: Long = java.nio.file.Files.walk(root)
        .filter(p => java.nio.file.Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("rdd-")).count()
      val before = rddDirs
      var df = Pin.cut(edges)
      // a 3-round loop holds ONE live checkpoint, not one per round
      for (_ <- 1 to 3)
        df = Pin.cutReplacing(df.select((col("src") + 1L).as("src"), col("dst")), df)
      assert(df.count() === 4)
      assert(rddDirs - before === 1,
        "superseded rounds' checkpoint dirs must be deleted")
      // a DERIVED frame is deliberately not retired (its cut may be
      // shared with other live frames)…
      Pin.retire(df.select(col("dst")))
      assert(rddDirs - before === 1)
      // …while retiring the direct cut returns the dir to its
      // starting population
      Pin.retire(df)
      assert(rddDirs === before)
    } finally spark.conf.set("spark.graft.checkpoint", "local")
  }

  test("rewired fixpoint loops run reliably-checkpointed with bounded dir growth") {
    assume(spark.sparkContext.getCheckpointDir.isDefined)
    // the loops whose retirement was rewired this round: connected
    // components (q32 consumes propagateLabels/starContract) and the
    // multi-round BPE trainer (q187). Under reliable cuts each must
    // (a) produce the same rows as the local-cut run and (b) leave a
    // BOUNDED number of checkpoint dirs — seeds + final frame, not one
    // per round (20-round loops would otherwise leave 20).
    val root = java.nio.file.Paths.get(
      new java.net.URI(spark.sparkContext.getCheckpointDir.get).getPath)
    def rddDirs: Long = java.nio.file.Files.walk(root)
      .filter(p => java.nio.file.Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("rdd-")).count()
    for (q <- Seq("q32_neardup_dedup", "q187_bpe_train",
        "q167_label_prop", "q150_kcore")) {
      val localRows = SparkEntry.queries(q)(spark, sf)
        .collect().map(_.toString).sorted.toSeq
      val alt = spark.newSession()
      alt.conf.set("spark.graft.checkpoint", "reliable")
      val before = rddDirs
      val reliableRows = SparkEntry.queries(q)(alt, sf)
        .collect().map(_.toString).sorted.toSeq
      assert(reliableRows === localRows, s"$q reliable != local")
      val leftover = rddDirs - before
      assert(leftover <= 6,
        s"$q left $leftover checkpoint dirs — retirement not reclaiming rounds")
    }
  }

  test("retire on a never-cut frame is a no-op") {
    Pin.retire(edges) // no LogicalRDD leaves — must not throw
    assert(edges.count() === 4)
  }

  test("explicit local mode ignores the checkpoint dir") {
    spark.conf.set("spark.graft.checkpoint", "local")
    val df = Pin.cut(edges.select(col("src"), col("dst")))
    assert(df.count() === 4)
  }

  test("unknown mode is rejected") {
    spark.conf.set("spark.graft.checkpoint", "bogus")
    try {
      val e = intercept[IllegalArgumentException] { Pin.cut(edges) }
      assert(e.getMessage.contains("auto|local|reliable"))
    } finally spark.conf.set("spark.graft.checkpoint", "local")
  }
}
