package graft

import scala.jdk.CollectionConverters._
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.scalatest.funsuite.AnyFunSuite

/** Evidence for `ParquetTable.optimizeLayout`'s data-skipping claim:
  * after a range-clustered rewrite the parquet FOOTERS themselves must
  * show globally disjoint sort-key ranges across files — that (not the
  * in-memory sort order) is what row-group pruning reads at scan time,
  * so it is what makes a point/range predicate touch ~one file's row
  * groups on a table of any size.
  */
class LayoutSkippingSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** (min, max) of `column` per data file, straight from the footers. */
  private def fileRanges(dataDir: String, column: String): Seq[(Long, Long)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    new java.io.File(dataDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).toSeq
      .map { f =>
        val r = ParquetFileReader.open(
          HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf))
        try {
          val stats = r.getFooter.getBlocks.asScala.map { b =>
            b.getColumns.asScala
              .find(_.getPath.toDotString == column)
              .getOrElse(fail(s"no column $column in ${f.getName}"))
              .getStatistics
          }
          (stats.map(_.genericGetMin.asInstanceOf[java.lang.Long].longValue).min,
            stats.map(_.genericGetMax.asInstanceOf[java.lang.Long].longValue).max)
        } finally r.close()
      }
  }

  test("optimizeLayout writes disjoint per-file key ranges (flat table)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-layout")
      .resolve("t").toString
    val t = graft.sources.ParquetTable(spark, dir)
    // key order scrambled by a coprime multiplier: before clustering,
    // every file's (min, max) spans nearly the whole domain
    val n = 20000L
    t.overwrite((0L until n).map(i => ((i * 7919L) % n, s"v$i"))
      .toDF("k", "v").repartition(8))
    val before = fileRanges(t.dataDir, "k")
    assert(before.size >= 2)
    assert(before.forall { case (lo, hi) => hi - lo > n / 2 },
      s"pre-clustering files should span the domain: $before")

    t.optimizeLayout(Seq("k"), targetFileBytes = 32L * 1024)

    val ranges = fileRanges(t.dataDir, "k").sortBy(_._1)
    assert(ranges.size >= 2, s"expected a multi-file layout, got $ranges")
    ranges.sliding(2).foreach {
      case Seq((_, hiA), (loB, _)) =>
        assert(hiA < loB, s"overlapping file ranges: $ranges")
      case _ =>
    }
    // the rewrite is layout-only
    val got = t.read.agg(
      org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)),
      org.apache.spark.sql.functions.sum($"k")).head
    assert(got.getLong(0) === n)
    assert(got.getLong(1) === n * (n - 1) / 2)
  }

  test("optimizeLayout on a bucketed table keeps bucket pruning and sorts within files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-layout-b")
      .resolve("t").toString
    val t = graft.sources.ParquetTable(spark, dir, buckets = 4, bucketKey = "id")
    t.overwrite((0L until 4000L).map(i => ((i * 31L) % 4000, (i * 7919L) % 4000))
      .toDF("id", "k").repartition(8))

    t.optimizeLayout(Seq("k"), targetFileBytes = 16L * 1024)

    // bucket partition dirs survive (partition pruning intact)
    val bucketDirs = new java.io.File(t.dataDir).listFiles()
      .filter(_.getName.startsWith("__bucket=")).map(_.getName).toSet
    assert(bucketDirs === (0 until 4).map(b => s"__bucket=$b").toSet)
    // every file is internally sorted on the cluster key → narrow,
    // monotone row-group stats inside each bucket partition
    for (bd <- bucketDirs;
         f <- new java.io.File(s"${t.dataDir}/$bd").listFiles()
           if f.getName.endsWith(".parquet")) {
      val ks = spark.read.parquet(f.getAbsolutePath)
        .select($"k").collect().map(_.getLong(0)).toSeq
      assert(ks === ks.sorted, s"file ${f.getName} not sorted on k")
    }
    assert(t.read.count() === 4000L)
  }

  test("optimizeLayoutZOrder shrinks per-file bounding boxes on BOTH columns") {
    // 128x128 grid in scrambled order: after lexicographic clustering
    // on x alone, every file's y-range spans the domain; after
    // Z-ordering, each file covers a compact (x, y) rectangle so BOTH
    // footer ranges prune
    val side = 128L
    val rows = (0L until side * side).map { i =>
      val s = (i * 7919L) % (side * side)
      (s % side, s / side, i)
    }
    // the data-skipping statistic: a predicate on dimension d touches
    // only files whose footer [min, max] on d contains the value, so
    // the mean per-file WIDTH on d is what prunes (width/side = the
    // expected fraction of files a point query on d must read)
    def meanWidth(ranges: Seq[(Long, Long)]): Double =
      ranges.map { case (lo, hi) => (hi - lo + 1).toDouble }.sum / ranges.size

    val lexDir = java.nio.file.Files.createTempDirectory("graft-zorder-lex")
      .resolve("t").toString
    val lex = graft.sources.ParquetTable(spark, lexDir)
    lex.overwrite(rows.toDF("x", "y", "v").repartition(8))
    lex.optimizeLayout(Seq("x", "y"), targetFileBytes = 8L * 1024)
    val lexY = fileRanges(lex.dataDir, "y")

    val zDir = java.nio.file.Files.createTempDirectory("graft-zorder-z")
      .resolve("t").toString
    val z = graft.sources.ParquetTable(spark, zDir)
    z.overwrite(rows.toDF("x", "y", "v").repartition(8))
    z.optimizeLayoutZOrder(Seq("x", "y"), targetFileBytes = 8L * 1024)
    val zX = fileRanges(z.dataDir, "x")
    val zY = fileRanges(z.dataDir, "y")

    assert(zY.size >= 4, s"expected a multi-file layout, got $zY")
    // lexicographic (x, y) clustering cannot prune y: every file's
    // y-range spans ~the whole domain
    assert(meanWidth(lexY) > side * 0.9,
      s"lex y-ranges should span the domain: $lexY")
    // Z-ordering bounds BOTH dimensions (a Morton segment can straddle
    // one high-bit boundary, so ~0.5·side mean width is the curve's
    // natural plateau at this file count — far from lex's full-width y)
    assert(meanWidth(zX) < side * 0.6,
      s"z-order x-widths too large: $zX")
    assert(meanWidth(zY) < side * 0.6,
      s"z-order y-widths too large: $zY")
    assert(meanWidth(zY) < meanWidth(lexY) / 2,
      s"z-order y (${meanWidth(zY)}) should beat lexicographic (${meanWidth(lexY)})")
    // the rewrite is layout-only
    assert(z.read.agg(org.apache.spark.sql.functions.sum($"v")).head.getLong(0)
      === (side * side - 1) * side * side / 2)
  }
}
