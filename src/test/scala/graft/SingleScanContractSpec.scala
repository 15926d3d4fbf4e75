package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The unconditional single-source-scan contracts (r15 verdict task 5):
  * [[graft.ops.Sample.proportionalSample]] and
  * [[graft.ops.ShardExport.packChunks]] both need a slim counts frame
  * AND a driver-side scalar read off it (the max quota; the prefix-sum
  * bounds). Without a lineage cut the scalar action re-executes the
  * source scan — acceptable only "if callers pin expensive lineage",
  * a conditional contract. Both now [[graft.util.Pin.cut]] the counts
  * frame internally, so the number of FileScans of the SOURCE parquet
  * in the final executed plan is fixed by construction: 1 for
  * proportionalSample (the heap pass — the quota side reads the pin),
  * 0 for packChunks (everything derives from the pinned counts).
  */
class SingleScanContractSpec extends AnyFunSuite {
  import TestSpark._

  private def fileScans(df: org.apache.spark.sql.DataFrame): Int =
    "Scan parquet|FileScan".r
      .findAllIn(df.queryExecution.executedPlan.toString).length

  private lazy val srcPath: String = {
    import spark.implicits._
    val p = java.nio.file.Files
      .createTempDirectory("graft-singlescan").resolve("docs.parquet")
    (1L to 200L).map(i => (i, s"s${i % 5}",
        Seq.fill((i % 7).toInt + 1)(s"w$i").mkString(" ")))
      .toDF("doc_id", "source", "text")
      .write.parquet(p.toString)
    p.toString
  }

  test("proportionalSample scans its source exactly once in the plan " +
      "(quota side reads the pinned counts)") {
    val df = spark.read.parquet(srcPath)
    val out = graft.ops.Sample.proportionalSample(df, "source", "doc_id",
      budget = 20L)
    assert(fileScans(out) === 1,
      "expected exactly the heap pass to scan the source; the quota " +
        "frame must come from the internal Pin.cut:\n" +
        out.queryExecution.executedPlan.toString)
    // and it still answers: exactly `budget` rows, quotas respected
    assert(out.count() === 20L)
    val over = out.groupBy(col("source")).agg(count(lit(1)).as("n"),
      max(col("quota")).as("q")).filter(col("n") > col("q")).count()
    assert(over === 0L)
  }

  test("packChunks plans zero source FileScans " +
      "(the whole plan derives from the pinned counts frame)") {
    val df = spark.read.parquet(srcPath)
    val out = graft.ops.ShardExport.packChunks(df, "doc_id", "text",
      chunkTokens = 16L)
    assert(fileScans(out) === 0,
      "expected the text scan to happen once inside the Pin.cut, not " +
        "in the result plan:\n" + out.queryExecution.executedPlan.toString)
    // totals preserved: chunk token fill sums to the corpus token count
    val totTok = df.select(sum(size(
      graft.functions.TextKernels.tokens(col("text")))).cast("long")).head.getLong(0)
    val filled = out.agg(sum(col("n_tokens"))).head.getLong(0)
    assert(filled === totTok)
  }

  test("mixtureAllocate plans zero source FileScans " +
      "(the water-fill runs entirely on the pinned per-class frame)") {
    val df = spark.read.parquet(srcPath)
    val out = graft.ops.Sample.mixtureAllocate(df, "source",
      size(graft.functions.TextKernels.tokens(col("text"))).cast("long"),
      Map("s0" -> 500000L, "s1" -> 300000L, "s2" -> 200000L),
      budget = 100L, maxEpochsPpm = 2000000L)
    assert(fileScans(out) === 0,
      "expected the per-class weight scan to happen once inside the " +
        "Pin.cut, not in the result plan (the participant/zero split " +
        "reads the counts frame twice):\n" +
        out.queryExecution.executedPlan.toString)
    // and the table stays budget-consistent: Σ alloc ≤ budget
    assert(out.agg(sum(col("alloc"))).head.getLong(0) <= 100L)
  }
}
