package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ParquetTable
import graft.streaming.StreamingLift

/** [[StreamingLift.consolidateSideOutput]] + the stamped
  * [[StreamingLift.pairsView]]: view-equality across a crash replay,
  * and the consolidated read no longer shuffling stamped history.
  */
class SideOutputConsolidationSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def pairsOf(rows: Seq[(Long, Long, String, Long, String)]): DataFrame =
    rows.toDF("doc_a", "doc_b", "pair_kind", "batch_id", "lineage")

  /** Sum of shuffle records written across every exchange the plan
    * executed (AQE-aware) — the "does the view re-shuffle settled
    * history" measurement.
    */
  private def shuffledRecords(df: DataFrame): Long = {
    df.collect() // execute so metrics populate
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    // manual walk: AQE query stages are leaf nodes, so TreeNode
    // collect never reaches the exchanges they wrap
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val into: Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case _ => Nil
      }
      p +: (p.children.flatMap(walk) ++ into)
    }
    walk(df.queryExecution.executedPlan).collect {
      case s: ShuffleExchangeLike =>
        s.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L)
    }.sum
  }

  test("consolidation dedups settled batches once; view identical across a crash replay, tail still distincts") {
    val out = ParquetTable(spark,
      Files.createTempDirectory("graft-cons").resolve("pairs").toString)
    val lin = "lin-a"
    // batches 0..2 with a replayed (bit-identical) batch 1 — the crash
    // window that already healed (its stamp landed later)
    val settled = pairsOf(Seq(
      (1L, 2L, "in_batch", 0L, lin),
      (3L, 4L, "vs_corpus", 1L, lin),
      (3L, 4L, "vs_corpus", 1L, lin), // replayed copy
      (5L, 6L, "in_batch", 2L, lin)))
    // batch 3 is ABOVE the applied watermark: its replay may still
    // arrive — consolidation must carry it verbatim
    val tail = pairsOf(Seq(
      (7L, 8L, "in_batch", 3L, lin),
      (7L, 8L, "in_batch", 3L, lin))) // crash-window duplicate
    out.append(settled.unionByName(tail))
    val before = StreamingLift.pairsView(out).collect().toSet

    StreamingLift.consolidateSideOutput(out, lin, appliedBatch = 2L)

    val after = StreamingLift.pairsView(out).collect().toSet
    assert(after === before, "consolidation must not change the view")
    assert(after.size === 4)
    // physically: settled duplicate gone, tail duplicate retained
    assert(out.read.filter(col("batch_id") === 1L).count() === 1L)
    assert(out.read.filter(col("batch_id") === 3L).count() === 2L)
    assert(out.tableMeta(StreamingLift.SideDedupedPrefix + lin) === "2")

    // idempotent + monotone: re-stamping an older watermark is a no-op
    StreamingLift.consolidateSideOutput(out, lin, appliedBatch = 1L)
    assert(out.tableMeta(StreamingLift.SideDedupedPrefix + lin) === "2")

    // the tail batch's stamp lands: its duplicate folds now
    StreamingLift.consolidateSideOutput(out, lin, appliedBatch = 3L)
    assert(out.read.count() === 4L)
    assert(StreamingLift.pairsView(out).collect().toSet === before)
  }

  test("stamped history no longer shuffles: the view's exchanges see only the unstamped tail") {
    val out = ParquetTable(spark,
      Files.createTempDirectory("graft-cons-plan").resolve("pairs").toString)
    val lin = "lin-b"
    // 5000 settled rows, 3 tail rows
    val settled = (1L to 5000L)
      .map(i => (i, i + 1L, "in_batch", i % 50, lin))
    val tail = Seq((9001L, 9002L, "in_batch", 50L, lin),
      (9001L, 9002L, "in_batch", 50L, lin), (9003L, 9004L, "in_batch", 51L, lin))
    out.append(pairsOf(settled ++ tail))

    // unstamped: the exactly-once view distincts EVERYTHING
    val naive = shuffledRecords(StreamingLift.pairsView(out))
    assert(naive >= 5000L, s"unstamped view must shuffle the history: $naive")

    StreamingLift.consolidateSideOutput(out, lin, appliedBatch = 49L)
    val stamped = shuffledRecords(StreamingLift.pairsView(out))
    assert(stamped <= 3L,
      s"stamped view must shuffle only the tail (3 rows), shuffled $stamped")
    assert(StreamingLift.pairsView(out).count() === 5002L)
  }

  test("two checkpoint lineages on one ledger stay structurally apart in ledgerView") {
    val srcDir = Files.createTempDirectory("graft-lin-src").toString
    val base = Files.createTempDirectory("graft-lin")
    val dest = ParquetTable(spark, base.resolve("corpus").toString)
    val audit = ParquetTable(spark, base.resolve("ledger").toString)
    val stop = Seq("the", "a", "of", "and", "to", "in")
    val good = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq((1L, good)).toDF("doc_id", "text")
    docs.write.parquet(srcDir + "/f1")
    val ck1 = Files.createTempDirectory("graft-lin-ck1").toString
    val ck2 = Files.createTempDirectory("graft-lin-ck2").toString
    StreamingLift.curationStream(spark, srcDir + "/*", docs.schema,
      dest, audit, "doc_id", "text", stop, ck1).awaitTermination(60000)
    // a FRESH checkpoint replays the same file as ITS batch 0 — a new
    // lineage, not a replay of the first lineage's batch 0
    StreamingLift.curationStream(spark, srcDir + "/*", docs.schema,
      dest, audit, "doc_id", "text", stop, ck2).awaitTermination(60000)

    val view = StreamingLift.ledgerView(audit)
      .select("lineage", "batch_id", "n_loaded").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(view.size === 2,
      s"two lineages' batch 0 must NOT merge into one row: $view")
    val l1 = StreamingLift.lineageOf(spark, ck1)
    val l2 = StreamingLift.lineageOf(spark, ck2)
    assert(l1 !== l2)
    assert(view((l1, 0L)) === 1L, "first lineage truly loaded the doc")
    assert(view((l2, 0L)) === 0L,
      "second lineage observed it as a corpus duplicate")
  }

  test("in-stream cadence: nearDupStream consolidates its own pairs under the stream lease") {
    val srcDir = Files.createTempDirectory("graft-cad-src").toString
    val ckpt = Files.createTempDirectory("graft-cad-ckpt").toString
    val base = Files.createTempDirectory("graft-cad")
    val index = ParquetTable(spark, base.resolve("idx").toString,
      buckets = 8, bucketKey = "band_key")
    val pairs = ParquetTable(spark, base.resolve("pairs").toString)
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    def run(): Unit = StreamingLift.nearDupStream(spark, srcDir + "/*",
      Seq((0L, "")).toDF("doc_id", "text").schema, index, pairs,
      "doc_id", "text", ckpt, consolidatePairsEvery = 1)
      .awaitTermination(120000)
    Seq((1L, text), (2L, text)).toDF("doc_id", "text")
      .write.parquet(srcDir + "/f1")
    run()
    Seq((3L, text)).toDF("doc_id", "text").write.parquet(srcDir + "/f2")
    run()
    val lin = StreamingLift.lineageOf(spark, ckpt)
    assert(pairs.tableMeta(StreamingLift.SideDedupedPrefix + lin) === "1",
      "every-batch cadence must stamp the just-applied batch")
    // all rows settled → view == raw read, duplicates impossible
    val raw = pairs.read.collect().toSet
    assert(StreamingLift.pairsView(pairs).collect().toSet === raw)
    assert(raw.nonEmpty, "the identical docs must have paired")
  }
}
