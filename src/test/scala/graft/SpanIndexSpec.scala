package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextClean

/** Lifecycle of the persisted span index (q198's state): aged
  * indexing, additive merge, and watermarked compaction — the
  * AggView-style maintenance discipline applied to span-dedup state.
  * The core contract pinned here: compaction NEVER changes the dedup
  * report for content the pruned index retains (every n_docs >= 2 row
  * survives), and the one thing it gives up — re-pairing with a
  * pruned singleton — is pinned loudly as the watermark's documented
  * loss, not discovered in production.
  */
class SpanIndexSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val boiler = "all rights reserved by the graft project"
  // batch 1: boilerplate in two docs (repeated -> retained forever),
  // plus singleton junk that never repeats
  private val b1 = Seq(
    (1L, s"alpha beta $boiler gamma"),
    (2L, s"$boiler delta epsilon"),
    (3L, "unique junk string one two three four five")).toDF("doc_id", "text")
  // batch 2: more singletons
  private val b2 = Seq(
    (4L, "second batch singleton content six seven eight")).toDF("doc_id", "text")

  private def agedIndex = TextClean.spanIndexMergeAged(Seq(
    TextClean.spanIndexAged(b1, "doc_id", "text", batchId = 1L, k = 3),
    TextClean.spanIndexAged(b2, "doc_id", "text", batchId = 2L, k = 3)))

  private def spans(batch: org.apache.spark.sql.DataFrame,
      index: org.apache.spark.sql.DataFrame) =
    TextClean.incrementalRepeatedSpans(batch, index.select("wh", "n_docs"),
        "doc_id", "text", k = 3, minDocs = 2)
      ._1.orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq

  test("aged merge agrees with the un-aged index on (wh, n_docs)") {
    val plain = TextClean.spanIndexMerge(Seq(
        TextClean.spanIndex(b1, "doc_id", "text", k = 3),
        TextClean.spanIndex(b2, "doc_id", "text", k = 3)))
      .collect().map(r => r.getAs[Array[Byte]](0).toSeq -> r.getLong(1)).toMap
    val aged = agedIndex.collect()
      .map(r => r.getAs[Array[Byte]](0).toSeq -> r.getLong(1)).toMap
    assert(aged === plain)
  }

  test("watermark below every batch prunes nothing (identity)") {
    val idx = agedIndex
    assert(TextClean.spanIndexCompact(idx, watermarkBatch = 0L).count() ===
      idx.count())
  }

  test("compaction shrinks the index but preserves the report for retained content") {
    val idx = agedIndex
    val compacted = TextClean.spanIndexCompact(idx, watermarkBatch = 2L)
    // singletons dominate window content; only the boilerplate's
    // repeated windows survive
    assert(compacted.count() < idx.count())
    assert(compacted.filter($"n_docs" < 2).count() === 0)
    // a new batch repeating the RETAINED boilerplate reports the same
    // spans against the compacted index as against the full one
    val b3 = Seq((9L, s"nine ten $boiler eleven")).toDF("doc_id", "text")
    val got = spans(b3, compacted)
    assert(got === spans(b3, idx))
    assert(got.map(_._4) === Seq(boiler),
      "the boilerplate span must be reported at its true length")
  }

  test("the watermark's documented loss: a pruned singleton cannot re-pair") {
    val idx = agedIndex
    val compacted = TextClean.spanIndexCompact(idx, watermarkBatch = 2L)
    // batch 4 repeats batch-2's singleton verbatim: the FULL index
    // pairs it (n_docs reaches 2); the compacted index pruned the
    // singleton, so the first re-pairing is missed — the same
    // accepted loss as any watermark-evicted streaming state. Pinned
    // here so the trade-off is explicit, not discovered.
    val b4 = Seq(
      (10L, "second batch singleton content six seven eight")).toDF("doc_id", "text")
    assert(spans(b4, idx).nonEmpty)
    assert(spans(b4, compacted).isEmpty)
  }
}
