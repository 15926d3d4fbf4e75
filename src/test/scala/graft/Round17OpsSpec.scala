package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Sample, Similarity, TfIdf}

/** Semantics contracts for the round-17 operators (oracle queries
  * q232–q234 hash-check against DuckDB per-SF; here we pin the
  * hand-computed water-fill, lift, and prune verdicts plus the edge
  * branches a corpus oracle can't isolate).
  */
class Round17OpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // ------------------------------------------- mixtureAllocate (q232)

  private def mixCorpus = Seq(
    // (class, weight) expanded to rows: A 100, B 100, C 1000, D 50
    ("A", 100L), ("B", 100L), ("C", 1000L), ("D", 50L))
    .toDF("cls", "w")

  private val mixShares = Map("A" -> 500000L, "B" -> 300000L, "C" -> 200000L)

  test("mixtureAllocate: hand-computed water-fill — A caps, B/C split " +
      "the residual exactly, share-0 D reports zero") {
    // caps at 2 epochs: A 200, B 200, C 2000. Sorted by cap/share:
    // A (4e8), B (6.67e8), C (1e10). A: 200·1e6 <= 5e5·400 -> capped.
    // B: 200·5e5 = 1e8 > 3e5·(400-200) = 6e7 -> uncapped (and C after).
    // residual 200 over S' = 5e5: B 120, C 80, no remainder.
    val out = Sample.mixtureAllocate(mixCorpus, "cls", col("w"),
        mixShares, budget = 400L, maxEpochsPpm = 2000000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4),
          r.getLong(5), if (r.isNullAt(6)) -1L else r.getLong(6)))).toMap
    assert(out("A") === ((100L, 500000L, 200L, true, 200L, 2000000L)))
    assert(out("B") === ((100L, 300000L, 200L, false, 120L, 1200000L)))
    assert(out("C") === ((1000L, 200000L, 2000L, false, 80L, 80000L)))
    assert(out("D") === ((50L, 0L, 100L, false, 0L, -1L)))
  }

  test("mixtureAllocate: largest-remainder bump goes to the biggest " +
      "remainder and allocations sum to the budget") {
    // budget 401: residual 201 -> B base 120 rem 3e5, C base 80 rem
    // 2e5, deficit 1 -> B gets the +1.
    val out = Sample.mixtureAllocate(mixCorpus, "cls", col("w"),
        mixShares, budget = 401L, maxEpochsPpm = 2000000L)
      .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(out === Map("A" -> 200L, "B" -> 121L, "C" -> 80L, "D" -> 0L))
    assert(out.values.sum === 401L)
  }

  test("mixtureAllocate: when every source caps, the leftover budget " +
      "stays unallocated (never over-asks a source)") {
    val one = Seq(("A", 10L)).toDF("cls", "w")
    val out = Sample.mixtureAllocate(one, "cls", col("w"),
        Map("A" -> 1000000L), budget = 1000L, maxEpochsPpm = 2000000L)
      .collect()
    assert(out.length === 1)
    assert(out.head.getBoolean(4) === true)   // capped
    assert(out.head.getLong(5) === 20L)       // alloc = cap, not budget
  }

  // ------------------------------------------- clusterKeywords (q233)

  test("clusterKeywords: hand-computed integer lift and per-cluster " +
      "top-k") {
    val docs = Seq(
      (1L, "apple apple banana"), (2L, "apple cherry"),
      (3L, "dog dog dog")).toDF("doc_id", "text")
    val assign = Seq((1L, 0L), (2L, 0L), (3L, 1L)).toDF("doc_id", "cell_id")
    val out = TfIdf.clusterKeywords(docs, "doc_id", "text", assign,
        k = 5, minCount = 2)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    // c0: apple 3 of 5; corpus: apple 3 of 8 -> lift 1e6·3·8/(5·3)
    assert(out === Map(
      (0L, "apple") -> ((3L, 5L, 3L, 1600000L, 1L)),
      (1L, "dog") -> ((3L, 3L, 3L, 2666666L, 1L))))
  }

  test("clusterKeywords: minCount filters before ranking, singleton " +
      "terms never appear") {
    val docs = Seq((1L, "x y"), (2L, "x z")).toDF("doc_id", "text")
    val assign = Seq((1L, 0L), (2L, 0L)).toDF("doc_id", "cell_id")
    val terms = TfIdf.clusterKeywords(docs, "doc_id", "text", assign,
        k = 5, minCount = 2)
      .collect().map(_.getString(1)).toSet
    assert(terms === Set("x"))
  }

  // -------------------------------------------------- d4Prune (q234)

  test("d4Prune: dup beats proto beats kept, zero-norm survives with " +
      "null ccos") {
    val cents = Seq((0L, Seq(10.0, 0.0)), (1L, Seq(0.0, 10.0)))
      .toDF("cell_id", "cvec")
    val vecs = Seq(
      (0L, Seq(10.0, 0.0)),   // cell0, ccos 1.0 -> most prototypical
      (1L, Seq(10.0, 1.0)),   // cell0, ccos ~.99504
      (2L, Seq(10.0, 0.0)),   // exact dup of id0 -> 'dup'
      (3L, Seq(0.0, 10.0)),   // cell1, ccos 1.0 -> proto
      (4L, Seq(1.0, 10.0)),   // cell1, kept
      (5L, Seq(0.0, 0.0)))    // zero-norm: ties to cell0, null ccos
      .toDF("vec_id", "embedding")
    val out = Similarity.d4Prune(vecs, "vec_id", "embedding", cents,
        dupPpm = 999000L, protoPpm = 500000L)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(0), r.getString(2), r.isNullAt(3)))).toMap
    assert(out === Map(
      0L -> ((0L, "proto", false)),  // cell0 survivors 3 -> 1 proto
      1L -> ((0L, "kept", false)),
      2L -> ((0L, "dup", false)),
      5L -> ((0L, "kept", true)),    // zero-norm: ccos null, never dup
      3L -> ((1L, "proto", false)),  // cell1 survivors 2 -> 1 proto
      4L -> ((1L, "kept", false))))
  }

  test("d4Prune: the anti-chain rule drops a later dup even when its " +
      "earlier witness is itself a dup") {
    val cents = Seq((0L, Seq(1.0, 0.0))).toDF("cell_id", "cvec")
    val vecs = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(1.0, 0.0)), (2L, Seq(1.0, 0.0)))
      .toDF("vec_id", "embedding")
    val out = Similarity.d4Prune(vecs, "vec_id", "embedding", cents,
        dupPpm = 999000L, protoPpm = 0L)
      .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
    // id1 dups against id0; id2 dups against id0 AND the dropped id1 —
    // the one-pass rule still drops it (witness status is irrelevant)
    assert(out === Map(0L -> "kept", 1L -> "dup", 2L -> "dup"))
  }
}
