package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Benford, FeatureSelect, Graph, Interpolate, IntervalJoin,
  Itemsets, Quantize}

/** Semantics contracts for the round-7 operators (their oracle queries
  * q147–q153 hash-check against DuckDB at sf0.01; here we pin the
  * hand-computable cases and the edge behavior the oracles can't
  * isolate).
  */
class Round7OpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // ---------------------------------------------------------- k-core

  test("kcore peels the tail, keeps the clique, and converges") {
    // triangle+pendant: 1-2-3 clique, 4 hangs off 3, 5-6 isolated edge
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (5L, 6L))
      .toDF("a", "b")
    val core2 = Graph.kcore(edges, "a", "b", k = 2, rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 4 dies in round 1 (degree 1); 5,6 die too; clique survives at
    // degree 2 each (3's degree drops from 3 to 2 after the peel)
    assert(core2 === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // k=3: clique degrees are 2 < 3 → everything peels away
    assert(Graph.kcore(edges, "a", "b", k = 3, rounds = 3).isEmpty)
  }

  test("kcore fixed-round contract: one round may under-peel, more rounds refine") {
    // chain 1-2-3-4-5: k=2 leaves ends' neighbors exposed one at a time
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val r1 = Graph.kcore(chain, "a", "b", k = 2, rounds = 1).count()
    val r3 = Graph.kcore(chain, "a", "b", k = 2, rounds = 3).count()
    assert(r1 > r3) // round 1 still holds 2,3,4; by round 3 all gone
    assert(r3 === 0L)
  }

  test("kcoreConverged reaches the true core and reports the round count") {
    // chain + clique: the chain needs one peel per end node, the
    // clique survives — a fixed 1-round call would under-peel
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("a", "b")
    val (core, rounds) = Graph.kcoreConverged(edges, "a", "b", k = 2)
    val got = core.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(10L -> 2L, 11L -> 2L, 12L -> 2L))
    assert(rounds >= 2 && rounds <= 5) // chain peels end-in, then one no-op round
    // agrees with the fixed-round operator run past convergence
    val fixed = Graph.kcore(edges, "a", "b", k = 2, rounds = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === fixed)
    // empty input converges immediately
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    val (core0, rounds0) = Graph.kcoreConverged(empty, "a", "b", k = 2)
    assert(core0.isEmpty && rounds0 === 0)
  }

  test("pagerankDangling conserves mass that the drop variant leaks") {
    // star into a sink: 1→4, 2→4, 3→4 — node 4 is dangling
    val directed = Seq((1L, 4L), (2L, 4L), (3L, 4L)).toDF("a", "b")
    val drop = Graph.pagerank(directed, "a", "b", iterations = 3)
      .agg(sum("rank")).head().getLong(0)
    val keep = Graph.pagerankDangling(directed, "a", "b", iterations = 3)
      .agg(sum("rank")).head().getLong(0)
    // with redistribution total mass stays near 4·SCALE (flooring
    // residue only); dropping loses the sink's whole share each round
    assert(keep > drop)
    assert(keep > (4L * 1000000000000L * 95) / 100)
    // hand-check one round on a 2-node edge 1→2, damp 85/100:
    //   dangling = rank(2) = S; share = S/2
    //   r1(1) = 0.15S + ⌊85·(S/2)/100⌋       (only the dangling share)
    //   r1(2) = 0.15S + ⌊85·(S + S/2)/100⌋   (1's contrib + share)
    val tiny = Seq((1L, 2L)).toDF("a", "b")
    val got = Graph.pagerankDangling(tiny, "a", "b", iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val S = 1000000000000L
    assert(got(1L) === S * 15 / 100 + (85L * (S / 2)) / 100)
    assert(got(2L) === S * 15 / 100 + (85L * (S + S / 2)) / 100)
  }

  test("pagerankDangling equals pagerank on a symmetric (sink-free) graph") {
    val e0 = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("u", "v")
    val sym = e0.unionByName(e0.select($"v".as("u"), $"u".as("v")))
    val a = Graph.pagerank(sym, "u", "v", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Graph.pagerankDangling(sym, "u", "v", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  // ------------------------------------------------ int8 quantization

  test("int8Audit: hand-checked codes, all-zero vector, saturation bounds") {
    val df = Seq(
      (1L, Seq(1.0f, -1.0f, 0.5f)),
      (2L, Seq(0.0f, 0.0f, 0.0f)),
      (3L, Seq(2.0f))
    ).toDF("vec_id", "embedding")
    val got = Quantize.int8Audit(df, "vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r).toMap
    // v1: maxabs=1 → q = [127, -127, 63]; checksum = 127·1 −127·2 + 63·3
    val r1 = got(1L)
    assert(r1.getDouble(1) === 1.0)
    assert(r1.getLong(3) === 127L - 254L + 189L) // checksum
    assert(r1.getLong(4) === 127L - 127L + 63L)  // sum_q
    assert((r1.getLong(5), r1.getLong(6)) === ((-127L, 127L)))
    // all-zero vector: no NaN, codes all zero
    val r2 = got(2L)
    assert(r2.getDouble(1) === 0.0 && r2.getLong(3) === 0L &&
      r2.getLong(5) === 0L && r2.getLong(6) === 0L)
    // single-dim: own maxabs → exactly 127
    assert(got(3L).getLong(6) === 127L)
    // codes can never leave [-127, 127]
    assert(got.values.forall(r => r.getLong(5) >= -127L && r.getLong(6) <= 127L))
  }

  // ----------------------------------------------------- χ² selection

  test("chiSquareTokens scores the perfectly discriminative token highest") {
    // 4 docs: class X always says "alpha", class Y never does; "common"
    // appears everywhere (excluded: df = N), "mid" is mixed
    val docs = Seq(
      (1L, "X", "alpha common mid"),
      (2L, "X", "alpha common"),
      (3L, "Y", "common mid"),
      (4L, "Y", "common")
    ).toDF("doc_id", "cls", "text")
    val got = FeatureSelect.chiSquareTokens(docs, "text", "cls", "doc_id",
      minDf = 1L, minChi2Q = 0L).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    // "common" is in every doc → undefined χ², must be absent
    assert(!got.keys.exists(_._2 == "common"))
    // perfect separation: a=2,b=0,c=0,d=2 → χ² = N = 4 → 4·2²⁰
    assert(got(("X", "alpha")) === 4L * 1048576L)
    // only OBSERVED (class, token) cells emit — absence evidence lives
    // in the symmetric in-class row, so (Y, alpha) has no row
    assert(!got.contains(("Y", "alpha")))
    // mixed token scores 0 (independent)
    assert(got(("X", "mid")) === 0L)
  }

  test("chiSquareTokens honors minDf and the χ² threshold") {
    val docs = Seq(
      (1L, "X", "rare alpha"), (2L, "X", "alpha"),
      (3L, "Y", "beta"), (4L, "Y", "beta")
    ).toDF("doc_id", "cls", "text")
    val sel = FeatureSelect.chiSquareTokens(docs, "text", "cls", "doc_id",
      minDf = 2L, minChi2Q = 1048576L).collect().map(_.getString(1)).toSet
    assert(!sel.contains("rare")) // df 1 < minDf
    assert(sel === Set("alpha", "beta"))
  }

  // ---------------------------------------------- interval overlap join

  test("selfOverlapPairs finds exactly the overlapping pairs, once each") {
    // key g: [0,10] × [5,20] overlap 6; [5,20] × [21,30] touch nothing;
    // [0,10] × [10,12] overlap 1 (inclusive ends)
    val iv = Seq(
      ("g", 1L, 0L, 10L), ("g", 2L, 5L, 20L), ("g", 3L, 21L, 30L),
      ("g", 4L, 10L, 12L), ("h", 5L, 0L, 100L) // other key: no partner
    ).toDF("k", "id", "s", "e")
    for (w <- Seq(1L, 3L, 7L, 100L)) { // band width must not change semantics
      val got = IntervalJoin.selfOverlapPairs(iv, Seq("k"), "id", "s", "e", w)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got === Set((1L, 2L, 6L), (1L, 4L, 1L), (2L, 4L, 3L)),
        s"bandWidth=$w")
    }
    // derived-width overload: same pairs, width taken from the data
    val auto = IntervalJoin.selfOverlapPairs(iv, Seq("k"), "id", "s", "e")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(auto === Set((1L, 2L, 6L), (1L, 4L, 1L), (2L, 4L, 3L)))
  }

  test("derived bandWidth handles the empty and degenerate-interval inputs") {
    val empty = Seq.empty[(String, Long, Long, Long)].toDF("k", "id", "s", "e")
    assert(IntervalJoin.selfOverlapPairs(empty, Seq("k"), "id", "s", "e")
      .count() === 0)
    // all intervals inverted (s > e): filtered out, pre-pass sees none
    val inv = Seq(("g", 1L, 5L, 2L)).toDF("k", "id", "s", "e")
    assert(IntervalJoin.selfOverlapPairs(inv, Seq("k"), "id", "s", "e")
      .count() === 0)
  }

  // --------------------------------------------------- interpolation

  test("Interpolate.linear fills gaps with the exact integer lerp") {
    val base = Seq(
      ("a", 0L, Some(100L)), ("a", 1L, None), ("a", 2L, None),
      ("a", 3L, Some(400L)), ("a", 4L, None), // trailing gap: stays null
      ("b", 0L, None), ("b", 1L, Some(7L))    // leading gap: stays null
    ).toDF("g", "t", "v")
    val got = Interpolate.linear(base, "g", "t", "v").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got(("a", 0L)) === Some(100L))
    assert(got(("a", 1L)) === Some(200L)) // 100 + (400-100)·1/3
    assert(got(("a", 2L)) === Some(300L))
    assert(got(("a", 3L)) === Some(400L))
    assert(got(("a", 4L)) === None) // no right bracket
    assert(got(("b", 0L)) === None) // no left bracket
    assert(got(("b", 1L)) === Some(7L))
  }

  test("Interpolate.linear truncates the lerp toward zero deterministically") {
    val base = Seq(("g", 0L, Some(0L)), ("g", 1L, None), ("g", 2L, Some(1L)))
      .toDF("g", "t", "v")
    val mid = Interpolate.linear(base, "g", "t", "v").collect()
      .find(_.getLong(1) == 1L).get.getLong(3)
    assert(mid === 0L) // (0·1 + 1·1) div 2 = 0
  }

  // ------------------------------------------------- frequent pairs

  test("frequentPairs applies the A-Priori prune and counts presence once") {
    val docs = Seq(
      (1L, "a b c"), (2L, "a b"), (3L, "a b x"),
      (4L, "a a a b") // repeated token still counts once per doc
    ).toDF("doc_id", "text")
    val got = Itemsets.frequentPairs(docs, "doc_id", "text", minSupport = 3L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSet === Set(("a", "b", 4L)))
    // c (df 1) and x (df 1) never survive the singleton prune
  }

  // ------------------------------------------------------- Benford

  // ------------------------------------------------------- BM25

  test("bm25Rank: rarity dominates, tf saturates, length normalizes") {
    import graft.ops.Retrieval
    val docs = Seq(
      (1L, "rare common filler filler"),
      (2L, "common filler filler filler"),
      (3L, "rare rare rare common filler filler filler filler " +
        "filler filler filler filler filler filler filler filler")
    ).toDF("doc_id", "text")
    val got = Retrieval.bm25Rank(docs, "doc_id", "text",
      Seq("rare", "common"), k = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    // every doc matches a term → 3 rows; doc 1 (rare + short) beats
    // doc 2 (common only); ranking is (score DESC, id ASC)
    assert(got.map(_._1).length === 3)
    val byId = got.toMap
    assert(byId(1L) > byId(2L))
    // doc 3 has 3× the rare tf but is 4× longer — saturation + length
    // norm keep it below the clean short doc
    assert(byId(1L) > byId(3L))
    assert(got.sortBy(r => (-r._2, r._1)).toSeq === got.toSeq) // emitted in rank order
  }

  // ------------------------------------------------- sequence paths

  test("topPaths counts per-entity trigrams without crossing entities") {
    import graft.ops.Sequence
    val ev = Seq(
      (1L, 1L, 10L, "a"), (1L, 2L, 20L, "b"), (1L, 3L, 30L, "c"),
      (1L, 4L, 40L, "b"), (1L, 5L, 50L, "c"),
      (2L, 6L, 10L, "a"), (2L, 7L, 20L, "b"), (2L, 8L, 30L, "c")
    ).toDF("u", "eid", "ts", "t")
    val got = Sequence.topPaths(ev, "u", "ts", "eid", "t", gramLen = 3, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    // a,b,c twice (both users); b,c,b and c,b,c once (user 1);
    // nothing spans user 1 → user 2
    assert(got.head === (("a", "b", "c", 2L)))
    assert(got.toSet === Set(("a", "b", "c", 2L), ("b", "c", "b", 1L),
      ("c", "b", "c", 1L)))
  }

  // ------------------------------------------------------ salt plan

  test("saltPlan sizes per-key fan-out by measured volume") {
    import graft.ops.Skew
    val df = (1L to 250L).map(i => (if (i <= 200) "hot" else "cold", i))
      .toDF("k", "v")
    val plan = Skew.saltPlan(df, Seq("k"), targetRows = 100L).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(plan === Map("hot" -> ((200L, 2L)), "cold" -> ((50L, 1L))))
    val hotOnly = Skew.saltPlan(df, Seq("k"), 100L, includeAll = false)
      .collect().map(_.getString(0)).toSet
    assert(hotOnly === Set("hot"))
  }

  // -------------------------------------------------- JL projection

  test("jlProject: deterministic signs, exact integer sums, dim filter") {
    import graft.ops.Quantize
    val df = Seq(
      (1L, Seq(1.0f, 2.0f)), (2L, Seq(0.5f, -0.5f)),
      (9L, Seq(1.0f, 2.0f, 3.0f)) // wrong dims → excluded
    ).toDF("vec_id", "embedding")
    val got = Quantize.jlProject(df, "vec_id", "embedding", inDims = 2, outDims = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.size === 8) // 2 valid vectors × 4 dims
    assert(!got.keys.exists(_._1 == 9L))
    // reproduce the signs from the same public hash
    def sign(j: Int, i: Int): Long =
      if ((graft.functions.Kernels.hex60String(s"$j:$i") & 1L) == 0L) 1L else -1L
    for (j <- 0 until 4) {
      assert(got((1L, j.toLong)) === sign(j, 0) * (1L << 20) + sign(j, 1) * (2L << 20))
      assert(got((2L, j.toLong)) ===
        sign(j, 0) * (1L << 19) + sign(j, 1) * math.floor(-0.5 * (1 << 20)).toLong)
    }
  }

  // ------------------------------------------- farthest-point seeds

  test("farthestPointSeeds walks the greedy k-center trajectory with id ties") {
    import graft.ops.Similarity
    val pts = Seq(
      (1L, Seq(0.0f, 0.0f)), (2L, Seq(10.0f, 0.0f)),
      (3L, Seq(0.0f, 10.0f)), (4L, Seq(5.0f, 5.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.farthestPointSeeds(pts, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val u = 1L << 20 // coordinate quantum
    // seed 1: min id. Seed 2: ids 2 and 3 tie at d²=100u² → smaller id.
    // Seed 3: id 3 (min-dist 100u² to seed 1) beats id 4 (50u²).
    assert(got.toSeq === Seq((1L, 1L, 0L), (2L, 2L, 100L * u * u),
      (3L, 3L, 100L * u * u)))
  }

  // ------------------------------------------------ ring rebalance

  test("ringRebalancePlan: growing the ring only moves arcs new vnodes claim") {
    import graft.ops.ShardExport
    val ids = (1L to 500L).toDF("id")
    val plan = ShardExport.ringRebalancePlan(ids, "id", 16, 20).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(plan.map(_._3).sum === 500L) // partition of the ids
    assert(plan.forall(p => p._1 >= 0 && p._1 < 16 && p._2 >= 0 && p._2 < 20))
    // rings share the seed: the 16-shard ring is a SUBSET of the
    // 20-shard ring, so any id not claimed by a new shard's vnode
    // stays exactly where it was — the consistent-hashing contract
    assert(plan.filter(_._2 < 16).forall(p => p._1 === p._2))
    assert(plan.exists(p => p._1 === p._2)) // and some mass does stay
  }

  // -------------------------------------------- matryoshka energy

  test("prefixEnergyAudit: exact mass fractions, null on zero vectors") {
    import graft.ops.Quantize
    val df = Seq(
      (1L, Seq(1.0f, 1.0f)), (2L, Seq(0.0f, 0.0f)), (3L, Seq(0.0f, 3.0f))
    ).toDF("vec_id", "embedding")
    val got = Quantize.prefixEnergyAudit(df, "vec_id", "embedding", Seq(1, 2))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got((1L, 1L)) === Some(524288L)) // half the mass in dim 1
    assert(got((1L, 2L)) === Some(1048576L))
    assert(got((2L, 1L)) === None) // zero vector: undefined, not NaN
    assert(got((3L, 1L)) === Some(0L)) // none of the mass in dim 1
    assert(got((3L, 2L)) === Some(1048576L))
  }

  // ------------------------------------------------------ EMA

  test("Smooth.ema folds the exact integer recurrence per series") {
    import graft.ops.Smooth
    val df = Seq(
      ("a", 1L, 100L), ("a", 2L, 0L), ("a", 3L, 0L), ("a", 4L, 200L),
      ("b", 1L, 8L), ("b", 2L, 8L)
    ).toDF("g", "t", "x")
    val got = Smooth.ema(df, "g", "t", "x", alphaNum = 1L, alphaDen = 4L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    // a: y1=100, y2=(300+0)/4=75, y3=(225+0)/4=56, y4=(168+200)/4=92
    assert(got(("a", 1L)) === 100L)
    assert(got(("a", 2L)) === 75L)
    assert(got(("a", 3L)) === 56L)
    assert(got(("a", 4L)) === 92L)
    // constant series is a fixpoint; series never cross
    assert(got(("b", 1L)) === 8L && got(("b", 2L)) === 8L)
  }

  // -------------------------------------------- quantile normalize

  test("quantileNormalize: min-rank ties, full [0, 2^20] span, degenerate guard") {
    import graft.ops.Stats
    val df = Seq((1L, 10L), (2L, 20L), (3L, 20L), (4L, 40L), (5L, 50L))
      .toDF("id", "v")
    val got = Stats.quantileNormalize(df, "id", "v").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(1L) === 0L)                      // rank 1 → 0
    assert(got(2L) === got(3L))                 // ties share min-rank
    assert(got(2L) === (1048576L * 1) / 4)      // rank 2 of 5
    assert(got(4L) === (1048576L * 3) / 4)
    assert(got(5L) === 1048576L)                // max → exactly 2²⁰
    val one = Seq((1L, 7L), (2L, 7L)).toDF("id", "v")
    assert(Stats.quantileNormalize(one, "id", "v").collect()
      .forall(_.getLong(2) === 0L))             // N distinct = 1 → all 0
  }

  // ---------------------------------------------- byte histogram

  test("byteHistogram: exact byte classes, zero buckets, empty payloads dropped") {
    import graft.ops.Multimodal
    val df = Seq((1L, "AAaa  "), (2L, "")).toDF("doc_id", "text")
    val got = Multimodal.byteHistogram(
      Multimodal.ingest(df, "doc_id", "text", "text/plain"), "doc_id", 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(!got.keys.exists(_._1 == 2L)) // empty payload has no shape
    assert(got.size === 16)
    // 'A' = 0x41 → bucket 4; 'a' = 0x61 → 6; ' ' = 0x20 → 2
    assert(got((1L, 4L)) === ((2L, (1048576L * 2) / 6)))
    assert(got((1L, 6L)) === ((2L, (1048576L * 2) / 6)))
    assert(got((1L, 2L)) === ((2L, (1048576L * 2) / 6)))
    assert(got((1L, 0L)) === ((0L, 0L))) // zero bucket still emits
    assert(got.values.map(_._1).sum === 6L)
  }

  // ---------------------------------------------- survival curve

  test("kaplanMeier: exact product-limit trajectory over churn days") {
    import graft.ops.Survival
    // 4 users, last-active days: u1→1, u2→1, u3→2, u4→3
    val ev = Seq((1L, 0L), (1L, 1L), (2L, 1L), (3L, 2L), (4L, 0L), (4L, 3L))
      .toDF("uid", "day")
    val got = Survival.kaplanMeier(ev, "uid", "day").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val q = 1L << 20
    // day 1: n=4, d=2 → S = q/2; day 2: n=2, d=1 → S = q/4;
    // day 3: n=1, d=1 → S = 0
    assert(got(1L) === ((4L, 2L, q / 2)))
    assert(got(2L) === ((2L, 1L, q / 4)))
    assert(got(3L) === ((1L, 1L, 0L)))
  }

  // ---------------------------------------------- hard negatives

  test("hardNegatives skips presumed positives, stays in-cell, excludes self") {
    import graft.ops.Similarity
    // one dominant cell: centroid c0 = (1, 0); all vectors near it.
    // similarity to query (id 10) is ordered by construction.
    val cents = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(-1.0f, 0.0f)))
      .toDF("cell_id", "cvec")
    val vecs = (Seq((10L, Seq(1.0f, 0.0f))) ++ // the query
      (1 to 6).map(i => (i.toLong, Seq(1.0f, 0.1f * i))) ++ // same cell
      Seq((99L, Seq(-1.0f, 0.0f)))) // other cell — must never appear
      .toDF("vec_id", "embedding")
    val got = Similarity.hardNegatives(vecs, "vec_id", "embedding", cents,
      queryIds = Seq(10L), skip = 2, k = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // in-cell ranking by integer dot with q=(1,0): dot = xq_1 (const)
    // + 0 → ties on the first coord broken by id ASC: ids 1..6 all tie
    // → ranks 1..6 are ids 1..6; skip 2, take 3 → ids 3,4,5
    assert(got.toSeq === Seq((3L, 3L), (4L, 4L), (5L, 5L)))
    assert(!got.exists(_._2 == 10L) && !got.exists(_._2 == 99L))
  }

  // ------------------------------------------------- winsorize

  test("winsorizeReport: exact bounds, tail counts, clipped mass") {
    import graft.ops.Robust
    // 10 values 1..10 in one group; p=10% → lo = 1 (cum 1 ≥ 1),
    // hi = 9 (cum 9 ≥ 9): one row above, none below
    val df = (1L to 10L).map(("g", _)).toDF("grp", "v")
    val r = Robust.winsorizeReport(df, "grp", "v", 10, 100).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((10L, 1L, 9L)))
    assert((r.getLong(4), r.getLong(5)) === ((0L, 1L))) // n_below, n_above
    assert(r.getLong(6) === 55L)      // raw sum
    assert(r.getLong(7) === 54L)      // 10 clipped to 9
  }

  // -------------------------------------------- label propagation

  test("labelPropagation: majority vote with smallest-label ties, sync rounds") {
    import graft.ops.Graph
    // triangle 1-2-3 (labels 0,0,1) + pendant 4 on 3 (label 1)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val labels = Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L)).toDF("n", "l")
    val r1 = Graph.labelPropagation(edges, "a", "b", labels, "n", "l", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // node 1 sees {0, 1} → tie → 0; node 2 same; node 3 sees {0, 0, 1}
    // → 0; node 4 sees {1} → 1
    assert(r1 === Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L))
    val r2 = Graph.labelPropagation(edges, "a", "b", labels, "n", "l", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 2 from r1: node 4 now sees node 3's label 0 → converges to 0
    assert(r2 === Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
  }

  // ------------------------------------------------ IVF cell stats

  test("ivfCellStats: exact shares, balance of 2^20 means perfectly even") {
    import graft.ops.Similarity
    val cents = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(-1.0f, 0.0f)))
      .toDF("cell_id", "cvec")
    val vecs = Seq(
      (1L, Seq(1.0f, 0.1f)), (2L, Seq(1.0f, -0.1f)), (3L, Seq(0.9f, 0.0f)),
      (4L, Seq(-1.0f, 0.1f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.ivfCellStats(vecs, "embedding", cents).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(0L) === ((3L, (1048576L * 3) / 4, (1048576L * 3 * 2) / 4)))
    assert(got(1L) === ((1L, 1048576L / 4, 1048576L / 2)))
    // a perfectly even split would put balance_q at exactly 2^20
    assert(got.values.map(_._1).sum === 4L)
  }

  // --------------------------------------------------- PMI pairs

  test("pmiPairs ranks the always-together pair above the independent one") {
    import graft.ops.TfIdf
    // x and y always co-occur (PMI = N/(2·2) · 2²⁰ → 2·2²⁰ at N=4);
    // x and z co-occur once out of independent spread (ratio 1·2²⁰)
    val docs = Seq(
      (1L, "x y z"), (2L, "x y"), (3L, "z w"), (4L, "w q")
    ).toDF("doc_id", "text")
    val got = TfIdf.pmiPairs(docs, "doc_id", "text",
      minSupport = 1L, minPmiQ = 0L).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got(("x", "y")) === ((2L, 2L * 1048576L))) // perfect association
    assert(got(("x", "z")) === ((1L, 1048576L)))      // exactly independence
    // threshold above independence drops the independent pair
    val sel = TfIdf.pmiPairs(docs, "doc_id", "text", 1L, 1048577L).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(sel.contains(("x", "y")) && !sel.contains(("x", "z")))
  }

  test("firstDigitAudit: digits, zero-filled rows, exact quantized masses") {
    val df = Seq(
      ("g", 123L), ("g", 19L), ("g", 155L), ("g", 900L),
      ("g", -5L), ("g", 0L) // non-positive rows are excluded
    ).toDF("grp", "amount")
    val rows = Benford.firstDigitAudit(df, "grp", "amount").collect()
      .map(r => r.getLong(1) -> r).toMap
    assert(rows.size === 9) // all nine digits present
    assert(rows(1L).getLong(2) === 3L && rows(9L).getLong(2) === 1L)
    assert(rows(2L).getLong(2) === 0L) // zero-filled
    assert(rows.values.forall(_.getLong(3) === 4L)) // total excludes <= 0
    // obs_q = ⌊2²⁰·3/4⌋ for digit 1; Benford literal is ⌊2²⁰·log10(2)⌋
    assert(rows(1L).getLong(4) === (1048576L * 3) / 4)
    assert(rows(1L).getLong(5) === 315652L)
    assert(rows(1L).getLong(6) === rows(1L).getLong(4) - 315652L)
  }

  // ------------------------------------------------- link prediction

  test("commonNeighborScores: square predicts diagonals, adjacency excluded") {
    // 4-cycle 1-2-3-4: each diagonal (1,3) and (2,4) shares BOTH its
    // neighbors; adjacent pairs share none
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("a", "b")
    val got = graft.ops.LinkPredict
      .commonNeighborScores(square, "a", "b", minCommon = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // every node has degree 2 → each common neighbor contributes ⌊2²⁰/2⌋
    assert(got === Map(
      (1L, 3L) -> ((2L, 2L * 524288L)),
      (2L, 4L) -> ((2L, 2L * 524288L))))
  }

  test("commonNeighborScores: existing edges never scored; hub capped out") {
    // triangle 1-2-3 plus hub 9 wired to all: with maxDegree 2 the hub
    // contributes no wedges, and adjacent pairs are dropped even when
    // they share neighbors — nothing survives minCommon=2
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (9L, 1L), (9L, 2L), (9L, 3L)).toDF("a", "b")
    val rows = graft.ops.LinkPredict
      .commonNeighborScores(g, "a", "b", minCommon = 1, maxDegree = 2)
      .collect()
    // hub excluded (deg 3): remaining wedges all close into existing
    // triangle edges → anti-join removes them all
    assert(rows.isEmpty)
  }

  // ----------------------------------------------------- time series

  test("autocorrelation: perfect alternation gives acf −1 at lag 1, +1 at lag 2") {
    val pts = (0L to 9L).map(t => ("s", t, if (t % 2 == 0) 10L else 2L))
      .toDF("g", "t", "v")
    val lag1 = graft.ops.TimeSeries.autocorrelation(pts, "g", "t", "v", 1)
      .collect().head
    assert(lag1.getLong(1) === 9L && math.abs(lag1.getDouble(2) + 1.0) < 1e-12)
    val lag2 = graft.ops.TimeSeries.autocorrelation(pts, "g", "t", "v", 2)
      .collect().head
    assert(lag2.getLong(1) === 8L && math.abs(lag2.getDouble(2) - 1.0) < 1e-12)
  }

  test("autocorrelation: gaps pair nothing; constant series is null") {
    val pts = Seq(("g", 0L, 1L), ("g", 5L, 2L), ("g", 10L, 3L))
      .toDF("g", "t", "v")
    // no t has a t+1 partner → series absent from output
    assert(graft.ops.TimeSeries.autocorrelation(pts, "g", "t", "v", 1).isEmpty)
    val const = Seq(("c", 0L, 7L), ("c", 1L, 7L), ("c", 2L, 7L), ("c", 3L, 7L))
      .toDF("g", "t", "v")
    val r = graft.ops.TimeSeries.autocorrelation(const, "g", "t", "v", 1)
      .collect().head
    assert(r.getLong(1) === 3L && r.isNullAt(2)) // zero variance → null
  }

  test("cusumChangepoint finds the level shift at its last low point") {
    // 5 days at 10 then 5 days at 20: |S| peaks at the boundary (t=4)
    val pts = ((0L to 4L).map(t => ("s", t, 10L)) ++
      (5L to 9L).map(t => ("s", t, 20L))).toDF("g", "t", "v")
    val r = graft.ops.TimeSeries.cusumChangepoint(pts, "g", "t", "v")
      .collect().head
    assert(r.getLong(1) === 10L)
    assert(r.getLong(2) === 4L)
    // S_4 = Σ(10·10 − 150) = 5·(−50) → |S| = 250
    assert(r.getLong(3) === 250L)
    // single-point series: no changepoint to report
    val single = Seq(("x", 0L, 5L)).toDF("g", "t", "v")
    val s = graft.ops.TimeSeries.cusumChangepoint(single, "g", "t", "v")
      .collect().head
    assert(s.getLong(1) === 1L && s.isNullAt(2) && s.isNullAt(3))
  }

  // ------------------------------------------------------ dispersion

  test("dispersion: metronomic 0, bursty >> 1, degenerate null") {
    val flat = (1L to 5L).map(t => ("f", 7L)).toDF("g", "v")
    val f = graft.ops.TimeSeries.dispersion(flat, "g", "v").collect().head
    assert(f.getLong(1) === 5L && f.getDouble(2) === 0.0)
    // one huge burst day: variance dominates the mean
    val bursty = Seq(("b", 1L), ("b", 1L), ("b", 1L), ("b", 97L))
      .toDF("g", "v")
    val b = graft.ops.TimeSeries.dispersion(bursty, "g", "v").collect().head
    // n=4, sx=100, sxx=9412: F = (4·9412 − 10000)/(3·100) = 92.16
    assert(math.abs(b.getDouble(2) - 27648.0 / 300.0) < 1e-12)
    val single = Seq(("s", 3L)).toDF("g", "v")
    assert(graft.ops.TimeSeries.dispersion(single, "g", "v")
      .collect().head.isNullAt(2))
  }

  // ------------------------------------------------------ modularity

  test("modularity: two cliques near 1/2, random-ish labels near 0") {
    // two triangles joined by one bridge edge: the canonical 2-community graph
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("a", "b")
    val good = Seq((1L, 0L), (2L, 0L), (3L, 0L),
      (4L, 1L), (5L, 1L), (6L, 1L)).toDF("node", "label")
    val g = graft.ops.Graph.modularity(edges, "a", "b", good, "node", "label")
      .collect().head
    assert(g.getLong(0) === 7L && g.getLong(1) === 2L)
    // m=7, per community: e_c=3, d_c=7 → term = 4·7·3 − 49 = 35; Q = 70/196
    assert(g.getLong(2) === 70L)
    assert(math.abs(g.getDouble(3) - 70.0 / 196.0) < 1e-12)
    // everyone in ONE community: Q = (4m·m − (2m)²)/4m² = 0 exactly
    val one = Seq(1L, 2L, 3L, 4L, 5L, 6L).map(_ -> 9L).toDF("node", "label")
    val o = graft.ops.Graph.modularity(edges, "a", "b", one, "node", "label")
      .collect().head
    assert(o.getLong(2) === 0L && o.getDouble(3) === 0.0)
  }

  // -------------------------------------------------- Theil–Sen trend

  test("theilSenSlope ignores the outlier a least-squares fit chases") {
    // clean slope 2/day, one wild burst at t=5
    val pts = Seq(("s", 0L, 10L), ("s", 1L, 12L), ("s", 2L, 14L),
      ("s", 3L, 16L), ("s", 4L, 18L), ("s", 5L, 500L), ("s", 6L, 22L))
      .toDF("g", "t", "v")
    val r = graft.ops.TimeSeries.theilSenSlope(pts, "g", "t", "v")
      .collect().head
    assert(r.getLong(1) === 21L) // C(7,2) pairs
    // median pairwise slope stays at the clean 2/day → 2·2²⁰
    assert(r.getLong(2) === 2L * 1048576L)
    // single-point series produce no pairs → absent
    val single = Seq(("x", 0L, 1L)).toDF("g", "t", "v")
    assert(graft.ops.TimeSeries.theilSenSlope(single, "g", "t", "v").isEmpty)
  }

  // ------------------------------------------------- byte-class mix

  test("byteClassMix: dominant class, exact share, mixed flag") {
    import graft.ops.Multimodal
    val df = Multimodal.ingest(Seq(
      (1L, "AAAAAAAAAA"),       // pure: one class, share 2²⁰
      (2L, "AAAAA00000"),       // even split: class of 'A' wins? '0'=0x30 bucket 3, 'A'=0x41 bucket 4 → tie 5/5 → smallest bucket wins
      (3L, "")                  // empty: excluded entirely
    ).toDF("doc_id", "text"), "doc_id", "text", "text/plain")
    val got = Multimodal.byteClassMix(df, "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got(1L) === ((4L, 10L, 10L, 1048576L, 0L)))
    // tie at 5/5 → smallest bucket (3, the digits) wins; share 2¹⁹ < 0.8 → mixed
    assert(got(2L) === ((3L, 5L, 10L, 524288L, 1L)))
    assert(!got.contains(3L))
  }

  // -------------------------------------------------- vocab coverage

  test("coverageAtK: exact tie-aware mass, beyond-vocab fallback") {
    // freqs: a×4, b×2, c×2, d×1  (N=9, vocab=4)
    val docs = Seq("a a a a", "b b c c d").toDF("text")
    val got = graft.ops.Corpus.coverageAtK(docs, "text", Seq(1, 2, 3, 9))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got(1L) === ((4L, 1L, 4L, 9L, (1048576L * 4) / 9)))
    // k=2: top type (4) + ONE of the tied freq-2 types → 6 of 9
    assert(got(2L) === ((4L, 2L, 6L, 9L, (1048576L * 6) / 9)))
    assert(got(3L) === ((4L, 3L, 8L, 9L, (1048576L * 8) / 9)))
    // k beyond the vocabulary: full corpus covered
    assert(got(9L) === ((4L, 4L, 9L, 9L, 1048576L)))
  }

  // ------------------------------------------------------- batching

  test("paddingReport: bucket edges, truncation, exact waste fractions") {
    val df = Seq(3L, 4L, 5L, 10L).toDF("n")
    val got = graft.ops.Batching.paddingReport(df, "n", Seq(4, 8))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // bucket 4: rows n=3,4 → real 7, padded 8, waste ⌊2²⁰/8⌋
    assert(got(4L) === ((2L, 7L, 8L, 1048576L / 8)))
    // bucket 8: n=5 pads, n=10 TRUNCATES to 8 → real 13, padded 16
    assert(got(8L) === ((2L, 13L, 16L, (1048576L * 3) / 16)))
  }

  test("paddingReport rejects unsorted or duplicate boundaries") {
    val df = Seq(1L).toDF("n")
    intercept[IllegalArgumentException](
      graft.ops.Batching.paddingReport(df, "n", Seq(8, 4)))
    intercept[IllegalArgumentException](
      graft.ops.Batching.paddingReport(df, "n", Seq(4, 4)))
  }

  // ------------------------------------------------------ group folds

  test("groupFolds: same group same fold, nulls grouped, report sums") {
    val df = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d"),
      (4L, "e"), (5L, "f")).toDF("uid", "x")
      .unionByName(Seq((Option.empty[Long], "g"), (Option.empty[Long], "h"))
        .toDF("uid", "x"))
    val folds = graft.ops.Sample.groupFolds(df, "uid", k = 3)
    // leakage-free: one fold per group, including the null group
    val perGroup = folds.groupBy(col("uid"))
      .agg(countDistinct(col("fold")).as("nf")).collect()
    assert(perGroup.forall(_.getLong(1) === 1L))
    val rep = graft.ops.Sample.groupFoldReport(df, "uid", k = 3).collect()
    assert(rep.map(_.getLong(2)).sum === 8L) // all rows accounted for
    assert(rep.map(_.getLong(1)).sum === 6L) // 5 uids + the null group
    assert(rep.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 3))
  }

  // -------------------------------------------------- LSH τ sweep

  test("lshOperatingCurve: one row per τ, counts monotone in τ") {
    // identical pair → a guaranteed band collision (probabilistic
    // near-dups can land zero candidates in a 3-doc corpus)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (2L, "the quick brown fox jumps over the lazy dog again today"),
      (3L, "completely different words entirely unrelated content here now")
    ).toDF("doc_id", "text")
    val rows = graft.ops.Dedup.lshOperatingCurve(docs, "doc_id", "text",
        shingleWords = 3, bands = 4, rowsPerBand = 4,
        tausPct = Seq(30, 60, 90))
      .orderBy(col("tau_pct")).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(30L, 60L, 90L))
    // same candidate universe at every τ; predicted set shrinks as τ rises
    assert(rows.map(_.getLong(1)).distinct.length === 1)
    val preds = rows.map(_.getLong(2))
    assert(preds.zip(preds.tail).forall { case (a, b) => a >= b })
    // tp never exceeds either side of the confusion matrix
    assert(rows.forall(r => r.getLong(4) <= r.getLong(2) &&
      r.getLong(4) <= r.getLong(3)))
  }

  // ------------------------------------------------------ l-diversity

  test("lDiversityReport buckets homogeneous/low/diverse exactly") {
    val rows = Seq(
      // combo A: one sensitive value × 3 rows → homogeneous
      ("A", 1L), ("A", 1L), ("A", 1L),
      // combo B: two values → low (l = 3)
      ("B", 1L), ("B", 2L),
      // combo C: three values → diverse
      ("C", 1L), ("C", 2L), ("C", 3L), ("C", 3L)
    ).toDF("qi", "sens")
    val got = graft.ops.Privacy.lDiversityReport(rows, Seq("qi"), "sens", l = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      "homogeneous" -> ((1L, 3L, 1L)),
      "low" -> ((1L, 2L, 2L)),
      "diverse" -> ((1L, 4L, 3L))))
  }

  // ------------------------------------------------------ t-closeness

  test("tClosenessReport: exact integer EMD on a hand-checked example") {
    // global: 6 rows, domain {1, 2}, cum(1) = 3, one EMD step.
    //  A = [1,1]: |2·6 − 3·2| = 6 → 6 / (2·6·1) = 0.5   → 500000 ppm
    //  B = [2,2]: |0·6 − 3·2| = 6 → 0.5                 → 500000 ppm
    //  C = [1,2]: |1·6 − 3·2| = 0 → matches the global  → 0 ppm
    val rows = Seq(
      ("A", 1L), ("A", 1L),
      ("B", 2L), ("B", 2L),
      ("C", 1L), ("C", 2L)).toDF("qi", "sens")
    val got = graft.ops.Privacy.tClosenessReport(rows, Seq("qi"), "sens")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(
      "A" -> ((2L, 500000L)),
      "B" -> ((2L, 500000L)),
      "C" -> ((2L, 0L))))
    // a single-valued domain cannot define an EMD step
    val e = intercept[IllegalArgumentException] {
      Seq(("A", 1L), ("B", 1L)).toDF("qi", "sens")
        .transform(d => graft.ops.Privacy.tClosenessReport(d, Seq("qi"), "sens"))
    }
    assert(e.getMessage.contains(">= 2 domain values"))
  }
}
