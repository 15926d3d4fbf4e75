package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextKernels
import graft.ops.{Dedup, Multimodal, Similarity}

/** Semantics tests for the [EXT] LLM-data-pipeline operators on small
  * constructed inputs (the DuckDB oracle checks the same operators at
  * sf0.01 via PipelinePack; here we pin the behavioral contracts).
  */
class PipelineSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  // ---- exact dedup --------------------------------------------------

  test("Dedup.exact collapses identical content to min id with copy count") {
    val d = docs(1L -> "a b c", 2L -> "a b c", 3L -> "x y z")
    val out = Dedup.exact(d, "doc_id", "text")
      .orderBy("keep_id").collect()
    assert(out.length === 2)
    assert(out(0).getAs[Long]("keep_id") === 1L)
    assert(out(0).getAs[Long]("n_copies") === 2L)
    assert(out(1).getAs[Long]("keep_id") === 3L)
    assert(out(1).getAs[Long]("n_copies") === 1L)
  }

  // ---- minhash LSH --------------------------------------------------

  test("minhashCandidatePairs pairs identical docs, not disjoint ones") {
    val same = "the quick brown fox jumps over the lazy dog again and again"
    val other = "completely different words nothing shared here at all ever once"
    val d = docs(1L -> same, 2L -> same, 3L -> other)
    val pairs = Dedup.minhashCandidatePairs(d, "doc_id", "text").collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
  }

  test("minhash signature is identical for identical shingle sets") {
    val d = docs(1L -> "a b c d e", 2L -> "a b c d e")
    val sigs = d.select(
      TextKernels.minhashSig(
        TextKernels.wordShingles(TextKernels.tokens(col("text")), 3), 16).as("sig"))
      .collect().map(_.getSeq[Long](0))
    assert(sigs(0) === sigs(1))
    assert(sigs(0).forall(v => v >= 0 && v < TextKernels.MinhashP))
  }

  // ---- jaccard ------------------------------------------------------

  test("jaccardPairs computes exact shingle jaccard") {
    // doc1 shingles {a b c, b c d}; doc2 shingles {a b c, b c x}
    // jaccard = 1 / 3
    val d = docs(1L -> "a b c d", 2L -> "a b c x")
    val out = Dedup.jaccardPairs(d, "doc_id", "text", threshold = 0.0).collect()
    assert(out.length === 1)
    assert(math.abs(out(0).getAs[Double]("jaccard") - 1.0 / 3.0) < 1e-12)
  }

  test("jaccardPairs threshold filters below-threshold pairs") {
    val d = docs(1L -> "a b c d", 2L -> "a b c x")
    assert(Dedup.jaccardPairs(d, "doc_id", "text", threshold = 0.5).count() === 0)
  }

  test("prefixFilterPairs agrees with jaccardPairs on real documents") {
    // completeness of the prefix filter: every J >= t pair the full
    // inverted index finds must survive prefix-only candidate
    // generation (threshold 3/10 here, uncapped full index as truth)
    val d = graft.sources.Tables.documents(spark, sf)
    val truth = Dedup.jaccardPairs(d, "doc_id", "text",
        shingleWords = 3, threshold = 0.3, maxDf = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val got = Dedup.prefixFilterPairs(d, "doc_id", "text",
        shingleWords = 3, thresholdNum = 3, thresholdDen = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet === truth.keySet)
    for ((k, j) <- truth) assert(math.abs(got(k) - j) < 1e-12, s"pair $k")
    assert(truth.nonEmpty, "fixture should contain near-dup pairs")
  }

  test("prefixFilterPairs emits exactly the at-threshold boundary pair") {
    // 5 shingles vs 5 shingles sharing 3 -> J = 3/7 >= 3/7 exactly;
    // integer cross-multiplication must include it (no float edge)
    val d = docs(1L -> "a b c d e f g", 2L -> "a b c d e x y")
    val out = Dedup.prefixFilterPairs(d, "doc_id", "text",
      shingleWords = 3, thresholdNum = 3, thresholdDen = 7).collect()
    assert(out.length === 1)
    assert(math.abs(out(0).getAs[Double]("jaccard") - 3.0 / 7.0) < 1e-12)
    assert(Dedup.prefixFilterPairs(d, "doc_id", "text",
      shingleWords = 3, thresholdNum = 44, thresholdDen = 100).count() === 0)
  }

  // ---- simhash / fingerprint ---------------------------------------

  test("simhash is equal for identical docs, differs for unrelated docs") {
    val d = docs(1L -> "a b c d e f", 2L -> "a b c d e f",
      3L -> "q r s t u v w x y z zz qq rr ss")
    val out = Dedup.simhashes(d, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.getAs[Long]("simhash"))
    assert(out(0) === out(1))
    assert(out(0) !== out(2))
    assert(out.forall(h => h >= 0 && h < (1L << 60)))
  }

  test("rollingFingerprint matches a sequential reimplementation") {
    val text = "alpha beta gamma"
    val out = Dedup.fingerprints(docs(1L -> text), "doc_id", "text")
      .head.getAs[Long]("fingerprint")
    val P = 1000000007L
    def hex60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16)
    }
    val expected = text.split(" ").foldLeft(0L)((acc, t) => (acc * 1000003L + hex60(t) % P) % P)
    assert(out === expected)
  }

  test("nearDupSurvivors: chained pairs collapse to one survivor") {
    val d = docs(1L -> "x", 2L -> "x", 3L -> "x", 4L -> "y", 9L -> "z")
    val pairs = Seq((2L, 3L), (1L, 2L)).toDF("doc_a", "doc_b") // chain 1-2-3
    val out = Dedup.nearDupSurvivors(d, pairs, "doc_id")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 9L -> 9L),
      "transitive cluster keeps min id; singletons keep themselves")
  }

  test("star contraction matches propagation on chains and random graphs") {
    // a long chain is the adversarial diameter case for propagation;
    // star contraction must converge in O(log²) rounds and still
    // yield min-id labels
    val n = 40L
    val chainDocs = docs((1L to n).map(i => i -> "x"): _*)
    val chainPairs = (1L until n).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val star = Dedup.nearDupSurvivors(chainDocs, chainPairs, "doc_id",
      algorithm = "star").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(star === (1L to n).map(_ -> 1L).toMap)
    // seeded pseudo-random graphs: both algorithms must agree exactly
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val edges = Seq.fill(40)(
        (rnd.nextInt(50).toLong + 1, rnd.nextInt(50).toLong + 1))
        .filter(e => e._1 != e._2)
      val rd = docs((1L to 50L).map(i => i -> "x"): _*)
      val pe = edges.toDF("doc_a", "doc_b")
      val a = Dedup.nearDupSurvivors(rd, pe, "doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val b = Dedup.nearDupSurvivors(rd, pe, "doc_id", algorithm = "star")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(a === b)
    }
  }

  test("PII scrub redacts emails, urls, and long digit runs in order") {
    import graft.ops.TextClean
    val d = docs(1L -> "mail a.b+c@ex-site.org see https://x.io/p?q=12345678901 acct 987654321 ok 12345678")
    val r = {
      val (ne, nu, ni) = TextClean.redactionCounts(col("text"))
      d.select(TextClean.scrub(col("text")).as("s"), ne, nu, ni).head
    }
    assert(r.getString(0) ===
      "mail <EMAIL> see <URL> acct <ID> ok 12345678",
      "8-digit run stays; email digits and url digits are not double-redacted")
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((1L, 1L, 1L)))
  }

  test("phraseHits: exact n-gram matches, overlaps counted, NULL/short docs safe") {
    import graft.ops.TextClean
    val d = Seq(
      (1L, Some("a a a b c")),       // "a a" overlaps at starts 1,2
      (2L, Some("x b c y a")),       // "b c" once; no "a a"
      (3L, Some("b")),               // shorter than every phrase
      (4L, None: Option[String]))    // NULL text
      .toDF("doc_id", "text")
    val out = TextClean.phraseHits(d, "text", Seq("a a", "b c", "a b c"))
      .select("doc_id", "hits", "phrases_hit", "flagged")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    // doc 1: "a a"×2 (overlapping), "b c"×1, "a b c"×1 → 4 hits, 3 phrases
    assert(out(1L) === ((4L, 3L, true)))
    assert(out(2L) === ((1L, 1L, true)))
    assert(out(3L) === ((0L, 0L, false)))
    assert(out(4L) === ((0L, 0L, false)))
  }

  test("phraseHitsCompiled == phraseHits bit-for-bit (Aho-Corasick parity)") {
    import graft.ops.TextClean
    val vocab = Array("a", "b", "c", "d", "e")
    val rnd = new scala.util.Random(7)
    val rows = (1L to 300L).map { i =>
      (i, Some((0 until rnd.nextInt(30)).map(_ =>
        vocab(rnd.nextInt(vocab.length))).mkString(" ")))
    } :+ ((301L, None: Option[String])) :+ ((302L, Some("")))
    val d = rows.toDF("doc_id", "text")
    // mixed lengths incl. a 1-token phrase, nested phrases ("a b" inside
    // "a b c"), and self-overlapping ones ("a a" in "a a a")
    val phrases = Seq("a a", "b c", "a b c", "e", "c d e")
    val comp = TextClean.phraseHits(d, "text", phrases)
      .select("doc_id", "hits", "phrases_hit", "flagged").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    val fast = TextClean.phraseHitsCompiled(d, "text", phrases)
      .select("doc_id", "hits", "phrases_hit", "flagged").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(fast === comp)
    assert(comp.values.map(_._1).sum > 0L, "the generated corpus must match")
    // duplicate list entries collapse in both forms
    val dup = Seq("a a", "a a", "b c")
    val c2 = TextClean.phraseHits(d, "text", dup)
      .agg(sum(col("hits")), sum(col("phrases_hit"))).head()
    val f2 = TextClean.phraseHitsCompiled(d, "text", dup)
      .agg(sum(col("hits")), sum(col("phrases_hit"))).head()
    assert(f2 === c2)
  }

  test("phraseCounts: per-phrase totals with zero-fill; n_docs vs n_hits") {
    import graft.ops.TextClean
    val d = Seq((1L, "a a a"), (2L, "a a z"), (3L, "z z z"))
      .toDF("doc_id", "text")
    val out = TextClean.phraseCounts(d, "doc_id", "text",
      Seq("a a", "q q")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("a a") === ((2L, 3L)),
      "2 docs match, 3 total occurrences (doc 1 overlaps twice)")
    assert(out("q q") === ((0L, 0L)), "never-matching phrase zero-fills")
  }

  test("phraseCounts: compiled per-phrase pass — duplicates, NULL text, mixed lengths") {
    import graft.ops.TextClean
    val d = Seq((1L, Some("a a a b c")), (2L, Some("x b c y a")),
      (3L, Some("b")), (4L, None: Option[String]))
      .toDF("doc_id", "text")
    // duplicate entries report the shared count; 1- and 3-token
    // phrases exercise the multi-length automaton; NULL/short docs
    // contribute nothing
    val out = TextClean.phraseCounts(d, "doc_id", "text",
      Seq("a a", "a a", "a b c", "b")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out.count(_ == (("a a", 1L, 2L))) === 2,
      "both duplicate rows carry doc 1's two overlapping hits")
    assert(out.contains(("a b c", 1L, 1L)))
    assert(out.contains(("b", 3L, 3L)), "docs 1-3 each contain token 'b'")
    assert(out.size === 4)
  }

  test("tokenChunks: stride windows with overlap, short tail, min one chunk") {
    import graft.ops.TextClean
    val words = (1 to 10).map(i => s"w$i").mkString(" ")
    val out = TextClean.tokenChunks(docs(1L -> words, 2L -> "solo"), "doc_id",
      "text", window = 4, stride = 3)
      .orderBy("doc_id", "chunk_idx").collect()
    val c1 = out.filter(_.getLong(0) == 1L)
    // starts 0,3,6,9 → windows of 4,4,4,1 tokens
    assert(c1.map(_.getLong(2)).toSeq === Seq(4L, 4L, 4L, 1L))
    assert(c1(0).getString(3) === "w1 w2 w3 w4")
    assert(c1(1).getString(3) === "w4 w5 w6 w7", "overlap of window-stride=1")
    assert(c1(3).getString(3) === "w10")
    val c2 = out.filter(_.getLong(0) == 2L)
    assert(c2.length === 1 && c2(0).getString(3) === "solo")
  }

  test("TfIdf ranks rare terms above common ones, k-bounded") {
    import graft.ops.TfIdf
    val d = docs(
      1L -> "common rare rare",
      2L -> "common unique",
      3L -> "common common common")
    val out = TfIdf.topTerms(d, "doc_id", "text", k = 2)
      .orderBy("doc_id", "term").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // doc 1: rare tf=2 df=1 → score 4; common tf=1 df=3 → score 1
    val d1 = out.filter(_._1 == 1L).map(t => (t._2, t._3)).toSeq
    assert(d1.toSet === Set("rare" -> 2L, "common" -> 1L))
    val top1 = TfIdf.topTerms(d, "doc_id", "text", k = 1)
      .filter(col("doc_id") === 1L).head.getString(1)
    assert(top1 === "rare")
    assert(out.count(_._1 == 3L) === 1, "doc 3 has one distinct term")
  }

  // ---- similarity search -------------------------------------------

  private def vecs(rows: (Long, Seq[Float])*): DataFrame =
    rows.toDF("vec_id", "embedding")

  test("topK ranks the query vector itself first with cosine 1") {
    val d = vecs(
      1L -> Seq(1f, 0f, 0f), 2L -> Seq(0.9f, 0.1f, 0f),
      3L -> Seq(0f, 1f, 0f), 4L -> Seq(-1f, 0f, 0f))
    val q = vecs(1L -> Seq(1f, 0f, 0f)).select(col("embedding").as("qvec"))
    val out = Similarity.topK(d, "vec_id", "embedding", q, k = 2).collect()
    assert(out(0).getAs[Long]("vec_id") === 1L)
    assert(math.abs(out(0).getAs[Double]("cos") - 1.0) < 1e-12)
    assert(out(1).getAs[Long]("vec_id") === 2L)
  }

  test("topK: zero-norm vectors get NULL cosine and never rank (no NaN)") {
    val d = vecs(1L -> Seq(0f, 0f, 0f), 2L -> Seq(1f, 0f, 0f), 3L -> Seq(0f, 1f, 0f))
    val q = vecs(9L -> Seq(1f, 0f, 0f)).select(col("embedding").as("qvec"))
    val out = Similarity.topK(d, "vec_id", "embedding", q, k = 3).collect()
    assert(out.map(_.getAs[Long]("vec_id")).toSeq === Seq(2L, 3L, 1L))
    assert(out(2).isNullAt(out(2).fieldIndex("cos")), "zero vector must be NULL, not NaN")
  }

  test("bucketNearDup only pairs within a sign bucket") {
    val d = vecs(
      1L -> Seq(1f, 1f, 1f), 2L -> Seq(2f, 3f, 4f),   // same sign bucket
      3L -> Seq(-1f, 1f, 1f))                          // different bucket
    val out = Similarity.bucketNearDup(d, "vec_id", "embedding", dims = 3).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
  }

  test("ivfTopK with full probe equals brute-force topK") {
    val d = vecs((0L to 19L).map(i =>
      i -> Seq(math.cos(i * 0.3).toFloat, math.sin(i * 0.3).toFloat, (i % 3).toFloat)): _*)
    val cents = vecs(0L -> Seq(1f, 0f, 0f), 1L -> Seq(-1f, 0f, 1f))
      .select(col("vec_id").as("cell_id"), col("embedding").as("cvec"))
    val q = vecs(99L -> Seq(1f, 0.2f, 0f)).select(col("embedding").as("qvec"))
    val brute = Similarity.topK(d, "vec_id", "embedding", q, k = 5)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val ivf = Similarity.ivfTopK(d, "vec_id", "embedding", cents, q, k = 5, nProbe = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(ivf === brute, "probing ALL cells must recover the exact top-k")
  }

  test("batchTopK matches per-query brute-force topK, ranks 1..k") {
    val d = vecs((0L to 19L).map(i =>
      i -> Seq(math.cos(i * 0.3).toFloat, math.sin(i * 0.3).toFloat, (i % 3).toFloat)): _*)
    val queries = d.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val out = Similarity.batchTopK(d, "vec_id", "embedding", queries, k = 4)
      .orderBy("query_id", "rank").collect()
    assert(out.length === 12)
    (0L to 2L).foreach { qid =>
      val q = d.filter(col("vec_id") === qid).select(col("embedding").as("qvec"))
      val brute = Similarity.topK(d, "vec_id", "embedding", q, k = 4)
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      val batch = out.filter(_.getAs[Long]("query_id") == qid)
      assert(batch.map(_.getAs[Long]("vec_id")).toSeq === brute, s"query $qid")
      assert(batch.map(_.getAs[Long]("rank")).toSeq === Seq(1L, 2L, 3L, 4L))
    }
  }

  test("batchTopK skips zero-norm rows and pre-reduces before the exchange") {
    val d = vecs(1L -> Seq(0f, 0f), 2L -> Seq(1f, 0f), 3L -> Seq(0f, 1f))
    val queries = vecs(7L -> Seq(1f, 1f))
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val res = Similarity.batchTopK(d, "vec_id", "embedding", queries, k = 5)
    val rows = res.collect()
    assert(rows.map(_.getAs[Long]("vec_id")).toSet === Set(2L, 3L),
      "null-cosine (zero-norm) rows must never occupy a heap slot")
    // the heap aggregate must run partial (map-side) so the shuffle
    // carries ≤ k rows per query per partition
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Window"), "batch kNN must not plan a window rank")
  }

  test("ivfTopK cell assignment plan has no shuffle and no window") {
    val d = vecs(1L -> Seq(1f, 0f), 2L -> Seq(0f, 1f))
    val cents = vecs(0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f))
      .select(col("vec_id").as("cell_id"), col("embedding").as("cvec"))
    val q = vecs(9L -> Seq(1f, 0f)).select(col("embedding").as("qvec"))
    val plan = Similarity.ivfTopK(d, "vec_id", "embedding", cents, q, k = 2, nProbe = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "assignment must not use a per-row window")
  }

  test("ivfBatchTopK with full probe equals batchTopK per query") {
    val d = vecs((0L to 19L).map(i =>
      i -> Seq(math.cos(i * 0.3).toFloat, math.sin(i * 0.3).toFloat, (i % 3).toFloat)): _*)
    val cents = vecs(0L -> Seq(1f, 0f, 0f), 1L -> Seq(-1f, 0f, 1f))
      .select(col("vec_id").as("cell_id"), col("embedding").as("cvec"))
    val queries = d.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val exact = Similarity.batchTopK(d, "vec_id", "embedding", queries, k = 4)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"), r.getAs[Long]("vec_id")))
    val ivf = Similarity.ivfBatchTopK(d, "vec_id", "embedding", cents, queries,
        k = 4, nProbe = 2) // nProbe = all cells
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"), r.getAs[Long]("vec_id")))
    assert(ivf.toSeq === exact.toSeq,
      "probing ALL cells must recover the exact batch top-k")
  }

  test("ivfBatchTopK: probe join broadcasts, reduction is the partial heap agg") {
    val d = vecs((0L to 19L).map(i =>
      i -> Seq(math.cos(i * 0.3).toFloat, math.sin(i * 0.3).toFloat)): _*)
    val cents = vecs(0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f))
      .select(col("vec_id").as("cell_id"), col("embedding").as("cvec"))
    val queries = d.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val plan = Similarity.ivfBatchTopK(d, "vec_id", "embedding", cents, queries,
      k = 3, nProbe = 1).queryExecution.executedPlan.toString
    // the corpus side must meet the (query, cell) probe table as a
    // broadcast hash join and pre-reduce through the bounded heap; the
    // only window ranks the broadcast-small queries × centroids product
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("ObjectHashAggregate"), plan)
  }

  test("recallAtK: exact self-recall is 1, misses count against it") {
    import spark.implicits._
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L))
      .toDF("query_id", "vec_id")
    val approx = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 99L))
      .toDF("query_id", "vec_id")
    val out = Similarity.recallAtK(exact, approx, "vec_id")
      .orderBy("query_id").collect()
    assert(out.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("n_exact"),
      r.getAs[Long]("n_hit"), r.getAs[Double]("recall"))).toSeq ===
      Seq((1L, 2L, 2L, 1.0), (2L, 2L, 1L, 0.5)))
  }

  test("clusterRepresentatives keeps the member closest to its centroid") {
    val d = vecs(
      1L -> Seq(1f, 0f, 0f), 2L -> Seq(0.9f, 0.1f, 0f),  // cell 0; 1 is exact
      3L -> Seq(0f, 1f, 0f), 4L -> Seq(0.1f, 0.9f, 0f),  // cell 1; 3 is exact
      5L -> Seq(0f, 0f, 0f))                              // zero-norm straggler
    val cents = vecs(0L -> Seq(1f, 0f, 0f), 1L -> Seq(0f, 1f, 0f))
      .select(col("vec_id").as("cell_id"), col("embedding").as("cvec"))
    val out = Similarity.clusterRepresentatives(d, "vec_id", "embedding", cents)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getAs[Long]("vec_id") === 1L)
    assert(out(1L).getAs[Long]("vec_id") === 3L)
    assert(math.abs(out(0L).getAs[Double]("cos") - 1.0) < 1e-12)
    // the zero-norm row lands in the tie-break cell (0) but can never
    // outrank a real cosine; counts include it
    assert(out(0L).getAs[Long]("n_members") === 3L)
    assert(out(1L).getAs[Long]("n_members") === 2L)
  }

  test("clusterRepresentatives: all-degenerate cell surfaces null cos") {
    val d = vecs(7L -> Seq(0f, 0f), 8L -> Seq(0f, 0f))
    val cents = vecs(0L -> Seq(1f, 0f)).select(
      col("vec_id").as("cell_id"), col("embedding").as("cvec"))
    val out = Similarity.clusterRepresentatives(d, "vec_id", "embedding", cents).head
    assert(out.getAs[Long]("vec_id") === 7L, "ties break to the smallest id")
    assert(out.isNullAt(out.fieldIndex("cos")), "degenerate cell must be NULL, not -Inf")
  }

  test("clusterRepresentatives pre-reduces before the shuffle (partial agg)") {
    val d = vecs((1L to 50L).map(i => i -> Seq(i.toFloat, 1f)): _*)
    val cents = vecs(0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f))
      .select(col("vec_id").as("cell_id"), col("embedding").as("cvec"))
    val plan = Similarity.clusterRepresentatives(d, "vec_id", "embedding", cents)
      .queryExecution.executedPlan.toString
    // hot cells are safe only because each partition reduces to <= k
    // rows map-side: the plan must show a two-phase hash aggregate
    assert(plan.contains("partial_"), s"expected map-side partial aggregation:\n$plan")
    assert(!plan.contains("Window"), "representative pick must not be a window")
  }

  // ---- text kernels -------------------------------------------------

  test("wordShingles: short docs yield one truncated shingle") {
    val out = docs(1L -> "a b").select(
      TextKernels.wordShingles(TextKernels.tokens(col("text")), 3).as("s"))
      .head.getSeq[String](0)
    assert(out === Seq("a b"))
  }

  test("stopword and multibyte ratios") {
    val d = docs(1L -> "the fox é the")
    val r = d.select(
      TextKernels.stopwordRatio(TextKernels.tokens(col("text")), Seq("the")).as("sr"),
      TextKernels.multibyteRatio(TextKernels.tokens(col("text"))).as("mr")).head
    assert(math.abs(r.getDouble(0) - 0.5) < 1e-12)
    assert(math.abs(r.getDouble(1) - 0.25) < 1e-12)
  }

  // ---- multimodal ---------------------------------------------------

  test("ingest produces binary payload + typed metadata") {
    val out = Multimodal.ingest(docs(1L -> "hello"), "doc_id", "text", "text/plain")
    assert(out.schema("payload").dataType.typeName === "binary")
    val r = out.head
    val meta = r.getStruct(r.fieldIndex("meta"))
    assert(meta.getAs[String]("media_type") === "text/plain")
    assert(meta.getAs[Long]("byte_len") === 5L)
    assert(meta.getAs[String]("sha256") ===
      "2cf24dba5fb0a30e26e83b2ac5b9e29e1b161e5c1fa7425e73043362938b9824")
  }

  test("extractFeatures: FeatureDim floats, equal to fakeFeatures of the bytes") {
    val in = Multimodal.ingest(docs(7L -> "hello world"), "doc_id", "text", "x")
    val out = Multimodal.extractFeatures(in, "doc_id").head
    assert(out.getLong(0) === 7L)
    val feats = out.getSeq[Float](1)
    assert(feats.length === Multimodal.FeatureDim)
    assert(feats === Multimodal.fakeFeatures("hello world".getBytes("UTF-8")).toSeq)
  }

  test("rrfHybrid ranks a near-copy first and excludes the query doc") {
    val d = docs(
      0L -> "alpha beta gamma delta epsilon zeta eta theta",
      1L -> "alpha beta gamma delta epsilon zeta eta iota", // near-copy
      2L -> "alpha beta unrelated words entirely different here now",
      3L -> "nothing shared with anything else at all whatsoever")
    val out = graft.ops.Retrieval.rrfHybrid(d, "doc_id", "text", queryId = 0L, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.nonEmpty && out.head._1 === 1L, s"near-copy should rank first: ${out.toSeq}")
    assert(!out.exists(_._1 == 0L), "query doc itself never appears")
    // both-signal fusion: rank 1 in both lists
    assert(out.head._2 === 2L * (1048576L / 61L))
    // scores are monotonically non-increasing in output order
    assert(out.map(_._2).toSeq === out.map(_._2).toSeq.sortBy(-_))
  }

  test("RecordLinkage: rare-value agreement outscores modal agreement") {
    // block "b": ids 1,2 agree on RARE segment X (freq 2/6); ids
    // 3,4,5 pairwise agree on modal segment M (freq 3/6); id 6 is null
    val d = Seq(
      (1L, "b", "X"), (2L, "b", "X"), (3L, "b", "M"), (4L, "b", "M"),
      (5L, "b", "M"), (6L, "b", null)
    ).toDF("id", "blk", "seg")
    val out = graft.ops.RecordLinkage.scorePairs(
        d, "id", "blk", Seq("seg"), minScore = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val w = (k: Long) => (1048576L * 6L) / k
    assert(out((1L, 2L)) === w(2)) // rare pair
    assert(out((3L, 4L)) === w(3)) // modal pairs (3,4),(3,5),(4,5)
    assert(out((1L, 2L)) > out((3L, 4L)))
    assert(out.size === 4)
    assert(!out.keySet.exists { case (a, b) => a == 6L || b == 6L },
      "null field values never agree")
  }

  test("dhash60 matches a sequential reimplementation and tracks gradients") {
    // independent reference: 61 integer-boundary cells, bit = next
    // cell's mean exceeds this one's (cross-multiplied)
    def ref(bytes: Array[Byte]): Long = {
      val cells = 61
      val sums = Array.tabulate(cells) { i =>
        val lo = i * bytes.length / cells; val hi = (i + 1) * bytes.length / cells
        ((lo until hi).map(bytes(_) & 0xff).sum.toLong, (hi - lo).toLong)
      }
      (0 until 60).foldLeft(0L) { (h, b) =>
        val (s0, w0) = sums(b); val (s1, w1) = sums(b + 1)
        if (s1 * w0 > s0 * w1) h | (1L << b) else h
      }
    }
    val texts = Seq("hello world this is a longer document with some variation",
      "a" * 200, "abc", "", ("xyz " * 61).trim)
    val in = Multimodal.ingest(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
      "doc_id", "text", "x")
    val got = Multimodal.phashes(in, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((t, i) <- texts.zipWithIndex)
      assert(got(i.toLong) === ref(t.getBytes("UTF-8")), s"doc $i")
  }

  test("phashNearDup pairs byte-edited payloads, not unrelated ones") {
    val base = ("the quick brown fox jumps over the lazy dog " * 8).trim
    val d = docs(
      1L -> base,
      2L -> base.replace("quick", "quack"), // small byte edit
      3L -> new scala.util.Random(123).alphanumeric.take(base.length).mkString)
    val in = Multimodal.ingest(d, "doc_id", "text", "x")
    val pairs = Multimodal.phashNearDup(in, "doc_id", maxHamming = 14)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("frames splits payload into fixed-size byte frames") {
    val in = Multimodal.ingest(docs(1L -> ("a" * 10)), "doc_id", "text", "x")
    val out = Multimodal.frames(in, "doc_id", frameBytes = 4)
      .orderBy("frame_idx").collect()
    assert(out.length === 3)
    assert(out.map(_.getAs[Array[Byte]]("frame").length).toSeq === Seq(4, 4, 2))
    assert(new String(out(2).getAs[Array[Byte]]("frame"), "UTF-8") === "aa")
    val plan = Multimodal.frames(in, "doc_id", 4).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "frame sampling must be map-side only")
  }

  test("resize average-pools byte windows with integer floor means") {
    // bytes 0..9 (chars \x00..\x09 would not survive text; use digits)
    val in = Multimodal.ingest(docs(1L -> "0123456789"), "doc_id", "text", "x")
    val out = Multimodal.resize(in, "doc_id", factor = 4).head
    // ords 48..57: (48+49+50+51)/4=49, (52..55)/4=53, (56+57)/2=56
    assert(out.getSeq[Long](1) === Seq(49L, 53L, 56L))
    val plan = Multimodal.resize(in, "doc_id", 4).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "resize must be map-side only")
  }

  test("extractFeatures is deterministic across runs") {
    val in = Multimodal.ingest(docs(1L -> "abc", 2L -> "xyz"), "doc_id", "text", "x")
    val a = Multimodal.extractFeatures(in, "doc_id").orderBy("doc_id").collect().toSeq
    val b = Multimodal.extractFeatures(in, "doc_id").orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  // ---- repeated-span removal ---------------------------------------

  test("dropRepeatedSpans removes cross-doc spans, keeps unique text") {
    val d = docs(
      1L -> "the same old boilerplate line unique one here",
      2L -> "prefix two the same old boilerplate line suffix two",
      3L -> "completely different content with no shared windows at all")
    val out = graft.ops.TextClean
      .dropRepeatedSpans(d, "doc_id", "text", k = 5, minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // "the same old boilerplate line" (5 tokens) is shared verbatim:
    // doc 1 loses positions 1-5, doc 2 loses positions 3-7
    assert(out(1L) === ((8L, 5L, "unique one here")))
    assert(out(2L) === ((9L, 5L, "prefix two suffix two")))
    assert(out(3L) === ((9L, 0L,
      "completely different content with no shared windows at all")))
  }

  test("repeatedSpanIntervals reports MAXIMAL spans at their true length") {
    val d = docs(
      1L -> "one two three four five six seven endone",
      2L -> "pre one two three four five six seven endtwo",
      3L -> "nothing shared in this document at all whatsoever",
      4L -> "a b one two three c d five six seven e")
    // k=3: docs 1+2 share the 7-token span "one two three four five
    // six seven" — it must come back as ONE 7-token span per doc (the
    // variable-length semantics), while doc 4 shares only the two
    // 3-token fragments, reported separately at length 3
    val out = graft.ops.TextClean
      .repeatedSpanIntervals(d, "doc_id", "text", k = 3, minDocs = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(out.contains((1L, 1L, 7L, "one two three four five six seven")))
    assert(out.contains((2L, 2L, 7L, "one two three four five six seven")))
    assert(out.contains((4L, 3L, 3L, "one two three")))
    assert(out.contains((4L, 8L, 3L, "five six seven")))
    assert(!out.exists(_._1 == 3L), "doc 3 shares nothing")
    // spans are maximal: nothing shorter overlapping the 7-token one
    assert(out.count(s => s._1 == 1L) === 1)
    assert(out.count(s => s._1 == 4L) === 2)
  }

  test("span intervals and span removal agree: interval mass == tokens removed") {
    // cross-operator invariant: repeatedSpanIntervals reports exactly
    // the positions dropRepeatedSpans deletes, so per doc
    // Σ span_len == n_removed — on real data, not a toy
    val d = graft.sources.Tables.documents(TestSpark.spark, TestSpark.sf)
      .select(col("doc_id"), col("text")).limit(200)
    val removed = graft.ops.TextClean
      .dropRepeatedSpans(d, "doc_id", "text", k = 3, minDocs = 2)
      .select(col("doc_id"), col("n_removed"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val spans = graft.ops.TextClean
      .repeatedSpanIntervals(d, "doc_id", "text", k = 3, minDocs = 2)
      .groupBy(col("doc_id")).agg(sum(col("span_len")).as("mass"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(removed.nonEmpty)
    removed.foreach { case (id, n) =>
      assert(spans.getOrElse(id, 0L) === n, s"doc $id interval mass vs removal")
    }
    assert(spans.keySet.subsetOf(removed.keySet))
  }

  test("incremental repeated spans == batch slice of the full-union run") {
    // the incremental-maintenance contract on real data: corpus index
    // + batch must reproduce exactly what a full rerun over the union
    // reports for the batch's documents
    val all = graft.sources.Tables.documents(TestSpark.spark, TestSpark.sf)
      .select(col("doc_id"), col("text"), col("source"))
    val corpus = all.filter(col("source") =!= "src3")
    val batch = all.filter(col("source") === "src3")
    val idx = graft.ops.TextClean.spanIndex(corpus, "doc_id", "text", k = 3)
    val (inc, updated) = graft.ops.TextClean.incrementalRepeatedSpans(
      batch, idx, "doc_id", "text", k = 3, minDocs = 2)
    val batchIds = batch.select(col("doc_id"))
    val full = graft.ops.TextClean.repeatedSpanIntervals(
        all, "doc_id", "text", k = 3, minDocs = 2)
      .join(batchIds, Seq("doc_id"), "left_semi")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(rows(inc).nonEmpty, "the slice must be non-trivial")
    assert(rows(inc) === rows(full))
    // index merge associativity on disjoint batches: the updated
    // index is the union's index (wh is binary — compare decoded)
    def idxRows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Array[Byte]](0).map("%02x".format(_)).mkString,
        r.getLong(1))).sorted.toSeq
    val unionIdx = graft.ops.TextClean.spanIndex(all, "doc_id", "text", k = 3)
    assert(idxRows(updated) === idxRows(unionIdx))
  }

  test("dropSpansMatching removes only reference spans — internal dups survive") {
    val train = docs(
      1L -> "leaked bench question answer pair plus original prose here",
      2L -> "dup dup dup dup dup and nothing from the benchmark",
      3L -> "prefix leaked bench question answer pair suffix")
    val ref = docs(9L -> "leaked bench question answer pair")
    val out = graft.ops.TextClean
      .dropSpansMatching(train, "doc_id", "text", ref, "doc_id", "text", k = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // docs 1 and 3 lose exactly the 5-token benchmark span; doc 2's
    // self-repetition is NOT a contamination (that's q94's job)
    assert(out(1L) === ((9L, 5L, "plus original prose here")))
    assert(out(3L) === ((7L, 5L, "prefix suffix")))
    assert(out(2L)._2 === 0L)
  }

  test("dropSpansMatching agrees with dropRepeatedSpans when ref = corpus half") {
    // splitting a corpus and decontaminating half A against half B
    // must remove from A exactly the windows dropRepeatedSpans(A ∪ B)
    // attributes to cross-half sharing when A has no internal dups
    val a = docs(1L -> "alpha beta gamma delta epsilon zeta unique tail")
    val b = docs(2L -> "pre alpha beta gamma delta epsilon zeta post")
    val viaMatch = graft.ops.TextClean
      .dropSpansMatching(a, "doc_id", "text", b, "doc_id", "text", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSeq
    val viaRepeat = graft.ops.TextClean
      .dropRepeatedSpans(a.unionByName(b), "doc_id", "text", k = 5, minDocs = 2)
      .filter(org.apache.spark.sql.functions.col("doc_id") === 1L)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSeq
    assert(viaMatch === viaRepeat)
  }

  test("dropRepeatedSpans: overlapping duplicated windows merge their coverage") {
    // the 6-token run "a b c d e f" is shared, so BOTH 5-windows
    // ("a b c d e", "b c d e f") are duplicated; coverage must be the
    // union (6 tokens), not double-counted, and the divergent tails
    // survive
    val d = docs(
      1L -> "a b c d e f p q",
      2L -> "a b c d e f r s")
    val out = graft.ops.TextClean
      .dropRepeatedSpans(d, "doc_id", "text", k = 5, minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((6L, "p q")))
    assert(out(2L) === ((6L, "r s")))
  }

  test("dropRepeatedSpans matches a brute-force reference on a random corpus") {
    // tiny vocab + seeded RNG → dense window collisions: overlaps,
    // chains, full-dup docs, and sub-k docs all occur in one corpus
    val rnd = new scala.util.Random(4242)
    val vocab = Vector("a", "b", "c", "d")
    val corpus = (1L to 60L).map(i =>
      i -> Seq.fill(rnd.nextInt(13))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val k = 3
    def reference: Map[Long, (Long, Long, String)] = {
      val toks = corpus.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
      val wins = for ((id, ts) <- corpus.map { case (id, _) => id -> toks(id) };
                      i <- 0 to ts.length - k)
        yield (id, ts.slice(i, i + k).mkString(" "))
      val dup = wins.groupBy(_._2)
        .filter(_._2.map(_._1).distinct.size >= 2).keySet
      corpus.map { case (id, _) =>
        val ts = toks(id)
        val covered = (for (i <- 0 to ts.length - k
                            if dup(ts.slice(i, i + k).mkString(" "));
                            j <- i until i + k) yield j).toSet
        val kept = ts.zipWithIndex.collect { case (t, j) if !covered(j) => t }
        id -> ((ts.length.toLong, (ts.length - kept.length).toLong,
          kept.mkString(" ")))
      }.toMap
    }
    val got = graft.ops.TextClean
      .dropRepeatedSpans(corpus.toDF("doc_id", "text"), "doc_id", "text",
        k = k, minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got === reference)
  }

  test("dropRepeatedSpans: short docs pass through; full dup returns empty") {
    val d = docs(
      1L -> "one two three four five",
      2L -> "one two three four five",
      3L -> "too short")
    val out = graft.ops.TextClean
      .dropRepeatedSpans(d, "doc_id", "text", k = 5, minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((5L, 5L, "")))
    assert(out(2L) === ((5L, 5L, "")))
    assert(out(3L) === ((2L, 0L, "too short")))
  }

  test("dropRepeatedSpans: null text keeps the size(null) contract") {
    // the one-pass rebuild must reproduce the former two-scan shape's
    // null semantics exactly: size(split(NULL)) is NULL, so a null-text
    // doc reports NULL n_tok / NULL n_removed / empty clean_text
    val d = Seq((1L, null: String),
      (2L, "one two three four five"),
      (3L, "one two three four five")).toDF("doc_id", "text")
    val out = graft.ops.TextClean
      .dropRepeatedSpans(d, "doc_id", "text", k = 5, minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((-1L, -1L, "")))
    assert(out(2L) === ((5L, 5L, "")))
    assert(out(3L) === ((5L, 5L, "")))
  }

  // ---- quality rule battery ----------------------------------------

  test("QualityRules.gopherRules: verdicts are exact integer cross-multiplications") {
    val stops = Seq("the", "a")
    val d = docs(
      // 12 tokens, all alpha, 2 stopwords, mean len in band, 10 types
      1L -> "the quick brown fox jumps over a lazy dog near old barn",
      // too short (3 tokens) and only 1 stopword
      2L -> "the quick fox",
      // repetition: 12 tokens, 2 types → ttr 1/6 < 1/4 fails; stop fails too
      3L -> "go go go go go go go go go go go go")
    val out = graft.ops.QualityRules.gopherRules(d, "doc_id", "text", stops)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("pass") === 1L)
    assert(out(2L).getAs[Long]("r_len") === 0L)
    assert(out(2L).getAs[Long]("r_stop") === 0L)
    assert(out(2L).getAs[Long]("pass") === 0L)
    assert(out(3L).getAs[Long]("r_ttr") === 0L)
    assert(out(3L).getAs[Long]("r_stop") === 0L)
    assert(out(3L).getAs[Long]("pass") === 0L)
    // mean word length: doc 3 has 12 tokens × 2 chars → 2 < 3 fails band
    assert(out(3L).getAs[Long]("r_wordlen") === 0L)
  }

  // ---- n-gram LM / BPE ---------------------------------------------

  test("NgramLm.trigramLm: counts and KN continuation counts") {
    val d = docs(
      1L -> "a b c d",   // trigrams: (a b c), (b c d)
      2L -> "x b c",     // trigram: (x b c)
      3L -> "a b c")     // trigram: (a b c)
    val out = graft.ops.NgramLm.trigramLm(d, "text")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    // (a b c) occurs twice; suffix (b c) has two distinct left contexts {a, x}
    assert(out(("a", "b", "c")) === ((2L, 2L)))
    assert(out(("x", "b", "c")) === ((1L, 2L)))
    assert(out(("b", "c", "d")) === ((1L, 1L)))
  }

  test("NgramLm.bpePairStep: corpus-frequency adjacent pairs, deterministic order") {
    val d = docs(1L -> "aab aab", 2L -> "ab x")
    // pairs: aab→(aa, ab)×2 docs? doc1 has two 'aab' tokens → aa×2, ab×2;
    // doc2 'ab' → ab×1; 'x' too short.
    val out = graft.ops.NgramLm.bpePairStep(d, "text", k = 10).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(out.toSeq === Seq("ab" -> 3L, "aa" -> 2L))
  }

  // ---- containment --------------------------------------------------

  test("Dedup.containmentPairs finds doc-inside-doc that jaccard misses") {
    // doc 2 is doc 1 plus a long divergent tail: containment(1 in 2) is
    // high while jaccard is diluted by the tail
    val core = "alpha beta gamma delta epsilon zeta"
    val d = docs(
      1L -> core,
      2L -> (core + " one two three four five six seven eight nine ten" +
        " eleven twelve thirteen fourteen fifteen sixteen"))
    val out = Dedup.containmentPairs(d, "doc_id", "text",
      shingleWords = 3, thresholdNum = 4, thresholdDen = 5).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("doc_a") === 1L && r.getAs[Long]("doc_b") === 2L)
    // every shingle of doc 1 (the smaller set) appears in doc 2
    assert(r.getAs[Long]("inter") === r.getAs[Long]("na"))
    assert(r.getAs[Double]("containment") === 1.0)
    // jaccard for the same pair is well below the containment
    val j = Dedup.jaccardPairs(d, "doc_id", "text",
      shingleWords = 3, threshold = 0.0).collect().head.getAs[Double]("jaccard")
    assert(j < 0.5)
  }

  // ---- temperature mixture quotas ----------------------------------

  test("Sample.temperatureQuota: quotas sum exactly to budget, damp head sources") {
    val d = (1 to 900).map(i => (i.toLong, "s_big")) ++
      (1 to 90).map(i => (i.toLong, "s_mid")) ++
      (1 to 10).map(i => (i.toLong, "s_small"))
    val df = d.toDF("doc_id", "source")
    val out = graft.ops.Sample.temperatureQuota(df, "source", budget = 1000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(4), r.getDouble(3)))).toMap
    assert(out.values.map(_._2).sum === 1000L)
    // α=0.5: shares ∝ √n → 30 : 9.49 : 3.16 ≈ .703 : .222 : .074 — the
    // head source's 90% of docs is damped to ~70% of the budget
    val (nBig, qBig, shBig) = out("s_big")
    assert(nBig === 900L && qBig < 760L && qBig > 700L)
    assert(math.abs(shBig - math.sqrt(900.0) /
      (math.sqrt(900.0) + math.sqrt(90.0) + math.sqrt(10.0))) < 1e-3)
    val (_, qSmall, _) = out("s_small")
    assert(qSmall > 50L) // vs 10 under proportional allocation
  }

  // ---- leakage-safe splits ------------------------------------------

  test("Sample.leakageSafeSplit: cluster-functional, deterministic, " +
      "cut-point semantics, guard-rails") {
    import graft.ops.Sample
    // 200 docs in 50 clusters of 4 — every doc of a cluster must land
    // in the SAME split (the leakage invariant)
    val docs = (0L until 200L).map(i => (i, i / 4)).toDF("doc_id", "cl")
    val out = Sample.leakageSafeSplit(docs, "cl", cuts = Seq(600, 800),
      den = 1000).collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2)))
    assert(out.length === 200)
    val byCluster = out.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
    assert(byCluster.values.forall(_.size === 1),
      "every cluster maps to exactly one split")
    // deterministic across invocations and partitionings
    val again = Sample.leakageSafeSplit(docs.repartition(7), "cl",
      cuts = Seq(600, 800), den = 1000).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.forall { case (id, _, sp) => again(id) === sp })
    // cut semantics: split ids are exactly {0, 1, 2} over 50 clusters
    // at 60/20/20 expected — all three must be populated
    val splits = out.map(_._3).toSet
    assert(splits === Set(0L, 1L, 2L))
    // the split matches the documented bucket rule exactly
    val h = out.map { case (_, cl, sp) =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s"split$cl".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val bucket = java.lang.Long.parseLong(md5.take(15), 16) % 1000
      sp === (if (bucket < 600) 0L else if (bucket < 800) 1L else 2L)
    }
    assert(h.forall(identity), "split must equal hex60(salt||cl) mod den vs cuts")
    intercept[IllegalArgumentException] {
      Sample.leakageSafeSplit(docs, "cl", cuts = Seq(800, 600))
    }
    intercept[IllegalArgumentException] {
      Sample.leakageSafeSplit(docs, "cl", cuts = Seq(1000))
    }
  }

  // ---- product quantization ----------------------------------------

  test("Similarity.pqCodes: codebook vectors encode to themselves with zero error") {
    val vecs = (0L until 8L).map { i =>
      (i, Array.tabulate(8)(d => (i * 8 + d).toFloat))
    } :+ ((8L, Array.tabulate(8)(d => (0 * 8 + d).toFloat + 0.1f)))
    val df = vecs.toDF("vec_id", "embedding")
    val out = Similarity.pqCodes(df, "vec_id", "embedding",
      subspaces = 2, codeK = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out.size === 9 * 2)
    // each seed vector's slices quantize to its own code at dist 0
    for (i <- 0L until 8L; s <- 0L until 2L)
      assert(out((i, s)) === ((i, 0.0)))
    // the near-copy of vector 0 lands on code 0 with small error
    assert(out((8L, 0L))._1 === 0L)
    assert(out((8L, 1L))._1 === 0L)
    assert(out((8L, 0L))._2 > 0.0 && out((8L, 0L))._2 < 0.1)
  }

  test("Similarity.pqAdcTopK ranks by codebook distance with id tiebreak") {
    // 8 linearly spaced seed vectors (= the codebook) + a near-copy of
    // vector 0; every vector encodes to its own code, so ADC distance
    // from query 3 orders by |i-3| with ties broken by id asc
    val vecs = (0L until 8L).map { i =>
      (i, Array.tabulate(8)(d => (i * 8 + d).toFloat))
    } :+ ((8L, Array.tabulate(8)(d => d.toFloat + 0.1f)))
    val df = vecs.toDF("vec_id", "embedding")
    val out = Similarity.pqAdcTopK(df, "vec_id", "embedding",
      queryId = 3L, subspaces = 2, codeK = 8, k = 5).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.map(_._1).toSeq === Seq(3L, 2L, 4L, 1L, 5L))
    assert(out.head._2 === 0.0)
    assert(out.map(_._2).toSeq === out.map(_._2).toSeq.sorted)
    // vec 8 shares vec 0's codes, so its ADC distance ties vec 0's and
    // the id tiebreak keeps 0 first when both enter the top-k
    val wide = Similarity.pqAdcTopK(df, "vec_id", "embedding",
      queryId = 3L, subspaces = 2, codeK = 8, k = 9).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val d0 = wide.find(_._1 == 0L).get._2
    val d8 = wide.find(_._1 == 8L).get._2
    assert(d0 === d8)
    assert(wide.map(_._1).indexOf(0L) < wide.map(_._1).indexOf(8L))
  }

  test("Similarity.knnGraph: edges stay cell-local, ranked by cosine") {
    val vecs = Seq(
      0L -> Array(1f, 0f, 0f, 0f),   // centroid/cell 0
      1L -> Array(0f, 1f, 0f, 0f),   // centroid/cell 1
      2L -> Array(0.9f, 0.1f, 0f, 0f),
      3L -> Array(0.8f, 0.2f, 0f, 0f),
      4L -> Array(0.1f, 0.9f, 0f, 0f))
    val df = vecs.toDF("vec_id", "embedding")
    val cents = df.filter(col("vec_id") < 2)
      .select(col("vec_id").as("cell_id"), col("embedding").as("cvec"))
    val out = Similarity.knnGraph(df, "vec_id", "embedding", cents, k = 2)
      .collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("vec_id")).toSeq
      }
    // cell 1 = {1, 4}: each other's only neighbor, never anyone from cell 0
    assert(out(1L) === Seq(4L) && out(4L) === Seq(1L))
    // cell 0 = {0, 2, 3}: query 0's nearest is 2 (cos .9939) then 3
    assert(out(0L) === Seq(2L, 3L))
    assert(out(2L) === Seq(0L, 3L))
    // no corpus crossJoin in the plan: the self-join is keyed on cell_id
    val plan = Similarity.knnGraph(df, "vec_id", "embedding", cents, k = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  // ---- winnowing ----------------------------------------------------

  test("Dedup.winnow: windowed minima, rightmost tie rule, shared-substring guarantee") {
    // identical docs → identical fingerprint sets (position-aligned)
    val a = "one two three four five six seven eight nine ten"
    val d = docs(1L -> a, 2L -> a, 3L -> "totally different words appear here now yes truly")
    val fps = Dedup.winnow(d, "doc_id", "text").collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(r => (r.getLong(1), r.getLong(2))).toSet }
    assert(fps(1L) === fps(2L))
    // winnowing guarantee: w+k-1 = 6 shared tokens ⇒ ≥1 shared hash —
    // here the docs are identical, so the sets intersect trivially;
    // disjoint docs share nothing
    assert(fps(1L).map(_._2).intersect(fps(3L).map(_._2)).isEmpty)
    // density: ~2/(w+1) of the 8 positions, never more than m
    assert(fps(1L).size >= 2 && fps(1L).size <= 8)
    // short doc (one shingle) still yields its single fingerprint
    val short = Dedup.winnow(docs(9L -> "a b c"), "doc_id", "text").collect()
    assert(short.length === 1 && short.head.getLong(1) === 1L)
  }

  test("Dedup.winnow matches a sequential reference implementation") {
    val text = "p q r p q r p q s t u p q r v w"
    val d = docs(7L -> text)
    val got = Dedup.winnow(d, "doc_id", "text", shingleWords = 2, window = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    // reference: hex60 per 2-gram, min per 3-window with rightmost tie
    val toks = text.split(" ")
    val hs = toks.sliding(2).map(_.mkString(" ")).map { sh =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(sh.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md5.take(8).map("%02x".format(_)).mkString.take(15), 16)
    }.toArray
    val exp = (0 to math.max(hs.length - 3, 0)).map { j =>
      val win = (j until math.min(j + 3, hs.length)).map(p => (hs(p), -p))
      val (h, negp) = win.min
      ((-negp + 1).toLong, h)
    }.toSet
    assert(got === exp)
  }

  test("Dedup.winnowOverlapPairs: identical docs overlap 1.0, disjoint docs absent") {
    val a = "one two three four five six seven eight nine ten eleven twelve"
    val d = docs(1L -> a, 2L -> a,
      3L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    val out = Dedup.winnowOverlapPairs(d, "doc_id", "text").collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("doc_a") === 1L && r.getAs[Long]("doc_b") === 2L)
    assert(r.getAs[Long]("inter") === r.getAs[Long]("na"))
    assert(r.getAs[Double]("overlap") === 1.0)
    // the winnowed index is strictly smaller than the full shingle set
    val nFull = 10L // 12 tokens → 10 shingles
    assert(r.getAs[Long]("na") < nFull)
  }

  // ---- content-defined chunking -------------------------------------

  test("TextClean.cdcChunks: chunks tile the token stream, edits re-chunk locally") {
    val words = (1 to 200).map(i => s"w${i % 37}x$i")
    val base = words.mkString(" ")
    val d = docs(1L -> base)
    val out = graft.ops.TextClean.cdcChunks(d, "doc_id", "text")
      .orderBy("chunk_idx").collect()
    // chunks tile [1, 200] exactly: starts chain and lengths sum to m
    assert(out.head.getAs[Long]("start_tok") === 1L)
    out.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("start_tok") ===
        a.getAs[Long]("start_tok") + a.getAs[Long]("n_tok"))
    }
    assert(out.map(_.getAs[Long]("n_tok")).sum === 200L)
    // content-defined: replacing ONE token preserves every chunk hash
    // outside the edited chunk's gram neighborhood (fixed-stride
    // chunking would shift nothing here, but an INSERTION shifts all
    // downstream fixed chunks while CDC re-syncs)
    val edited = (words.take(100) ++ Seq("EDIT") ++ words.drop(100)).mkString(" ")
    val out2 = graft.ops.TextClean.cdcChunks(docs(1L -> edited), "doc_id", "text")
      .collect().map(_.getAs[Long]("chunk_hash")).toSet
    val shared = out.map(_.getAs[Long]("chunk_hash")).count(out2.contains)
    assert(shared >= out.length - 3,
      s"insertion broke ${out.length - shared} of ${out.length} chunks")
  }

  test("TextClean.cdcChunks: short doc is a single whole-doc chunk") {
    val out = graft.ops.TextClean.cdcChunks(docs(1L -> "a b c"), "doc_id", "text")
      .collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("start_tok") === 1L)
    assert(out.head.getAs[Long]("n_tok") === 3L)
  }

  test("TextClean.cdcDedupSavings: duplicated doc halves distinct volume") {
    val words = (1 to 200).map(i => s"w${i % 37}x$i").mkString(" ")
    val d = Seq((1L, words, "s1"), (2L, words, "s1"))
      .toDF("doc_id", "text", "source")
    val r = graft.ops.TextClean.cdcDedupSavings(
      d, "doc_id", "text", "source").collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("total_tokens") === 400L)
    assert(row.getAs[Long]("distinct_tokens") === 200L)
    assert(row.getAs[Long]("saved_tokens") === 200L)
    assert(row.getAs[Long]("n_chunks") === 2L * row.getAs[Long]("n_distinct_chunks"))
  }

  // ---- vocabulary growth --------------------------------------------

  test("Corpus.vocabGrowth: monotone curve ending at the full vocabulary") {
    val d = docs(1L -> "a b", 2L -> "b c", 3L -> "c d e", 4L -> "a e f")
    val out = graft.ops.Corpus.vocabGrowth(d, "doc_id", "text", checkpoints = 4)
      .orderBy("checkpoint").collect()
    assert(out.length === 4)
    assert(out.map(_.getAs[Long]("n_docs")).toSeq === Seq(1L, 2L, 3L, 4L))
    val vocab = out.map(_.getAs[Long]("vocab")).toSeq
    assert(vocab === Seq(2L, 3L, 5L, 6L))
  }

  // ---- feature hashing ----------------------------------------------

  test("TfIdf.hashedBow: signed integer sums, fixed dims, repeated tokens accumulate") {
    val d = docs(1L -> "x x x y", 2L -> "x")
    val out = graft.ops.TfIdf.hashedBow(d, "doc_id", "text", dims = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // doc 2's single token pins x's (dim, sign); doc 1 must have 3× that
    val ((_, xdim), xw) = out.find(_._1._1 == 2L).get
    assert(math.abs(xw) === 1L)
    assert(out.keys.forall(_._2 >= 0L) && out.keys.forall(_._2 < 8L))
    // doc 1 = 3 × x (+ y, which may collide into x's dim with ±1)
    val d1x = out((1L, xdim))
    assert(math.abs(d1x - 3L * xw) <= 1L)
    val ySeparate = out.keys.filter(k => k._1 == 1L && k._2 != xdim)
    if (ySeparate.nonEmpty) {
      assert(d1x === 3L * xw)
      assert(math.abs(out(ySeparate.head)) === 1L)
    }
  }

  // ---- repetition signals ------------------------------------------

  test("QualityRules.repetitionSignals: top and duplicated n-gram char mass") {
    val d = docs(1L -> "a b a b a b", 2L -> "x y")
    val out = graft.ops.QualityRules.repetitionSignals(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    // doc 1, n=2: "a b"×3, "b a"×2 → top ("a b", 3), dup mass 3·3+2·3
    val r2 = out((1L, 2L))
    assert(r2.getAs[String]("top_gram") === "a b")
    assert(r2.getAs[Long]("top_occ") === 3L)
    assert(r2.getAs[Long]("top_chars") === 9L)
    assert(r2.getAs[Long]("dup_chars") === 15L)
    assert(r2.getAs[Long]("n_slots") === 5L && r2.getAs[Long]("n_distinct") === 2L)
    assert(r2.getAs[Double]("top_frac") === 9.0 / 11.0)
    // n=3: "a b a"×2 vs "b a b"×2 — count tie broken by gram asc
    val r3 = out((1L, 3L))
    assert(r3.getAs[String]("top_gram") === "a b a")
    assert(r3.getAs[Long]("dup_chars") === 20L)
    // n=6: single full-doc gram, no duplication
    val r6 = out((1L, 6L))
    assert(r6.getAs[Long]("top_occ") === 1L && r6.getAs[Long]("dup_chars") === 0L)
    // doc 2 is too short for n ≥ 3: only the n=2 row exists
    assert(out.keySet.filter(_._1 == 2L) === Set((2L, 2L)))
    assert(out((2L, 2L)).getAs[Long]("dup_chars") === 0L)
  }

  // ---- LM document scoring -----------------------------------------

  test("NgramLm.docLmScore: held-in LM, quantized probabilities, OOV accounting") {
    val d = docs(
      1L -> "a b c x",  // (a b c) seen p=1, (b c x) unseen in seen ctx
      2L -> "a b c d",  // both trigrams seen with p=1
      3L -> "z z z",    // unseen context
      4L -> "a b c")
    val out = graft.ops.NgramLm.docLmScore(d, "doc_id", "text",
      col("doc_id") % 2 === 0)
      .collect().map(r => r.getLong(0) -> r).toMap
    val q30 = 1L << 30
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_slots") === 2L && r1.getAs[Long]("n_ctx") === 2L)
    assert(r1.getAs[Long]("n_hit") === 1L && r1.getAs[Long]("n_noctx") === 0L)
    assert(r1.getAs[Long]("sum_q") === q30)
    assert(r1.getAs[Double]("mean_q") === 0.5)
    val r2 = out(2L)
    assert(r2.getAs[Long]("sum_q") === 2L * q30)
    assert(r2.getAs[Double]("mean_q") === 1.0)
    val r3 = out(3L)
    assert(r3.getAs[Long]("n_noctx") === 1L && r3.getAs[Long]("n_ctx") === 0L)
    assert(r3.isNullAt(r3.fieldIndex("sum_q")))
    assert(r3.isNullAt(r3.fieldIndex("mean_q")))
    assert(out(4L).getAs[Double]("mean_q") === 1.0)
  }

  test("sortedNeighborhoodPairs: exact sliding-window pairs, partition-invariant") {
    import graft.ops.Dedup
    // sort order by (k, id): 10->(5), 20->(1,7), 30->(2), null dropped;
    // ranks: 5=1, 1=2, 7=3, 2=4
    val df = Seq((5L, Some(10L)), (1L, Some(20L)), (7L, Some(20L)),
      (2L, Some(30L)), (9L, None)).toDF("doc_id", "k")
    def run(d: org.apache.spark.sql.DataFrame, w: Int) =
      Dedup.sortedNeighborhoodPairs(d, "doc_id", "k", w).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // window 2: only adjacent ranks pair
    assert(run(df, 2) === Set((5L, 1L, 1L), (1L, 7L, 1L), (7L, 2L, 1L)))
    // window 3: gaps 1 and 2
    assert(run(df, 3) === Set(
      (5L, 1L, 1L), (1L, 7L, 1L), (7L, 2L, 1L),
      (5L, 7L, 2L), (1L, 2L, 2L)))
    // window >= corpus: all ordered pairs
    assert(run(df, 10).size === 4 * 3 / 2)
    // rank assignment must not depend on the physical partitioning
    assert(run(df.repartition(5), 3) === run(df.coalesce(1), 3))
  }

  test("cached near-dup prework serves the raw frames, built once per key") {
    // the SessionCache convention (GraphFrameLite/LangId siblings):
    // cached ≡ raw row-for-row, repeat calls return the SAME pinned
    // frame, and the survivor cache distinguishes algorithms
    val d = docs(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over the lazy dog",
      3L -> "completely different content with nothing shared here",
      4L -> "another unrelated document full of other words")
    val rawPairs = Dedup.minhashCandidatePairs(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val c1 = Dedup.minhashCandidatePairsCached(d, "pipeline-spec", "doc_id", "text")
    val c2 = Dedup.minhashCandidatePairsCached(d, "pipeline-spec", "doc_id", "text")
    assert(c1 eq c2, "same key must return the same pinned frame")
    assert(c1.collect().map(r => (r.getLong(0), r.getLong(1))).toSet === rawPairs)
    val rawSurv = Dedup.nearDupSurvivors(d, c1, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val s1 = Dedup.nearDupSurvivorsCached(d, c1, "pipeline-spec", "doc_id")
    val s2 = Dedup.nearDupSurvivorsCached(d, c1, "pipeline-spec", "doc_id")
    assert(s1 eq s2)
    assert(s1.collect().map(r => (r.getLong(0), r.getLong(1))).toSet === rawSurv)
    // star is a distinct cache entry but the assignment is
    // algorithm-invariant (the q136 cross-check)
    val star = Dedup.nearDupSurvivorsCached(d, c1, "pipeline-spec", "doc_id",
      algorithm = "star")
    assert(!(star eq s1))
    assert(star.collect().map(r => (r.getLong(0), r.getLong(1))).toSet === rawSurv)
  }

  test("Retrieval.ndcgAt: hand-folded graded nDCG, missing labels are zero-gain") {
    import graft.ops.Retrieval
    val ranking = Seq((1L, 30L), (2L, 20L), (3L, 10L))
      .toDF("doc_id", "score_q")
    // doc 1 unlabeled (gain 0); doc 4 relevant but NOT retrieved -- it
    // still raises the ideal bar through IDCG
    val labels = Seq((2L, 2L), (3L, 1L), (4L, 3L)).toDF("doc_id", "rel")
    val d = Retrieval.ndcgDiscounts(3).map(_._2)
    val dcg = 2L * d(1) + 1L * d(2)
    val idcg = 3L * d(0) + 2L * d(1) + 1L * d(2)
    val row = Retrieval.ndcgAt(ranking, "doc_id", "score_q",
      labels, "rel", k = 3).head()
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) ===
      ((3L, dcg, idcg, dcg * 1000000L / idcg)))
    // nothing relevant anywhere: IDCG = 0 and the verdict is NULL, not
    // a crash or a fabricated 0
    val none = Retrieval.ndcgAt(ranking, "doc_id", "score_q",
      labels.limit(0), "rel", k = 3).head()
    assert(none.getLong(2) === 0L && none.isNullAt(3))
    // a ranking longer than k is cut at k before any gain counts
    val longRank = Seq((1L, 40L), (2L, 30L), (3L, 20L), (4L, 10L))
      .toDF("doc_id", "score_q")
    val cut = Retrieval.ndcgAt(longRank, "doc_id", "score_q",
      labels, "rel", k = 2).head()
    assert(cut.getLong(0) === 2L && cut.getLong(1) === 2L * d(1),
      "doc 3/4 gains must not count at k = 2")
  }

  test("Quantize.powerIteration matches a BigInt replay and finds the dominant axis") {
    import graft.ops.Quantize
    import java.math.BigInteger
    // rows (3, 1), (3, -1): A'A = [[18, 0], [0, 2]] -- dominant axis x
    val embs = Seq((1L, Seq(3.0f, 1.0f)), (2L, Seq(3.0f, -1.0f)))
      .toDF("vec_id", "embedding")
    val got = Quantize.powerIteration(embs, "vec_id", "embedding",
        dims = 2, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent replay of the exact recurrence in BigInt
    val m = BigInteger.valueOf(1048576L)
    val xq = Seq(Seq(3L, 1L), Seq(3L, -1L))
      .map(_.map(c => BigInteger.valueOf(c).multiply(m)))
    var v = Array(m, m)
    for (_ <- 1 to 3) {
      val sArr = xq.map(row =>
        row.zip(v).map { case (a, b) => a.multiply(b) }
          .reduce(_ add _))
      val w = (0 until 2).map(j =>
        xq.zip(sArr).map { case (row, sv) => row(j).multiply(sv) }
          .reduce(_ add _))
      val mx = w.map(_.abs).max
      v = w.map { wj =>
        val q = wj.abs.multiply(m).divide(mx)
        if (wj.signum < 0) q.negate else q
      }.toArray
    }
    assert(got === Map(0L -> v(0).longValueExact(),
      1L -> v(1).longValueExact()))
    // the dominant axis carries the full 2^20 magnitude; the weak axis
    // decays round over round
    assert(got(0L) === 1048576L && math.abs(got(1L)) < 20000L)
    // degenerate input (no rows) is refused loudly
    val e = intercept[Exception] {
      Quantize.powerIteration(embs.limit(0), "vec_id", "embedding",
        dims = 2, rounds = 1).collect()
    }
    assert(String.valueOf(e.getMessage).contains("degenerated"))
  }

  // ---- r15: collocations, vocab growth, split contamination ---------

  test("NgramLm.bigramLift: positional marginals and exact integer lift") {
    import graft.ops.NgramLm
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val out = NgramLm.bigramLift(docs, "text", minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // bigrams: (a,b) x3, (b,a) x1, (b,c) x1 -> N = 5
    // marginals: first-position a=3 b=2; second-position b=3 a=1 c=1
    assert(out(("a", "b")) === ((3L, 3L, 3L, 1666666L))) // 1e6*3*5/(3*3)
    assert(out(("b", "a")) === ((1L, 2L, 1L, 2500000L))) // 1e6*1*5/(2*1)
    assert(out(("b", "c")) === ((1L, 2L, 1L, 2500000L)))
    // minCount prunes, marginals stay whole-corpus
    val pruned = NgramLm.bigramLift(docs, "text", minCount = 2L).collect()
    assert(pruned.map(r => (r.getString(0), r.getString(1))).toSet
      === Set(("a", "b")))
  }

  test("NgramLm.vocabGrowth: first-occurrence buckets and running vocabulary") {
    import graft.ops.NgramLm
    val docs = Seq((0L, "a b"), (1L, "b c"), (5L, "d"))
      .toDF("doc_id", "text")
    val out = NgramLm.vocabGrowth(docs, "doc_id", "text", bucketSize = 2L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // first occurrences: a@0 b@0 c@1 d@5 -> bucket 0 holds {a,b,c},
    // bucket 2 holds {d}; the cumulative curve carries across the gap
    assert(out === Map(0L -> ((3L, 3L)), 2L -> ((1L, 4L))))
  }

  test("Sample.splitContamination: distinct test grams vs train, exact ppm") {
    import graft.ops.Sample
    val tagged = Seq(
      (0L, "w1 w2 w3 w4 w5 w6 w7 w8 x9"), // train: grams w1..w8, w2..x9
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8"),    // test: 1 gram, contaminated
      (2L, "u1 u2 u3 u4 u5 u6 u7 u8"),    // test: 1 gram, clean
      (2L, "s1 s2 s3 s4 s5 s6 s7"),       // test: too short, no gram
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8"))    // valid split: ignored
      .toDF("split", "text")
    val r = Sample.splitContamination(tagged, "text",
      trainSplit = 0L, testSplit = 2L, n = 8).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2))
      === ((2L, 1L, 500000L)))
    intercept[IllegalArgumentException] {
      Sample.splitContamination(tagged, "text", 0L, 0L)
    }
  }

  // ---- r15: packing, effective size, proportional sampling ----------

  test("ShardExport.packChunks: straddles, fills, and the final short chunk") {
    import graft.ops.ShardExport
    // token line: doc1=3, doc2=4, doc3=2 -> cuts at 4: [0,4) [4,8) [8,9)
    val docs = Seq((1L, "a b c"), (2L, "d e f g"), (3L, "h i"))
      .toDF("doc_id", "text")
    val out = ShardExport.packChunks(docs, "doc_id", "text", chunkTokens = 4L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // chunk 0: doc1 whole + doc2's first token (both START here)
    // chunk 1: doc2's tail (straddle) + doc3's first token
    // chunk 2: doc3's last token — 1-token final fill
    assert(out === Map(
      0L -> ((2L, 2L, 0L, 4L)),
      1L -> ((2L, 1L, 1L, 4L)),
      2L -> ((1L, 0L, 1L, 1L))))
    // fills cover the line exactly: sum(n_tokens) = total tokens
    assert(out.values.map(_._4).sum === 9L)
  }

  test("Dedup.effectiveSize: whole-corpus cluster weights per class") {
    // cluster 10 spans both sources with 4 members -> each doc 250000;
    // clusters 20/30 are singletons
    val tagged = Seq(
      ("s1", 10L), ("s1", 10L), ("s1", 20L),
      ("s2", 10L), ("s2", 10L), ("s2", 30L))
      .toDF("source", "keep_id")
    val out = Dedup.effectiveSize(tagged, "keep_id", "source")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out === Map(
      "s1" -> ((3L, 2L, 1500000L, 500000L)),
      "s2" -> ((3L, 2L, 1500000L, 500000L))))
  }

  test("Sample.proportionalSample: exact quotas, hash-order ranks, determinism") {
    import graft.ops.Sample
    val rows = (1L to 30L).map(i => (if (i <= 20) "big" else "small", i))
    val df = rows.toDF("source", "doc_id")
    val out = Sample.proportionalSample(df, "source", "doc_id", budget = 9L)
      .collect()
    // largest remainder of 9 over (20, 10): big 6, small 3 — sums to 9
    val bySrc = out.groupBy(_.getString(0))
    assert(bySrc("big").length === 6 && bySrc("small").length === 3)
    assert(out.forall(r => r.getLong(2) >= 1L && r.getLong(2) <= r.getLong(4)))
    // membership is the bottom of the salted hash order — engine-free
    // reference: recompute hex60 and take each stratum's smallest
    val h = df.select(col("source"), col("doc_id"),
      TextKernels.hex60(concat(lit("psample"), col("doc_id").cast("string")))
        .as("h")).collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = h.groupBy(_._1).toSeq.flatMap { case (s, rs) =>
      val q = if (s == "big") 6 else 3
      rs.sortBy(r => (r._3, r._2)).take(q).map(_._2).toSeq
    }.toSet
    assert(out.map(_.getLong(1)).toSet === expect)
    // a quota past the stratum's row count (over-budget apportionment)
    // keeps the whole stratum, never pads
    val all = Sample.proportionalSample(df, "source", "doc_id", budget = 40L)
      .collect()
    assert(all.length === 30)
    // empty input: empty result in the output schema
    assert(Sample.proportionalSample(df.filter(lit(false)), "source",
      "doc_id", budget = 5L).collect().isEmpty)
  }

  test("packChunks matches a sequential reference on seeded random corpora") {
    import graft.ops.ShardExport
    val rnd = new scala.util.Random(20260816L)
    for (case_ <- 1 to 5) {
      val l = 1 + rnd.nextInt(12)
      val docs = (1 to 1 + rnd.nextInt(25)).map { i =>
        (i.toLong, Seq.fill(1 + rnd.nextInt(20))("w").mkString(" "))
      }
      val got = ShardExport.packChunks(docs.toDF("doc_id", "text"),
        "doc_id", "text", chunkTokens = l.toLong)
        .collect().map(r => (r.getLong(0),
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      // sequential reference: walk the token line doc by doc
      var pos = 0L
      val per = scala.collection.mutable.Map
        .empty[Long, (Long, Long, Long, Long)]
      for ((_, text) <- docs) {
        val n = text.split(" ", -1).length.toLong
        val (start, end) = (pos, pos + n); pos = end
        for (c <- start / l to (end - 1) / l) {
          val (d, s, m, t) = per.getOrElse(c, (0L, 0L, 0L, 0L))
          per(c) = (d + 1, s + (if (c == start / l) 1 else 0),
            math.max(m, if (c > start / l) 1L else 0L),
            t + math.min(end, (c + 1) * l) - math.max(start, c * l))
        }
      }
      assert(got === per.toMap, s"case $case_ (chunkTokens=$l)")
    }
  }

  test("proportionalSample matches the sort-take reference on seeded strata") {
    import graft.ops.Sample
    import java.security.MessageDigest
    def hex60(s: String): Long = java.lang.Long.parseLong(
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .take(8).map("%02x".format(_)).mkString.substring(0, 15), 16)
    val rnd = new scala.util.Random(42L)
    for (case_ <- 1 to 4) {
      val rows = (1 to 10 + rnd.nextInt(60)).map { i =>
        (s"s${rnd.nextInt(4)}", i.toLong)
      }
      val budget = 1L + rnd.nextInt(30)
      val got = Sample.proportionalSample(rows.toDF("source", "doc_id"),
        "source", "doc_id", budget)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      // reference: exact largest-remainder quotas, then per-stratum
      // sort by (hash, id), take quota
      val counts = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val total = rows.size.toLong
      val base = counts.view.mapValues(n => n * budget / total).toMap
      val deficit = budget - base.values.sum
      val order = counts.keys.toSeq
        .sortBy(s => (-(counts(s) * budget % total), s))
      val quota = base ++ order.take(deficit.toInt)
        .map(s => s -> (base(s) + 1)).toMap
      val want = rows.groupBy(_._1).toSeq.flatMap { case (s, rs) =>
        rs.map(r => (s, r._2, hex60("psample" + r._2)))
          .sortBy(r => (r._3, r._2)).take(quota(s).toInt)
          .map(r => (r._1, r._2))
      }.toSet
      assert(got === want, s"case $case_ (budget=$budget)")
    }
  }
}
