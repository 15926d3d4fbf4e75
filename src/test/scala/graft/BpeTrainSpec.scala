package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.NgramLm

/** The multi-round BPE trainer: hand-computed merge trajectories,
  * greedy left-to-right overlap resolution, tie-breaks, and early
  * exhaustion.
  */
class BpeTrainSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("three hand-computed rounds on the fast/faster corpus") {
    // words: fast ×2, faster ×1. Pair counts round 1: fa=3, as=3,
    // st=3, te=1, er=1 → tie broken lexicographically → (a,s).
    val docs = Seq("fast fast faster").toDF("text")
    val got = NgramLm.bpeTrain(docs, "text", merges = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(got(0) === ((1L, "a", "s", 3L, 11L)))  // f|as|t ×2, f|as|t|e|r
    assert(got(1) === ((2L, "as", "t", 3L, 8L))) // f|ast ×2, f|ast|e|r
    assert(got(2) === ((3L, "f", "ast", 3L, 5L))) // fast ×2, fast|e|r
  }

  test("overlapping runs merge greedily left-to-right and exhaust early") {
    // aaaa: round 1 pair (a,a) occurs 3 times but merges 1st and 3rd
    // → aa|aa; round 2 merges (aa,aa) → aaaa; round 3 has no pair
    val docs = Seq("aaaa").toDF("text")
    val got = NgramLm.bpeTrain(docs, "text", merges = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(got.length === 2)
    assert(got(0) === ((1L, "a", "a", 3L, 2L)))
    assert(got(1) === ((2L, "aa", "aa", 1L, 1L)))
  }

  test("word frequency weights the pair counts") {
    // "ab" ×3 outweighs the 2 distinct pairs of "xyz" ×1 each
    val docs = Seq("ab ab ab xyz").toDF("text")
    val got = NgramLm.bpeTrain(docs, "text", merges = 1).head()
    assert((got.getString(1), got.getString(2), got.getLong(3)) ===
      (("a", "b", 3L)))
  }

  test("bpeVocab reports the post-merge symbol masses") {
    // fast ×2, faster ×1 after 3 merges: fast, fast|e|r
    val docs = Seq("fast fast faster").toDF("text")
    val got = graft.ops.NgramLm.bpeVocab(docs, "text", merges = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("fast" -> 3L, "e" -> 1L, "r" -> 1L))
  }

  test("single-character words survive untouched") {
    val docs = Seq("a b a b ccc").toDF("text")
    val got = NgramLm.bpeTrain(docs, "text", merges = 1)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4)))
    // only ccc has pairs: (c,c) ×2 → greedy merges once → cc|c;
    // total after = a + b + a + b + 2 symbols of ccc = 6
    assert(got.toSeq === Seq(("c", "c", 2L, 6L)))
  }

  test("cached trainer serves both artifacts from one run, equal to raw") {
    // the SessionCache convention: merge table and vocabulary from
    // bpe*Cached equal their uncached forms row-for-row, and the
    // second artifact does not retrain (reference-equal symbol source
    // is unobservable from outside, so pin equality on content)
    val docs = Seq("fast fast faster").toDF("text")
    def trainRows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    def vocabRows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(trainRows(NgramLm.bpeTrainCached(docs, "bpe-spec", "text", 3)) ===
      trainRows(NgramLm.bpeTrain(docs, "text", 3)))
    assert(vocabRows(NgramLm.bpeVocabCached(docs, "bpe-spec", "text", 3)) ===
      vocabRows(NgramLm.bpeVocab(docs, "text", 3)))
    // a different merge budget is a different cache entry
    assert(trainRows(NgramLm.bpeTrainCached(docs, "bpe-spec", "text", 1)) ===
      trainRows(NgramLm.bpeTrain(docs, "text", 1)))
  }

  test("bpeFertility: per-class subword-per-word ppm from the trained segmentation") {
    // after 3 merges on fast×2/faster (one corpus-wide training):
    // "fast" → 1 subword, "faster" → fast|e|r = 3 subwords
    val docs = Seq(("s1", "fast fast"), ("s2", "fast faster"))
      .toDF("source", "text")
    val got = NgramLm.bpeFertility(docs, "bpe-fert-spec", "source", "text",
      merges = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      "s1" -> ((2L, 2L, 1000000L)),   // two 1-subword words
      "s2" -> ((2L, 4L, 2000000L))))  // fast(1) + faster(3) over 2 words
  }
}
