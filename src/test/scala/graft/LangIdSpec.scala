package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.LangId

/** Cavnar–Trenkle rank-profile language ID: gram extraction edges,
  * profile ranking determinism, and classification on a corpus with
  * cleanly separated character distributions.
  */
class LangIdSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val corpus = Seq(
    (1L, "aa", "the cat and the hat sat on the mat"),
    (2L, "aa", "the rat and the bat ate the fat"),
    (3L, "bb", "zzz qqq zzz qqq zzz kkk zzz qqq"),
    (4L, "bb", "qqq kkk zzz kkk qqq zzz kkk qqq"))
    .toDF("doc_id", "lang", "text")

  test("charGrams slides correctly and guards short text") {
    val got = Seq(("abcd", 1)).toDF("t", "i")
      .select(LangId.charGrams($"t", 3).as("g")).head().getSeq[String](0)
    assert(got === Seq("abc", "bcd"))
    val short = Seq(("ab", 1)).toDF("t", "i")
      .select(LangId.charGrams($"t", 3).as("g")).head().getSeq[String](0)
    assert(short === Seq.empty)
    // n = 1 degenerates to the character sequence
    val ones = Seq(("xy", 1)).toDF("t", "i")
      .select(LangId.charGrams($"t", 1).as("g")).head().getSeq[String](0)
    assert(ones === Seq("x", "y"))
  }

  test("profiles rank by count desc then gram asc, capped at topK") {
    val prof = LangId.charNgramProfiles(corpus, "text", "lang", n = 3, topK = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val aa = prof.filter(_._1 == "aa").sortBy(_._3)
    assert(aa.length === 5)
    // "the" appears most in lang aa ("the " ×7 → gram "the" 7 + "he "...)
    assert(aa.head._3 === 1L)
    // ranks are dense 1..5 per lang
    assert(prof.filter(_._1 == "bb").map(_._3).sorted.toSeq ===
      Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("classify self-assigns a cleanly separated corpus perfectly") {
    val prof = LangId.charNgramProfiles(corpus, "text", "lang", n = 3, topK = 20)
    val pred = LangId.classify(corpus, "doc_id", "text", prof,
      n = 3, topK = 20, docTopM = 10)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(pred === Map("1" -> "aa", "2" -> "aa", "3" -> "bb", "4" -> "bb"))
  }

  test("confusion matrix is diagonal on the separated corpus") {
    val conf = LangId.confusion(corpus, "doc_id", "text", "lang",
      n = 3, topK = 20, docTopM = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(conf === Map(("aa", "aa") -> 2L, ("bb", "bb") -> 2L))
  }

  test("non-numeric (UUID-style) document ids survive classification") {
    val prof = LangId.charNgramProfiles(corpus, "text", "lang", n = 3, topK = 20)
    val uuidDocs = Seq(
      ("d0a1-xyz", "zz", "the cat and the hat sat on the mat"),
      ("9f3b-abc", "zz", "zzz qqq zzz qqq zzz kkk zzz qqq"))
      .toDF("doc_id", "lang", "text")
    val pred = LangId.classify(uuidDocs, "doc_id", "text", prof,
      n = 3, topK = 20, docTopM = 10)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(pred === Map("d0a1-xyz" -> "aa", "9f3b-abc" -> "bb"))
  }

  test("a doc with no grams predicts the first language at distance 0") {
    val prof = LangId.charNgramProfiles(corpus, "text", "lang", n = 3, topK = 20)
    val tiny = Seq((9L, "zz", "ab")).toDF("doc_id", "lang", "text")
    val row = LangId.classify(tiny, "doc_id", "text", prof,
      n = 3, topK = 20, docTopM = 10).head()
    assert(row.getString(1) === "aa")
    assert(row.getLong(2) === 0L)
    assert(row.getLong(3) === 0L)
  }

  test("charGramCounts kernel == charGrams explode, counted (incl. surrogates)") {
    // the profile build's pre-reduced kernel must reproduce the
    // exploded per-occurrence counts exactly, including code-point
    // (not UTF-16) gram sliding and the short-text guard
    val d = Seq((1L, "abab"), (2L, "ab"), (3L, ""), (4L, null: String),
      (5L, "a😀b😀"), (6L, "the cat sat"))
      .toDF("i", "t")
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val viaKernel = pairs(d.select(col("i"),
        explode(graft.functions.Kernels.charGramCountsOf(col("t"), 3)).as("g"))
      .select(col("i"), col("g.gram"), col("g.c")))
    val viaExplode = pairs(d.select(col("i"),
        explode(LangId.charGrams(col("t"), 3)).as("gram"))
      .groupBy(col("i"), col("gram")).agg(count(lit(1)).as("c")))
    assert(viaKernel === viaExplode)
    assert(viaKernel.exists(_._1 === 5L), "surrogate-pair text must produce grams")
  }

  test("confusionWith argmin decomposition == classify-based matrix (docTopM <= topK)") {
    // the reduced shape confusionWith runs when docTopM <= topK must
    // reproduce the classify-spine matrix row-for-row on a corpus
    // exercising every branch: clean docs, a mixed doc, a no-gram doc
    val messy = Seq(
      (1L, "aa", "the cat and the hat sat on the mat the cat"),
      (2L, "aa", "the hat and the cat and the mat sat"),
      (3L, "bb", "zzz qqq zzz qqq zzz kkk zzz qqq"),
      (4L, "bb", "qqq zzz kkk qqq zzz qqq kkk"),
      (5L, "aa", "the cat zzz qqq the hat zzz qqq"),
      (6L, "bb", "ab"),
      (7L, "aa", "uvw xyz uvw xyz uvw xyz"))
      .toDF("doc_id", "lang", "text")
    val prof = LangId.charNgramProfiles(messy, "text", "lang", n = 3, topK = 20)
    val viaClassify = {
      val pred = LangId.classify(messy, "doc_id", "text", prof,
        n = 3, topK = 20, docTopM = 10)
      messy.select(col("doc_id").cast("string").as("doc_id"), col("lang"))
        .join(pred.select(col("doc_id"), col("pred_lang")), Seq("doc_id"))
        .groupBy(col("lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n_docs"))
    }
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(rows(LangId.confusionWith(messy, "doc_id", "text", "lang", prof,
      n = 3, topK = 20, docTopM = 10)) === rows(viaClassify))
  }

  test("profilesCached serves the uncached frame row-for-row, built once") {
    // the GraphFrameLiteSpec convention: cached ≡ raw, and the second
    // call with the same key returns the SAME pinned frame (reference
    // equality — the build ran once)
    val raw = LangId.charNgramProfiles(corpus, "text", "lang", n = 3, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val c1 = LangId.profilesCached(corpus, "langid-spec", "text", "lang",
      n = 3, topK = 10)
    val c2 = LangId.profilesCached(corpus, "langid-spec", "text", "lang",
      n = 3, topK = 10)
    assert(c1 eq c2, "same key must return the same pinned frame")
    assert(c1.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet === raw)
    // a different parameterization is a different cache entry
    val c3 = LangId.profilesCached(corpus, "langid-spec", "text", "lang",
      n = 3, topK = 5)
    assert(!(c3 eq c1) && c3.count() < c1.count())
    // confusionWith over the cached profiles matches confusion()
    val viaCached = LangId.confusionWith(corpus, "doc_id", "text", "lang",
      c1, n = 3, topK = 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val direct = LangId.confusion(corpus, "doc_id", "text", "lang",
      n = 3, topK = 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(viaCached === direct)
  }
}
