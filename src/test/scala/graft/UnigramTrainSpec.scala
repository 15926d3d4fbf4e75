package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The unigram-LM tokenizer trainer (r15 verdict task 7): the
  * SentencePiece-family alternative to BPE — seed substring counts,
  * Viterbi hard-EM E-step, usage M-step, top-V ∪ single-char prune,
  * final E-step. Every assertion here is hand-computed.
  */
class UnigramTrainSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, "s", t) }
      .toDF("doc_id", "source", "text")

  private def dpOf(word: String, edges: Seq[(Int, Int, Long)]) = {
    val df = Seq((word, edges.map { case (s, l, _) => s.toLong * 8 + l },
        edges.map(_._3)))
      .toDF("w", "packed", "cnts")
    df.select(graft.functions.Kernels.unigramDpOf(
        col("w"), col("packed"), col("cnts")).as("p"))
      .head.getSeq[String](0).toList
  }

  test("kernel: fewest pieces wins regardless of counts") {
    // "ab": the whole-word piece (count 1) beats two high-count chars
    dpOf("ab", Seq((1, 1, 100L), (2, 1, 100L), (1, 2, 1L))) shouldBeList
      List("ab")
  }

  test("kernel: count sum breaks the piece-count tie") {
    // "abc" as 2 pieces: a|bc (5+9=14) beats ab|c (7+5=12)
    dpOf("abc", Seq((1, 1, 5L), (2, 2, 9L), (1, 2, 7L), (3, 1, 5L),
      (2, 1, 1L), (3, 1, 0L))) shouldBeList List("a", "bc")
  }

  test("kernel: exact (pieces, count) tie falls to the lexicographically " +
      "least sequence — the DuckDB list-ASC collation") {
    // a|bc and ab|c both 2 pieces, both sum 12; ["a","bc"] < ["ab","c"]
    dpOf("abc", Seq((1, 1, 5L), (2, 2, 7L), (1, 2, 7L), (3, 1, 5L)))
      .shouldBeList(List("a", "bc"))
  }

  test("kernel: uncoverable position fails loudly") {
    val e = intercept[Exception] { dpOf("xy", Seq((1, 1, 1L))) }
    def rootMsg(t: Throwable): String =
      if (t.getCause != null) rootMsg(t.getCause)
      else Option(t.getMessage).getOrElse("")
    assert(rootMsg(e).contains("unigramDp") || e.getMessage.contains("unigramDp"))
  }

  private implicit class ListOps(actual: List[String]) {
    def shouldBeList(expected: List[String]): Unit =
      assert(actual === expected, s"got $actual, expected $expected")
  }

  test("unigramTrain: hand-computed trainer run on 'ab ab cd'") {
    // words: ab (wc 2), cd (wc 1). Seed: ab=2, cd=1, chars a,b=2 c,d=1.
    // E1 segments both words as whole pieces (fewest). Usage: ab=2 cd=1.
    // Prune V=1 keeps {ab} plus all single chars at their usage (0).
    // E2: ab -> [ab]; cd -> [c, d] (cd was pruned away).
    val vocab = graft.ops.NgramLm.unigramTrain(
      docs("ab ab cd"), key = "spec1", "text", vocabSize = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vocab === Map("ab" -> 2L, "c" -> 1L, "d" -> 1L))
  }

  test("unigramLenGuard: overlong word fails loudly with the length " +
      "in the message (the dpLen oracle-precondition mirror)") {
    // 17-char word > maxLen 16 — the cross-joined guard must RAISE
    // with a pointed message, never diverge silently into a hash
    // mismatch (the exact failure mode the DuckDB uglen CTE guards)
    val g = graft.ops.NgramLm.unigramLenGuard(
      docs("ab abcdefghijklmnopq"), key = "specGuardBad", "text",
      vocabSize = 1, maxLen = 16)
    val wired = docs("ab abcdefghijklmnopq")
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(g))
      .select((col("n") + col("__glz")).as("n"))
    val e = intercept[Exception] { wired.collect() }
    def rootMsg(t: Throwable): String = {
      val m = Option(t.getMessage).getOrElse("")
      if (m.contains("precondition violated")) m
      else if (t.getCause != null) rootMsg(t.getCause) else m
    }
    val msg = rootMsg(e)
    assert(msg.contains("unigram oracle precondition violated"), msg)
    assert(msg.contains("17"), msg) // the offending length is named
  }

  test("unigramLenGuard: in-bound corpus contributes exactly zero") {
    val g = graft.ops.NgramLm.unigramLenGuard(
      docs("ab ab cd"), key = "specGuardOk", "text",
      vocabSize = 1, maxLen = 16)
    assert(g.collect().map(_.getInt(0)).toList === List(0))
  }

  test("unigramFertility: exact ppm on the same corpus") {
    // n_words = 3 (ab, ab, cd); subword tokens = 2*1 + 1*2 = 4
    val r = graft.ops.NgramLm.unigramFertility(
      docs("ab ab cd"), key = "spec2", "source", "text", vocabSize = 1)
      .collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("n_words") === 3L)
    assert(r(0).getAs[Long]("n_subword_tokens") === 4L)
    assert(r(0).getAs[Long]("fertility_ppm") === 1333333L)
  }

  test("tokenizerFertilityCompare: joins both audits with exact delta") {
    val r = graft.ops.NgramLm.tokenizerFertilityCompare(
      docs("abab abab baba cdcd"), key = "spec3", "source", "text",
      merges = 3, vocabSize = 50).collect()
    assert(r.length === 1)
    val row = r(0)
    assert(row.getAs[Long]("delta_ppm") ===
      row.getAs[Long]("bpe_fertility_ppm") - row.getAs[Long]("uni_fertility_ppm"))
    // generous vocab: unigram keeps all <=4-char pieces, so every word
    // segments as one piece -> fertility exactly 1.0
    assert(row.getAs[Long]("uni_fertility_ppm") === 1000000L)
    assert(row.getAs[Long]("n_words") === 4L)
  }

  test("unigramCoverage: exact char-fallback ppm on the hand corpus") {
    // 'ab ab cd', V=1: ab -> [ab] (no char tokens), cd -> [c, d]
    // (2 char tokens). 4 subword tokens total -> 500000 ppm fallback.
    val r = graft.ops.NgramLm.unigramCoverage(
      docs("ab ab cd"), key = "spec4", "source", "text", vocabSize = 1)
      .collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("n_subword_tokens") === 4L)
    assert(r(0).getAs[Long]("n_char_tokens") === 2L)
    assert(r(0).getAs[Long]("char_fallback_ppm") === 500000L)
  }

  test("trainer invariants at sf0.001: coverage, single-char safety net, " +
      "token-count consistency") {
    val d = graft.sources.Tables.documents(spark, sf)
    val vocab = graft.ops.NgramLm.unigramTrain(
      d, key = s"docs:$sf", "text", vocabSize = 24)
    val pieces = vocab.collect().map(_.getString(0)).toSet
    assert(pieces.nonEmpty && pieces.forall(_.length <= 4))
    // fertility tokens == sum over vocab usage (both count the same
    // final segmentation, corpus-weighted)
    val fert = graft.ops.NgramLm.unigramFertility(
      d, key = s"docs:$sf", "source", "text", vocabSize = 24)
    val viaFert = fert.agg(sum(col("n_subword_tokens"))).head.getLong(0)
    val viaVocab = vocab.agg(sum(col("n_occ"))).head.getLong(0)
    assert(viaFert === viaVocab)
    // fertility >= 1 word-for-word: subword tokens >= words
    val under = fert.filter(col("n_subword_tokens") < col("n_words")).count()
    assert(under === 0L)
  }
}
