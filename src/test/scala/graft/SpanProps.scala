package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextClean

/** Randomized-but-deterministic sweep of the variable-length span
  * machinery against a brute-force Scala reference: tiny-vocabulary
  * random corpora (maximal collision pressure) where every maximal
  * repeated span is recomputed directly from the definition — a
  * position is covered iff SOME k-window containing it appears in
  * ≥ minDocs distinct documents; spans are the maximal covered runs.
  * The distributed windows+islands pipeline must agree row-for-row,
  * span text included. A fixed seed keeps failures reproducible.
  */
class SpanProps extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val rng = new scala.util.Random(0x5ea5eedL)
  private val vocab = Array("a", "b", "c")

  private def randCorpus(): Map[Long, Array[String]] =
    (1L to (3 + rng.nextInt(5)).toLong).map { id =>
      id -> Array.fill(rng.nextInt(9))(vocab(rng.nextInt(vocab.length)))
    }.toMap

  /** Brute force straight from the definition. */
  private def bruteSpans(corpus: Map[Long, Array[String]], k: Int,
      minDocs: Int): Set[(Long, Long, Long, String)] = {
    def grams(toks: Array[String]): Seq[(Int, String)] =
      (1 to toks.length - k + 1).map(w => w -> toks.slice(w - 1, w - 1 + k).mkString(" "))
    val docCount = corpus.toSeq
      .flatMap { case (id, t) => grams(t).map(_._2).distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    corpus.toSeq.flatMap { case (id, toks) =>
      val covered = (1 to toks.length).filter { p =>
        grams(toks).exists { case (w, g) =>
          w <= p && p <= w + k - 1 && docCount(g) >= minDocs }
      }.toSet
      // maximal runs of covered positions
      val runs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      var p = 1
      while (p <= toks.length) {
        if (covered(p)) {
          val start = p
          while (p <= toks.length && covered(p)) p += 1
          runs += ((start, p - start))
        } else p += 1
      }
      runs.map { case (s, len) =>
        (id, s.toLong, len.toLong, toks.slice(s - 1, s - 1 + len).mkString(" "))
      }
    }.toSet
  }

  test("repeatedSpanIntervals matches brute force on 20 random tiny-vocab corpora") {
    for (trial <- 1 to 20) {
      val corpus = randCorpus()
      val k = 2 + rng.nextInt(2) // 2 or 3
      val df = corpus.toSeq
        .map { case (id, t) => (id, t.mkString(" ")) }.toDF("doc_id", "text")
      val got = TextClean.repeatedSpanIntervals(df, "doc_id", "text", k, minDocs = 2)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
      // the tokenizer treats an empty text as one "" token, never as no
      // tokens — mirror that quirk in the reference corpus
      val tokCorpus = corpus.view.mapValues(t =>
        if (t.isEmpty) Array("") else t).toMap
      val want = bruteSpans(tokCorpus, k, minDocs = 2)
      assert(got === want, s"trial $trial corpus=$tokCorpus k=$k")
    }
  }

  test("incremental slice matches brute force on random split corpora") {
    for (trial <- 1 to 10) {
      val corpus = randCorpus()
      val (batchIds, corpusIds) = corpus.keySet.partition(_ % 2 == 0)
      if (batchIds.nonEmpty && corpusIds.nonEmpty) {
        val all = corpus.toSeq.map { case (id, t) => (id, t.mkString(" ")) }
          .toDF("doc_id", "text")
        val idx = TextClean.spanIndex(
          all.filter(col("doc_id").isin(corpusIds.toSeq: _*)), "doc_id", "text", 2)
        val (inc, _) = TextClean.incrementalRepeatedSpans(
          all.filter(col("doc_id").isin(batchIds.toSeq: _*)), idx,
          "doc_id", "text", 2, minDocs = 2)
        val got = inc.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
        val tokCorpus = corpus.view.mapValues(t =>
          if (t.isEmpty) Array("") else t).toMap
        val want = bruteSpans(tokCorpus, 2, minDocs = 2)
          .filter(s => batchIds.contains(s._1))
        assert(got === want, s"trial $trial corpus=$tokCorpus")
      }
    }
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
