package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.TopKHeap
import graft.functions.TopKHeap.Scored

/** Partition-independence of the bounded top-k heap: Spark splits a
  * group across partitions arbitrarily and merges partial heaps in an
  * arbitrary tree, so the finished (score DESC, id ASC) top-k must be
  * the same as a global sort-and-take for EVERY split and merge shape
  * — including duplicate scores (tie-broken by id) and null scores
  * (skipped).
  */
object TopKHeapProps extends Properties("TopKHeap") {

  private val rowGen: Gen[(java.lang.Double, Long)] = for {
    s <- Gen.oneOf(
      Gen.chooseNum(-3, 3).map(v => java.lang.Double.valueOf(v.toDouble / 2)),
      Gen.const(null: java.lang.Double))
    id <- Gen.chooseNum(0L, 40L)
  } yield (s, id)

  private val partsGen: Gen[List[List[(java.lang.Double, Long)]]] =
    Gen.listOf(Gen.listOf(rowGen))
  private val kGen: Gen[Int] = Gen.choose(1, 8)

  private def finish(parts: List[List[(java.lang.Double, Long)]], k: Int,
      leftToRight: Boolean): Seq[Scored] = {
    val agg = new TopKHeap.TopKAgg(k)
    val bufs = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
    val merged =
      if (bufs.isEmpty) agg.zero
      else if (leftToRight) bufs.reduceLeft(agg.merge)
      else bufs.reduceRight((a, b) => agg.merge(a, b))
    agg.finish(merged)
  }

  private def expected(parts: List[List[(java.lang.Double, Long)]],
      k: Int): Seq[Scored] =
    parts.flatten.collect { case (s, id) if s != null => Scored(s, id) }
      .sortBy(s => (-s.score, s.id)).take(k)

  property("matches sort-and-take for any split, both merge orders") =
    forAll(partsGen, kGen) { (parts, k) =>
      val want = expected(parts, k)
      finish(parts, k, leftToRight = true) == want &&
        finish(parts, k, leftToRight = false) == want
    }

  property("buffer never exceeds k slots") =
    forAll(partsGen, kGen) { (parts, k) =>
      val agg = new TopKHeap.TopKAgg(k)
      val h = parts.flatten.foldLeft(agg.zero)(agg.reduce)
      h.n <= k
    }

  private val minRowGen: Gen[(Long, Long)] = for {
    key <- Gen.oneOf(Gen.chooseNum(0L, 10L), Gen.chooseNum(0L, Long.MaxValue))
    id <- Gen.chooseNum(0L, 40L)
  } yield (key, id)

  property("minK matches sort-and-take for any split, both merge orders") =
    forAll(Gen.listOf(Gen.listOf(minRowGen)), kGen) { (parts, k) =>
      val agg = new TopKHeap.MinKAgg(k)
      def finish(leftToRight: Boolean) = {
        val bufs = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
        val merged =
          if (bufs.isEmpty) agg.zero
          else if (leftToRight) bufs.reduceLeft(agg.merge)
          else bufs.reduceRight((a, b) => agg.merge(a, b))
        agg.finish(merged)
      }
      val want = parts.flatten.map { case (key, id) => TopKHeap.KeyedId(key, id) }
        .sortBy(s => (s.key, s.id)).take(k)
      finish(leftToRight = true) == want && finish(leftToRight = false) == want
    }
}
