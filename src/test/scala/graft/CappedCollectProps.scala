package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.CappedCollect
import graft.functions.CappedCollect.{Capped, Capped2}

/** Partition-independence of the capped aggregation buffers: Spark
  * splits a group's rows across partitions arbitrarily and merges the
  * partial buffers in an arbitrary tree, so every OBSERVABLE property
  * of the result — the exact count, the buffer bound, and (for
  * under-cap groups, the only ones callers keep) the retained
  * multiset — must be invariant to the split and the merge shape.
  */
object CappedCollectProps extends Properties("CappedCollect") {

  private val partsGen: Gen[List[List[Long]]] =
    Gen.listOf(Gen.listOf(Gen.chooseNum(-50L, 50L)))
  private val capGen: Gen[Int] = Gen.choose(0, 12)

  private def finishLong(parts: List[List[Long]], cap: Int,
      leftToRight: Boolean): Capped = {
    val agg = new CappedCollect.LongAgg(cap)
    val bufs = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
    val merged =
      if (bufs.isEmpty) agg.zero
      else if (leftToRight) bufs.reduceLeft(agg.merge)
      else bufs.reduceRight((a, b) => agg.merge(a, b))
    agg.finish(merged)
  }

  property("count is exact for any split and merge order") =
    forAll(partsGen, capGen) { (parts, cap) =>
      val n = parts.map(_.size).sum.toLong
      finishLong(parts, cap, leftToRight = true).n == n &&
        finishLong(parts, cap, leftToRight = false).n == n
    }

  property("buffer never retains more than cap+1 elements") =
    forAll(partsGen, capGen) { (parts, cap) =>
      finishLong(parts, cap, leftToRight = true).ids.size <= cap + 1 &&
        finishLong(parts, cap, leftToRight = false).ids.size <= cap + 1
    }

  property("under-cap groups keep the exact multiset, any split/order") =
    forAll(partsGen, capGen) { (parts, cap) =>
      val all = parts.flatten
      all.size > cap || {
        finishLong(parts, cap, leftToRight = true).ids.sorted == all.sorted &&
          finishLong(parts, cap, leftToRight = false).ids.sorted == all.sorted
      }
    }

  property("merge is associative on the observable result") =
    forAll(Gen.listOfN(3, Gen.listOf(Gen.chooseNum(-50L, 50L))), capGen) {
      (three, cap) =>
        val agg = new CappedCollect.LongAgg(cap)
        def bufs = three.map(p => p.foldLeft(agg.zero)(agg.reduce))
        val List(a1, b1, c1) = bufs
        val List(a2, b2, c2) = bufs
        val lhs = agg.finish(agg.merge(agg.merge(a1, b1), c1))
        val rhs = agg.finish(agg.merge(a2, agg.merge(b2, c2)))
        lhs.n == rhs.n && lhs.ids.size == rhs.ids.size &&
          (lhs.n > cap || lhs.ids.sorted == rhs.ids.sorted)
    }

  private val pairPartsGen: Gen[List[List[(Long, Int)]]] =
    Gen.listOf(Gen.listOf(Gen.zip(Gen.chooseNum(-50L, 50L), Gen.choose(0, 9))))

  private def finishPair(parts: List[List[(Long, Int)]], cap: Int,
      leftToRight: Boolean): Capped2 = {
    val agg = new CappedCollect.PairAgg(cap)
    val bufs = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
    val merged =
      if (bufs.isEmpty) agg.zero
      else if (leftToRight) bufs.reduceLeft(agg.merge)
      else bufs.reduceRight((a, b) => agg.merge(a, b))
    agg.finish(merged)
  }

  property("pair variant keeps ids and payloads aligned under any split") =
    forAll(pairPartsGen, capGen) { (parts, cap) =>
      val all = parts.flatten
      for (ltr <- Seq(true, false)) {
        val got = finishPair(parts, cap, leftToRight = ltr)
        assert(got.n == all.size.toLong)
        assert(got.ids.size == got.ns.size && got.ids.size <= cap + 1)
        val retained = got.ids.zip(got.ns)
        // retained pairs are a sub-multiset of the input pairs
        val pool = scala.collection.mutable.Map(
          all.groupBy(identity).view.mapValues(_.size).toSeq: _*)
        assert(retained.forall { p =>
          val left = pool.getOrElse(p, 0)
          pool(p) = left - 1; left > 0
        })
        if (all.size <= cap) assert(retained.sorted == all.sorted)
      }
      true
    }
}
