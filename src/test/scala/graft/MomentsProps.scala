package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.LongType

import graft.functions.SketchAgg

/** Partition-independence and exactness of the moments power-sum
  * buffer: Spark splits a group's rows across partitions arbitrarily,
  * serializes partial buffers across the exchange, and merges them in
  * an arbitrary tree — the finished state must equal the exact BigInt
  * power sums for EVERY split, merge order, and value mix (long fast
  * path, the Σx⁴ flush boundary, the BigInteger big-value branch,
  * negatives).
  */
object MomentsProps extends Properties("MomentsSketch") {

  private def agg =
    SketchAgg.MomentsSketchAgg(BoundReference(0, LongType, nullable = true))

  // spans the long fast path (|x| < 40000), the flush boundary
  // (repeated near-40000 values overflow the pending Σx⁴ headroom),
  // and the BigInteger branch; capped at 3e8 so Σx⁴ stays inside the
  // state's decimal(38,0) envelope
  private val vGen: Gen[Long] = Gen.frequency(
    4 -> Gen.chooseNum(-100L, 100L),
    3 -> Gen.chooseNum(-39999L, 39999L),
    3 -> Gen.oneOf(39999L, -39999L, 40000L, -40000L,
      1000000L, -1000000L, 300000000L, -300000000L))

  private val partsGen: Gen[List[List[Long]]] =
    Gen.listOf(Gen.listOf(vGen))

  private def bufOf(xs: Seq[Long]) = {
    val a = agg
    val buf = a.createAggregationBuffer()
    xs.foreach(x => a.update(buf, InternalRow(x)))
    buf
  }

  private def sums(buf: SketchAgg.MomentsBuf): Seq[BigInt] = {
    val arr = agg.eval(buf).asInstanceOf[ArrayData]
    (0 until 5).map(i =>
      BigInt(arr.getDecimal(i, 38, 0).toJavaBigDecimal.toBigIntegerExact()))
  }

  private def ref(xs: Seq[Long]): Seq[BigInt] =
    Seq(BigInt(xs.size), xs.map(BigInt(_)).sum,
      xs.map(BigInt(_).pow(2)).sum, xs.map(BigInt(_).pow(3)).sum,
      xs.map(BigInt(_).pow(4)).sum)

  property("one-pass state equals exact BigInt power sums") =
    forAll(Gen.listOf(vGen)) { xs =>
      sums(bufOf(xs)) == ref(xs)
    }

  property("any split, serde round-trip, and merge order equals one pass") =
    forAll(partsGen, Gen.oneOf(true, false)) { (parts, leftToRight) =>
      val a = agg
      // every partial crosses the exchange: serialize → deserialize
      val rt = parts.map(p => a.deserialize(a.serialize(bufOf(p))))
      val merged =
        if (rt.isEmpty) a.createAggregationBuffer()
        else if (leftToRight) rt.reduceLeft(a.merge)
        else rt.reduceRight((x, y) => a.merge(x, y))
      sums(merged) == ref(parts.flatten)
    }
}
