package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Skew

/** Semantics of the skew-mitigation operators: salted aggregation must
  * equal the plain groupBy exactly; the as-of join must pick the
  * latest right row at-or-before each left timestamp.
  */
class SkewSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("saltedSumCount equals plain groupBy on a skewed key") {
    // one hot key with 10k rows, a few cold keys
    val rows = (1 to 10000).map(i => (1L, BigDecimal(i % 7))) ++
      (1 to 50).map(i => (2L + i % 3, BigDecimal(i)))
    val df = rows.toDF("k", "v").withColumn("v", col("v").cast("decimal(18,2)"))
    val salted = Skew.saltedSumCount(df, Seq("k"), col("v"), salt = 8)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDecimal(1).toPlainString, r.getLong(2)))
    val plain = df.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDecimal(1).toPlainString, r.getLong(2)))
    assert(salted.toSeq === plain.toSeq)
  }

  test("asOfJoin picks latest at-or-before; NULL when none") {
    def t(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (1L, 10L, t("2024-01-01 12:00:00")),  // between r1 and r2 → r1
      (2L, 10L, t("2024-01-01 10:00:00")),  // exactly at r1 → r1
      (3L, 10L, t("2024-01-01 09:59:59")),  // before any → NULL
      (4L, 20L, t("2024-01-01 12:00:00")))  // key with no right rows → NULL
      .toDF("event_id", "k", "ts")
    val right = Seq(
      (10L, t("2024-01-01 10:00:00"), 100L),
      (10L, t("2024-01-01 13:00:00"), 200L))
      .toDF("k", "rts", "o")
    val out = Skew.asOfJoin(left, right, "k", "k", "ts", "rts", Seq("o"))
      .orderBy("event_id").collect()
    def asof(i: Int): Option[Long] = {
      val r = out(i)
      if (r.isNullAt(r.fieldIndex("asof_o"))) None else Some(r.getAs[Long]("asof_o"))
    }
    assert(asof(0) === Some(100L))
    assert(asof(1) === Some(100L), "right row exactly AT left ts must be visible")
    assert(asof(2) === None)
    assert(asof(3) === None)
  }

  test("asOfJoin carries the latest right ROW, not per-column latest values") {
    def t(s: String) = Timestamp.valueOf(s)
    val left = Seq((1L, 10L, t("2024-01-01 12:00:00"))).toDF("event_id", "k", "ts")
    // latest right row has a NULL in `a`: the output must be that
    // row's (NULL, 7) — not a=5 stitched from the older row
    val right = Seq(
      (10L, t("2024-01-01 10:00:00"), Some(5L), 6L),
      (10L, t("2024-01-01 11:00:00"), None: Option[Long], 7L))
      .toDF("k", "rts", "a", "b")
    val r = Skew.asOfJoin(left, right, "k", "k", "ts", "rts", Seq("a", "b")).head
    assert(r.isNullAt(r.fieldIndex("asof_a")),
      "field from a superseded right row leaked into the carried result")
    assert(r.getAs[Long]("asof_b") === 7L)
  }

  test("RangeJoin keeps matches when hi sits within float-epsilon above a boundary") {
    import graft.ops.RangeJoin
    val points = Seq((1L, 5.0)).toDF("pid", "v")
    val intervals = Seq(("i", 4.2, 5.0000000001)).toDF("label", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, intervals, "v", "lo", "hi",
      bandWidth = 1.0).count()
    assert(got === 1L, "point inside the interval must not be dropped by band truncation")
  }

  test("RangeJoin matches naive inequality join incl. band boundaries") {
    import graft.ops.RangeJoin
    val points = Seq(0.0, 9.999, 10.0, 25.0, 49.999, 50.0, 99.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("pid", "v")
    val intervals = Seq(("a", 0.0, 10.0), ("b", 10.0, 50.0), ("c", 25.0, 99.5),
      ("empty", 200.0, 201.0)).toDF("label", "lo", "hi")
    val banded = RangeJoin.pointInInterval(points, intervals, "v", "lo", "hi", bandWidth = 10.0)
      .select("pid", "label").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val naive = points.join(intervals, col("v") >= col("lo") && col("v") < col("hi"))
      .select("pid", "label").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(banded === naive)
    assert(naive.contains(2L -> "b") && !naive.contains(2L -> "a"),
      "hi must stay exclusive at band boundaries")
  }

  test("asOfJoin single shuffle on the key (no range self-join)") {
    val left = Seq((1L, 10L, Timestamp.valueOf("2024-01-01 12:00:00")))
      .toDF("event_id", "k", "ts")
    val right = Seq((10L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L))
      .toDF("k", "rts", "o")
    val plan = Skew.asOfJoin(left, right, "k", "k", "ts", "rts", Seq("o"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "asof must not plan a join")
    assert(plan.contains("Window"), "asof is one window pass")
  }

  test("hybridJoin equals the plain join and routes hot keys to broadcast") {
    // key 1 is hot (60 rows), keys 2..20 cold (2 rows each); key 99
    // has no right match and must vanish like the plain inner join
    val left = ((1 to 60).map(i => (1L, s"h$i")) ++
      (2 to 20).flatMap(k => Seq((k.toLong, s"c${k}a"), (k.toLong, s"c${k}b"))) ++
      Seq((99L, "orphan"))).toDF("k", "payload")
    val right = (1 to 20).map(k => (k.toLong, s"dim$k")).toDF("rk", "attr")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("k", "payload", "attr").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val hybrid = Skew.hybridJoin(left, right, "k", "rk", hotThreshold = 50)
    val plain = left.join(right, col("k") === col("rk"))
    assert(rows(hybrid) === rows(plain))
    assert(rows(hybrid).size === 60 + 19 * 2)
    // the hot path must appear as a broadcast join in the plan
    val plan = hybrid.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "hot keys should take the broadcast path")
    // threshold above every key count degenerates to the plain join
    assert(rows(Skew.hybridJoin(left, right, "k", "rk", hotThreshold = 1000))
      === rows(plain))
    // threshold 1: every key is hot; still identical
    assert(rows(Skew.hybridJoin(left, right, "k", "rk", hotThreshold = 1))
      === rows(plain))
  }
}
