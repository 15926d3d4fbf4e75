package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sketch

/** Portable-sketch invariants: HLL register state is a pure integer
  * function of the key set (duplicates free), the raw estimate lands
  * within its published error envelope in the n ≫ 2.5m regime, and
  * the count–min estimate never undershoots.
  */
class SketchSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("hllRegisters ignores duplicates and nulls") {
    val once = Sketch.hllRegisters(
      (1 to 500).map(_.toString).toDF("k"), "k", p = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dup = Sketch.hllRegisters(
      ((1 to 500) ++ (1 to 500)).map(_.toString).toDF("k"), "k", p = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(once === dup)
    val withNulls = Sketch.hllRegisters(
      ((1 to 500).map(i => Some(i.toString)) :+ None).toDF("k"), "k", p = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(once === withNulls)
    // register indexes stay inside [0, 256) and rho within [1, 53]
    assert(once.forall { case (reg, rho) =>
      reg >= 0 && reg < 256 && rho >= 1 && rho <= 53 })
  }

  test("hllReport estimates 20k distinct keys within the published envelope") {
    val est = Sketch.hllReport(
      (1 to 20000).map(i => s"key$i").toDF("k"), "k", p = 8)
      .head().getDouble(3)
    // 1.04/sqrt(256) ≈ 6.5% relative error at one sigma; allow 4x
    assert(math.abs(est - 20000.0) / 20000.0 < 0.26, s"est=$est")
  }

  test("hllReport on empty input reports all-empty registers") {
    val row = Sketch.hllReport(Seq.empty[String].toDF("k"), "k", p = 8).head()
    assert(row.getLong(0) === 256L)
    assert(row.getLong(1) === 0L)
    assert(row.getLong(2) === 256L * (1L << 40))
  }

  test("countMinAudit never underestimates and is exact without collisions") {
    // 5 heavy keys + light tail; width 1024 over ~55 keys → collisions
    // unlikely but the invariant must hold regardless
    val rows = (1 to 5).flatMap(i => Seq.fill(100 + i)(s"heavy$i")) ++
      (1 to 50).map(i => s"light$i")
    val audit = Sketch.countMinAudit(rows.toDF("k"), "k", k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(audit.length === 5)
    assert(audit.forall { case (_, exact, est, over) =>
      est >= exact && over === est - exact })
    assert(audit.map(_._1).toSet === (1 to 5).map(i => s"heavy$i").toSet)
    assert(audit.map(t => t._1 -> t._2).toMap ===
      (1 to 5).map(i => s"heavy$i" -> (100L + i)).toMap)
  }

  test("joinSizeEstimate never undershoots and is exact without collisions") {
    // A: key k1 ×3, k2 ×2; B: k1 ×4, k3 ×5 → exact = 3*4 = 12
    val a = (Seq.fill(3)("k1") ++ Seq.fill(2)("k2")).toDF("k")
    val b = (Seq.fill(4)("k1") ++ Seq.fill(5)("k3")).toDF("k")
    val r = Sketch.joinSizeEstimate(a, "k", b, "k").head()
    assert(r.getLong(0) === 12L)
    assert(r.getLong(1) >= 12L)
    assert(r.getLong(2) === r.getLong(1) - 12L)
    // disjoint key sets: exact 0, estimate still >= 0
    val d = Sketch.joinSizeEstimate(
      Seq("x1", "x2").toDF("k"), "k", Seq("y1").toDF("k"), "k").head()
    assert(d.getLong(0) === 0L)
    assert(d.getLong(1) >= 0L)
  }

  test("countMinMerge of slice sketches equals the sketch of the union") {
    val slice1 = (1 to 100).map(i => s"k${i % 9}").toDF("k")
    val slice2 = (1 to 70).map(i => s"k${i % 13}").toDF("k")
    val merged = Sketch.countMinMerge(Seq(
        Sketch.countMinTable(slice1, "k", depth = 4, width = 64),
        Sketch.countMinTable(slice2, "k", depth = 4, width = 64)))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = Sketch.countMinTable(slice1.unionByName(slice2), "k",
        depth = 4, width = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged === whole)
  }

  test("hllMerge of slice registers equals the registers of the union") {
    val slice1 = (1 to 400).map(i => s"k$i").toDF("k")
    val slice2 = (200 to 700).map(i => s"k$i").toDF("k")
    val merged = Sketch.hllMerge(Seq(
        Sketch.hllRegisters(slice1, "k", p = 8),
        Sketch.hllRegisters(slice2, "k", p = 8)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val whole = Sketch.hllRegisters(slice1.unionByName(slice2), "k", p = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged === whole)
  }

  test("countMinTable total mass equals depth × rows") {
    val df = (1 to 300).map(i => s"k${i % 40}").toDF("k")
    val mass = Sketch.countMinTable(df, "k", depth = 4, width = 64)
      .agg(sum("cnt")).head().getLong(0)
    assert(mass === 4L * 300)
  }
}
