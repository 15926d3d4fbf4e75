package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Stats

/** KS drift and concentration: hand-computed statistics, identical-
  * distribution zero, and argmax tie-breaks.
  */
class StatsDriftSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("ksStatistic hand-computed on a shifted distribution") {
    // A: {1,1,2}, B: {2,3,3}. CDF numerators at v (n_a=3, n_b=3):
    //   v=1: |2*3 - 0*3| = 6 ; v=2: |3*3 - 1*3| = 6 ; v=3: |9-9| = 0
    // max 6 first reached at v=1 → ks = 6/9
    val df = Seq(("a", 1L), ("a", 1L), ("a", 2L),
      ("b", 2L), ("b", 3L), ("b", 3L)).toDF("cls", "v")
    val r = Stats.ksStatistic(df, "cls", "v", "a", "b").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((3L, 3L, 6L, 1L)))
    assert(math.abs(r.getDouble(4) - 6.0 / 9.0) < 1e-12)
  }

  test("ksStatistic is zero for identical distributions") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L)).toDF("cls", "v")
    val r = Stats.ksStatistic(df, "cls", "v", "a", "b").head()
    assert(r.getLong(2) === 0L)
    assert(r.getDouble(4) === 0.0)
  }

  test("ksStatistic ignores other classes and null values") {
    val df = Seq(("a", Some(1L)), ("b", Some(2L)), ("zz", Some(99L)),
      ("a", None)).toDF("cls", "v")
    val r = Stats.ksStatistic(df, "cls", "v", "a", "b").head()
    assert((r.getLong(0), r.getLong(1)) === ((1L, 1L)))
    assert(r.getLong(2) === 1L) // |1*1 - 0*1| at v=1
  }

  test("concentration hand-computed with a lex tie-break on top class") {
    // counts: x=3, y=3, z=2 → N=8, Σc²=22, HHI=22/64, top=x (tie lex)
    val df = (Seq.fill(3)("x") ++ Seq.fill(3)("y") ++ Seq.fill(2)("z"))
      .toDF("cls")
    val r = Stats.concentration(df, "cls").head()
    assert(r.getLong(0) === 3L)
    assert(r.getLong(1) === 8L)
    assert(r.getLong(2) === 22L)
    assert(r.getString(3) === "x")
    assert(r.getLong(4) === 3L)
    assert(math.abs(r.getDouble(5) - 22.0 / 64.0) < 1e-12)
    assert(math.abs(r.getDouble(6) - 64.0 / 22.0) < 1e-12)
    assert(math.abs(r.getDouble(7) - 3.0 / 8.0) < 1e-12)
  }

  test("concentration of a single dominant class approaches HHI 1") {
    val df = Seq.fill(50)("only").toDF("cls")
    val r = Stats.concentration(df, "cls").head()
    assert(r.getDouble(5) === 1.0)
    assert(r.getDouble(6) === 1.0)
  }
}
