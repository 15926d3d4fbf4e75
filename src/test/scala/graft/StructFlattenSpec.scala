package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.StructFlatten

/** Mirrors the reference objectFlatten golden
  * (test/lib/utils.js:60-86): nested maps → dotted paths, including
  * names with spaces.
  */
class StructFlattenSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("flattens nested structs to dotted paths (utils golden)") {
    val df = Seq((1)).toDF("seed").select(
      struct(lit(1).as("a"), lit(2).as("b")).as("stuff"),
      lit(3).as("c"),
      struct(struct(struct(lit(true).as("yay")).as("is")).as("stuff")).as("extra"),
      struct(lit("cool too").as(" spaces?")).as("what about"))
    val flat = StructFlatten.flatten(df)
    assert(flat.columns.toSet === Set(
      "stuff.a", "stuff.b", "c", "extra.stuff.is.yay", "what about. spaces?"))
    val r = flat.head()
    assert(r.getAs[Int]("stuff.a") === 1)
    assert(r.getAs[Int]("stuff.b") === 2)
    assert(r.getAs[Int]("c") === 3)
    assert(r.getAs[Boolean]("extra.stuff.is.yay") === true)
    assert(r.getAs[String]("what about. spaces?") === "cool too")
  }

  test("non-struct columns (incl. arrays) pass through unchanged") {
    val df = Seq((1L, Seq(1, 2, 3))).toDF("id", "xs")
      .select(col("id"), col("xs"), struct(col("id").as("inner")).as("s"))
    val flat = StructFlatten.flatten(df)
    assert(flat.columns.toSeq === Seq("id", "xs", "s.inner"))
    assert(flat.head().getSeq[Int](1) === Seq(1, 2, 3))
  }

  test("flatten is a pure projection (no shuffle in plan)") {
    val df = Seq((1L, "x")).toDF("id", "v")
      .select(col("id"), struct(col("v").as("a")).as("s"))
    val plan = StructFlatten.flatten(df).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}
