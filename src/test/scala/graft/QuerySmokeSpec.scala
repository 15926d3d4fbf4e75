package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One SparkSession for all suites (local-mode JVMs are expensive). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"
}

class QuerySmokeSpec extends AnyFunSuite {
  import TestSpark._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  for (name <- SparkEntry.queries.keys.toSeq.sorted) {
    test(s"$name runs at sf0.001") {
      val df = SparkEntry.queries(name)(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  test("q5_getmax watermark value") {
    val r = SparkEntry.queries("q5_getmax")(spark, sf).head
    assert(r.getString(0).startsWith("20"))
  }

  test("q7_upsert: src wins on key collision, key unique") {
    val df = SparkEntry.queries("q7_upsert")(spark, sf)
    val n = df.count()
    assert(df.select("o_orderkey").distinct().count() === n)
  }

  test("q8_dedup_latest: one row per user") {
    val df = SparkEntry.queries("q8_dedup_latest")(spark, sf)
    assert(df.select("user_id").distinct().count() === df.count())
  }
}
