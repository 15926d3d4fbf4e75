package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

import graft.connections.SearchConnection

/** Search-index connection semantics, mirroring the reference's
  * Elasticsearch goldens (test/connections/elasticsearch.js:66-240):
  * insert + partial update preserving untouched fields, scan with
  * field projection (absent fields → NULL), and ISO-8601 date
  * re-typing.
  */
class SearchConnectionSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def fresh(): SearchConnection = new SearchConnection(spark, "es",
    Files.createTempDirectory("graft-search").toString)

  test("insertData creates an index; docs round-trip") {
    val es = fresh()
    es.insertData("users", Seq(
      (1L, 4L, true, 100.012, "a small amount of words"))
      .toDF("id", "counter", "happy", "money", "small_words"),
      key = "id", mergeOnDuplicates = true)
    val got = es.getAll("users").head()
    assert(got.getAs[Long]("id") === 1L)
    assert(got.getAs[Boolean]("happy") === true)
    assert(got.getAs[String]("small_words") === "a small amount of words")
  }

  test("partial update preserves untouched fields (es goldens :97-142)") {
    val es = fresh()
    es.insertData("users", Seq((1L, true, "a small amount of words"))
      .toDF("id", "happy", "small_words"), key = "id", mergeOnDuplicates = true)
    // update doc 1 with ONLY {id, happy} — small_words must survive
    es.insertData("users", Seq((1L, false)).toDF("id", "happy"),
      key = "id", mergeOnDuplicates = true)
    val got = es.getAll("users").collect()
    assert(got.length === 1)
    assert(got(0).getAs[Boolean]("happy") === false)
    assert(got(0).getAs[String]("small_words") === "a small amount of words")
  }

  test("update-or-create: unmatched docs are created") {
    val es = fresh()
    es.insertData("idx", Seq((1L, "a")).toDF("id", "v"), "id", mergeOnDuplicates = true)
    es.insertData("idx", Seq((1L, "a2"), (2L, "b")).toDF("id", "v"), "id",
      mergeOnDuplicates = true)
    val got = es.getAll("idx").orderBy("id").as[(Long, String)].collect().toSeq
    assert(got === Seq(1L -> "a2", 2L -> "b"))
  }

  test("getAll with field projection: absent fields come back NULL (:201-219)") {
    val es = fresh()
    es.insertData("people", Seq((1L, "evan@example.com", "evan"))
      .toDF("id", "email", "first_name"), "id", mergeOnDuplicates = true)
    val got = es.getAll("people", Seq("id", "email", "missing_field"))
    assert(got.columns.toSeq === Seq("id", "email", "missing_field"))
    val r = got.head()
    assert(r.getAs[String]("email") === "evan@example.com")
    assert(r.isNullAt(r.fieldIndex("missing_field")))
    assert(!got.columns.contains("first_name"))
  }

  test("ISO-8601 string columns re-type to timestamp (:109-114)") {
    val es = fresh()
    es.insertData("evts", Seq(
      (1L, "2015-11-26T01:33:05.951Z", "not-a-date"),
      (2L, "2020-01-01T00:00:00.000Z", "2020-bad"))
      .toDF("id", "when", "note"), "id", mergeOnDuplicates = true)
    val df = es.getAll("evts")
    assert(df.schema("when").dataType === TimestampType, "all-ISO column becomes timestamp")
    assert(df.schema("note").dataType.typeName === "string", "mixed column stays string")
    val when = df.filter(col("id") === 1).head().getTimestamp(df.columns.indexOf("when"))
    assert(when.toInstant.toEpochMilli === 1448501585951L)
  }

  test("timestamps survive a write-read round trip through an update") {
    val es = fresh()
    es.insertData("rt", Seq((1L, "2015-11-26T01:33:05.951Z")).toDF("id", "when"),
      "id", mergeOnDuplicates = true)
    es.insertData("rt", Seq((2L, "2016-02-29T12:00:00.000Z")).toDF("id", "when"),
      "id", mergeOnDuplicates = true)
    val df = es.getAll("rt")
    assert(df.schema("when").dataType === TimestampType)
    assert(df.count() === 2)
  }

  test("timestamp round trip holds under a non-UTC session time zone") {
    val prior = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val es = fresh()
      es.insertData("tz", Seq((1L, "2024-06-01T08:00:00.000Z")).toDF("id", "when"),
        "id", mergeOnDuplicates = true)
      // the writer must render UTC ("...Z"); a session-tz offset like
      // "-04" would fail the ISO re-typing and flip the column to string
      val df = es.getAll("tz")
      assert(df.schema("when").dataType === TimestampType,
        "column silently degraded to string after one upsert")
    } finally spark.conf.set("spark.sql.session.timeZone", prior)
  }

  test("getMax on an absent index is None (first incremental run), not an abort") {
    val es = fresh()
    assert(es.getMax("never_written", "updatedAt") === None)
  }

  test("listTables = showIndices; getMax; getAllLimit cap") {
    val dir = Files.createTempDirectory("graft-search").toString
    val es = new SearchConnection(spark, "es", dir)
    es.insertData("a_idx", Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "v"),
      "id", mergeOnDuplicates = true)
    es.insertData("b_idx", Seq((9L, "q")).toDF("id", "v"), "id", mergeOnDuplicates = true)
    assert(es.listTables === Seq("a_idx", "b_idx"))
    assert(es.getMax("a_idx", "id").map(_.toString.toLong) === Some(3L))
    val capped = new SearchConnection(spark, "es", dir, getAllLimit = Some(2L))
    assert(capped.getAll("a_idx").count() === 2)
  }

  test("query passthrough over registered indices") {
    val es = fresh()
    es.insertData("q_idx", Seq((1L, "x"), (2L, "y")).toDF("id", "v"),
      "id", mergeOnDuplicates = true)
    assert(es.query("SELECT count(*) AS n FROM q_idx").head().getLong(0) === 2L)
  }
}
