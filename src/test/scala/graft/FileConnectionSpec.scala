package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

import graft.connections.FileConnection
import graft.engine.{AuditSink, Book, BookError}

/** Closes the untested tier from the round-1 verdict: S6 SQL
  * passthrough (with referenced-only view registration), T2 row caps
  * incl. the >Int.MaxValue case, and the audit sink's JSON payloads
  * under control characters.
  */
class FileConnectionSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def freshConn(cap: Option[Long] = None): FileConnection = {
    val root = Files.createTempDirectory("graft-fc").toString
    val c = new FileConnection(spark, "fc", root, getAllLimit = cap)
    c.insertData("users", Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"),
      key = "id", mergeOnDuplicates = true)
    c.insertData("purchases", Seq((10L, 1L), (11L, 1L)).toDF("pid", "uid"),
      key = "pid", mergeOnDuplicates = true)
    c
  }

  test("F12 humanBytes: base-2 steps, trimmed decimals") {
    import graft.util.Format.humanBytes
    assert(humanBytes(0L) === "0 B")
    assert(humanBytes(500L) === "500 B")
    assert(humanBytes(1024L) === "1 KB")
    assert(humanBytes(1536L) === "1.5 KB")
    assert(humanBytes(265318L) === "259.1 KB")
    assert(humanBytes(1048576L) === "1 MB")
    assert(humanBytes(1048571L) === "1 MB") // 1023.995 KB rounds ACROSS the boundary
    assert(humanBytes(1048570L) === "1023.99 KB") // just below the rollover
    assert(humanBytes(123456789L) === "117.74 MB")
    assert(humanBytes(1099511627776L) === "1 TB")
    intercept[IllegalArgumentException](humanBytes(-1L))
  }

  test("S15 dump reports rows + humanized size for each format") {
    val c = freshConn()
    for (fmt <- Seq("parquet", "csv", "json")) {
      val out = Files.createTempDirectory("graft-dump").resolve(fmt).toString
      val s = c.dump("users", out, fmt)
      assert(s.rows === 3L, fmt)
      assert(s.bytes > 0L, fmt)
      assert(s.path === out)
      assert(s.sizeHuman.endsWith(" B") || s.sizeHuman.endsWith(" KB"), s.sizeHuman)
      assert(graft.util.Format.humanBytes(s.bytes) === s.sizeHuman)
    }
  }

  test("S6 query passthrough joins registered tables") {
    val c = freshConn()
    val got = c.query(
      """SELECT u.v, count(*) AS n FROM users u JOIN purchases p ON u.id = p.uid
         GROUP BY u.v""").collect()
    assert(got.length === 1)
    assert(got(0).getString(0) === "a")
    assert(got(0).getLong(1) === 2L)
  }

  test("query registers only referenced tables") {
    val c = freshConn()
    spark.catalog.dropTempView("users")
    spark.catalog.dropTempView("purchases")
    c.query("SELECT count(*) AS n FROM users").collect()
    assert(spark.catalog.tableExists("users"))
    assert(!spark.catalog.tableExists("purchases"),
      "unreferenced tables must not be registered (each costs a schema read)")
  }

  test("keyed writes on a csv connection fail fast instead of writing parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csvconn").toString
    val c = new graft.connections.FileConnection(TestSpark.spark, "c", dir, "csv")
    val e = intercept[IllegalArgumentException] {
      import TestSpark.spark.implicits._
      c.insertData("t", Seq((1L, "a")).toDF("id", "v"), "id", mergeOnDuplicates = true)
    }
    assert(e.getMessage.contains("parquet"))
  }

  test("T2 getAllLimit caps; beyond Int.MaxValue means unlimited") {
    val root = freshConn().query("SELECT 1").sparkSession // just reuse session
    val c2 = freshConn(cap = Some(2L))
    assert(c2.getAll("users").count() === 2)
    val c3 = freshConn(cap = Some(Long.MaxValue))
    assert(c3.getAll("users").count() === 3, "a >2^31 cap must not wrap to a tiny limit")
  }

  test("S14 staged fetch: recursive listing + fetch + read-back") {
    import graft.connections.StagedFetch
    val remote = Files.createTempDirectory("graft-remote")
    Files.createDirectories(remote.resolve("sub/deep"))
    Files.writeString(remote.resolve("a.csv"), "id,v\n1,x\n")
    Files.writeString(remote.resolve("sub/deep/b.csv"), "id,v\n2,y\n")
    val listed = StagedFetch.listFiles(spark, remote.toString)
    assert(listed.size === 2)
    assert(listed.exists(_.endsWith("sub/deep/b.csv")), "walk must recurse")

    val staging = Files.createTempDirectory("graft-staging").toString
    val local = StagedFetch.fetch(spark, listed.find(_.endsWith("b.csv")).get, staging)
    val df = spark.read.option("header", "true").csv(local)
    assert(df.count() === 1)
    assert(df.head().getString(1) === "y")
  }

  test("S5 row cursor yields every row, consumer-paced") {
    import graft.connections.StagedFetch
    val c = freshConn()
    val rows = StagedFetch.rowCursor(c.getAll("users").orderBy("id")).toSeq
    assert(rows.map(_.getLong(0)) === Seq(1L, 2L, 3L))
  }

  test("audit sink emits valid JSON for control-char payloads (F11)") {
    val sink = new AuditSink(spark)
    val book = new Book("b")
    sink.attach(book)
    book.addChapter(1, "ch").addPage("boom") {
      throw new RuntimeException("line1\nline2\ttabbed \"quoted\"")
    }
    intercept[BookError] { book.run() }
    val data = sink.toDf.filter($"state" === "book:error")
      .select("data").head().getString(0)
    // must parse as JSON -- a hand-rolled escaper that misses control
    // chars emits invalid JSON here
    val parsed = spark.read.json(Seq(data).toDS)
    assert(parsed.columns.contains("error"))
    assert(parsed.head().getAs[String]("error").contains("line2\ttabbed"))
  }
}
