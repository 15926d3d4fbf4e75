package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{TableOps, Upsert}
import graft.sources.ParquetTable

/** Upsert/merge/incremental semantics — goldens mirroring the reference
  * integration behaviors (test/connections/mysql.js:250-458).
  */
class TableOpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmpTable(name: String): ParquetTable =
    ParquetTable(spark, Files.createTempDirectory("graft").resolve(name).toString)

  private def users(rows: (Long, String, Long)*): DataFrame =
    rows.toSeq.toDF("id", "email", "counter")

  test("insertData auto-creates table from data (mysql.js:281-287)") {
    val t = tmpTable("users")
    assert(!t.exists)
    TableOps.insertData(t, users((1, "evan@example.com", 5)))
    assert(t.exists)
    assert(t.read.count() == 1)
  }

  test("upsert-on-duplicate updates in place (mysql.js:250-264)") {
    val t = tmpTable("users")
    TableOps.insertData(t, users((1, "evan@example.com", 5), (2, "pablo@example.com", 1)))
    TableOps.insertData(t, users((1, "evan@example.com", 99)))
    val got = t.read.orderBy("id").collect()
    assert(got.length == 2)
    assert(got(0).getAs[Long]("counter") == 99)
    assert(got(1).getAs[Long]("counter") == 1)
  }

  test("mergeOnDuplicates=false appends, duplicates surface (mysql.js:266-291)") {
    val t = tmpTable("users")
    TableOps.insertData(t, users((1, "a@x.com", 1)), mergeOnDuplicates = false)
    TableOps.insertData(t, users((1, "a@x.com", 2)), mergeOnDuplicates = false)
    assert(t.read.count() == 2) // duplicate keys persist — caller's contract
  }

  test("auto-add-column on insert with unseen key (mysql.js:293-311)") {
    val t = tmpTable("users")
    TableOps.insertData(t, users((1, "a@x.com", 1)))
    val withAdmin = Seq((2L, "b@x.com", 3L, true)).toDF("id", "email", "counter", "admin")
    TableOps.insertData(t, withAdmin)
    val got = t.read
    assert(got.columns.contains("admin"))
    val row1 = got.filter($"id" === 1).head()
    assert(row1.isNullAt(row1.fieldIndex("admin"))) // old rows NULL
  }

  test("type widening long→double on insert (mysql.js:412-414)") {
    val t = tmpTable("m")
    TableOps.insertData(t, Seq((1L, 5L)).toDF("id", "v"))
    TableOps.insertData(t, Seq((2L, 2.5)).toDF("id", "v"))
    assert(t.read.schema("v").dataType == DoubleType)
    assert(t.read.filter($"id" === 1).head().getDouble(1) == 5.0)
  }

  test("upsert keeps latest by orderBy column (redshift.js:400-413)") {
    val dest = Seq((1L, "old", 1L)).toDF("id", "v", "updated_at")
    val src = Seq((1L, "mid", 2L), (1L, "new", 3L)).toDF("id", "v", "updated_at")
    val got = Upsert(dest, src, Seq("id"), orderBy = Seq("updated_at")).collect()
    assert(got.length == 1)
    assert(got(0).getAs[String]("v") == "new")
  }

  test("the FIRST batch obeys keep-latest too (table does not exist yet)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-first").resolve("t").toString
    val t = graft.sources.ParquetTable(TestSpark.spark, dir)
    // both versions of key 1 arrive in the table-creating batch; the
    // ts=3 row must win exactly as it would in a later merge
    val batch = Seq((1L, "stale", 2L), (1L, "latest", 3L), (2L, "b", 1L))
      .toDF("id", "v", "updated_at")
    TableOps.insertData(t, batch, key = "id", orderBy = Seq("updated_at"))
    val got = t.read.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "latest", 2L -> "b"))
  }

  test("upsert is idempotent (re-apply same batch)") {
    val dest = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val src = Seq((2L, "B"), (3L, "c")).toDF("id", "v")
    val once = Upsert(dest, src, Seq("id"))
    val twice = Upsert(once, src, Seq("id"))
    assert(once.orderBy("id").collect().toSeq == twice.orderBy("id").collect().toSeq)
  }

  test("mergeTables fullMerge replaces dest (mysql.js:560-570)") {
    val s = tmpTable("src"); val d = tmpTable("dst")
    TableOps.insertData(s, users((1, "a@x.com", 1)))
    TableOps.insertData(d, users((9, "z@x.com", 9)))
    TableOps.mergeTables(s, d, fullMerge = true)
    assert(d.read.collect().map(_.getLong(0)).toSeq == Seq(1))
  }

  test("incrementalExtract: watermark filter + idempotent upsert (extract.js:14-39)") {
    val d = tmpTable("dest")
    val all = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)).toDF("id", "v", "updatedAt")
    // first run: no watermark → full extract
    TableOps.incrementalExtract(all, d, "updatedAt")
    assert(d.read.count() == 3)
    // second run: boundary row re-read (>=), no duplicates
    val n = TableOps.incrementalExtract(all, d, "updatedAt")
    assert(n == 1) // only the boundary row matches >= max
    assert(d.read.count() == 3)
    // new + updated rows flow in
    val next = Seq((3L, "C2", 40L), (4L, "d", 50L)).toDF("id", "v", "updatedAt")
    TableOps.incrementalExtract(next, d, "updatedAt")
    val got = d.read.orderBy("id").collect()
    assert(got.length == 4)
    assert(got(2).getAs[String]("v") == "C2")
  }

  test("schemaClone creates empty same-schema table (mysql.js:601-605)") {
    val s = tmpTable("src"); val d = tmpTable("dst")
    TableOps.insertData(s, users((1, "a@x.com", 1)))
    TableOps.schemaClone(spark, s, d)
    assert(d.read.count() == 0)
    assert(d.read.schema == s.read.schema)
  }

  test("addColumn infers type from samples; alterColumn casts (mysql.js:471-545)") {
    val t = tmpTable("t")
    TableOps.insertData(t, users((1, "a@x.com", 1)))
    TableOps.addColumn(t, "score", Seq(1.5, 2.5))
    assert(t.read.schema("score").dataType == DoubleType)
    TableOps.alterColumn(t, "counter", StringType)
    assert(t.read.schema("counter").dataType == StringType)
  }

  test("getMax watermark (mysql.js:193-216)") {
    val t = tmpTable("t")
    assert(TableOps.getMax(t, "counter").isEmpty) // missing table → null
    TableOps.insertData(t, users((1, "a@x.com", 5), (2, "b@x.com", 3)))
    assert(TableOps.getMax(t, "counter").contains(5L))
  }

  test("overwrite publishes atomically, retains one prior snapshot") {
    val t = tmpTable("t")
    TableOps.insertData(t, users((1, "a@x.com", 1)))
    t.overwrite(users((2, "b@x.com", 2)), distKey = Some("id"), sortKey = Some("counter"))
    assert(t.read.collect().map(_.getLong(0)).toSeq == Seq(2))
    def root = new java.io.File(t.path).listFiles().map(_.getName).toSeq
    assert(root.contains("_CURRENT"), root)
    // live v-1 plus the retained v-0 snapshot for in-flight readers
    assert(root.filter(_.startsWith("v-")).sorted ===
      Seq("v-00000000", "v-00000001"), root)
    assert(t.dataDir.endsWith("v-00000001"), t.dataDir)
    // a third version evicts the oldest — retention stays bounded at 2
    t.overwrite(users((3, "c@x.com", 3)))
    assert(root.filter(_.startsWith("v-")).sorted ===
      Seq("v-00000001", "v-00000002"), root)
    assert(t.read.collect().map(_.getLong(0)).toSeq == Seq(3))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged; null != shifted null") {
    import spark.implicits._
    val before = Seq(
      (1L, Some("a"), Some("x")),  // unchanged
      (2L, Some("a"), Some("y")),  // changed in after
      (3L, Some("a"), Some("z")),  // removed
      (5L, Some("p"), None),       // (p, NULL) vs (NULL, p): must differ
      (6L, None, None),            // unchanged with all-null compares
      (7L, Some("a\u0001b"), Some("c")), // embedded separator-ish char
      (8L, Some("ab"), Some("c")))       // boundary shift vs ("a","bc")
      .toDF("id", "c1", "c2")
    val after = Seq(
      (1L, Some("a"), Some("x")),
      (2L, Some("a"), Some("Y")),
      (4L, Some("n"), Some("w")),  // added
      (5L, None, Some("p")),
      (6L, None, None),
      (7L, Some("a"), Some("b\u0001c")),
      (8L, Some("a"), Some("bc")))
      .toDF("id", "c1", "c2")
    val got = graft.ops.TableOps.snapshotDiff(before, after,
      Seq("id"), Seq("c1", "c2"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "added", 5L -> "changed", 6L -> "unchanged",
      7L -> "changed", 8L -> "changed"))
  }
}
