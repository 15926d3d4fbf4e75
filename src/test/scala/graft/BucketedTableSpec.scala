package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TableOps
import graft.sources.ParquetTable

/** Partition-scoped upsert over hash-bucketed ParquetTables: an
  * incremental batch must rewrite ONLY the buckets it touches
  * (round-1 verdict scale-killer #1 — the flat path rewrote 100% of
  * the destination per batch).
  */
class BucketedTableSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmp(name: String, buckets: Int): ParquetTable =
    ParquetTable(spark, Files.createTempDirectory("graft-bkt").resolve(name).toString,
      buckets = buckets, bucketKey = "id")

  private def rows(r: (Long, String)*): DataFrame = r.toDF("id", "v")

  /** (bucket dir → sorted file list with sizes+mtimes) fingerprint. */
  private def state(t: ParquetTable): Map[String, Seq[(String, Long, Long)]] = {
    val base = new java.io.File(t.dataDir)
    base.listFiles().filter(f => f.isDirectory && f.getName.startsWith("__bucket="))
      .map { d =>
        d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet")).toSeq
          .map(f => (f.getName, f.length, f.lastModified)).sortBy(_._1)
      }.toMap
  }

  test("incremental upsert rewrites only affected buckets") {
    val t = tmp("fact", buckets = 8)
    TableOps.insertData(t, rows((1L to 64L).map(i => i -> s"v$i"): _*))
    val before = state(t)
    assert(before.size === 8, "64 sequential keys must populate all 8 buckets")

    // one-key batch → exactly one affected bucket
    Thread.sleep(1100) // mtime granularity
    TableOps.insertData(t, rows(7L -> "UPDATED"))
    val after = state(t)

    val changed = after.keySet.filter(k => before(k) != after(k))
    assert(changed.size === 1, s"expected 1 rewritten bucket, got $changed")

    val got = t.read.as[(Long, String)].collect().toMap
    assert(got.size === 64)
    assert(got(7L) === "UPDATED")
    assert(got(8L) === "v8")
  }

  test("a batch with a narrower key type hashes at the TABLE's key type") {
    // Murmur3 hashes Int and Long inputs differently; a batch whose
    // key arrived as IntegerType passes the no-op schema check, so the
    // affected-bucket computation MUST cast to the table's LongType
    // first or dynamic overwrite replaces the wrong bucket directories
    // (silent loss of every pre-existing row in the mis-hashed bucket)
    val t = tmp("narrow", buckets = 8)
    TableOps.insertData(t, rows((1L to 64L).map(i => i -> s"v$i"): _*))
    val intBatch = Seq((7, "UPDATED"), (65, "NEW")).toDF("id", "v") // IntegerType id
    TableOps.insertData(t, intBatch)
    val got = t.read.as[(Long, String)].collect().toMap
    assert(got.size === 65, s"rows lost: ${(1L to 65L).filterNot(got.contains)}")
    assert(got(7L) === "UPDATED")
    assert(got(64L) === "v64")
  }

  test("bucket-scoped read prunes partitions in the plan") {
    val t = tmp("pruned", buckets = 8)
    TableOps.insertData(t, rows((1L to 64L).map(i => i -> s"v$i"): _*))
    val plan = t.readBuckets(Seq(0, 1)).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("__bucket"),
      s"bucket filter must reach the scan as a partition filter:\n$plan")
  }

  test("schema-evolving batch falls back to full rewrite and heals") {
    val t = tmp("evolve", buckets = 4)
    TableOps.insertData(t, rows(1L -> "a", 2L -> "b"))
    TableOps.insertData(t, Seq((3L, "c", 42L)).toDF("id", "v", "extra"))
    val got = t.read.orderBy("id").collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(got(0).isNullAt(got(0).fieldIndex("extra")), "old rows get NULL in added column")
    assert(got(2).getAs[Long]("extra") === 42L)
  }

  test("upsert result matches flat-table semantics exactly") {
    val flat = tmp("flat", buckets = 0)
    val bkt = tmp("bkt", buckets = 8)
    for (t <- Seq(flat, bkt)) {
      TableOps.insertData(t, rows((1L to 20L).map(i => i -> s"v$i"): _*))
      TableOps.insertData(t, rows(5L -> "x", 21L -> "new"))
    }
    val a = flat.read.as[(Long, String)].collect().sortBy(_._1).toSeq
    val b = bkt.read.as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(a === b)
  }

  test("append into a bucketed table keeps bucket layout") {
    val t = tmp("app", buckets = 4)
    TableOps.insertData(t, rows(1L -> "a"))
    t.append(rows(2L -> "b"))
    assert(t.read.count() === 2)
    assert(state(t).keySet.forall(_.startsWith("__bucket=")))
  }
}
