package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.connections.{ConnectionRegistry, FileConnection}
import graft.engine.{AuditSink, Book}
import graft.ops.TableOps

/** End-to-end reproduction of the reference ETL book
  * (books/etl/chapters: extract+load → addColumns → transform) on the
  * driver testdata, with the role mapping from FIXTURES.md §B:
  * customer→users, orders→purchases, part→products. Mirrors
  * test/integration/etl.js structure: run the whole book, then assert
  * golden values in the destination plus exactly one book:end audit row.
  */
class EtlBookSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("full ETL book: extract+load, transform, audit") {
    val destRoot = Files.createTempDirectory("etl_dest").toString
    val registry = new ConnectionRegistry(spark)
    val source = registry.build("file", "source", Map("path" -> sf)).asInstanceOf[FileConnection]
    val dest = registry.build("file", "dest", Map("path" -> destRoot)).asInstanceOf[FileConnection]

    val book = new Book("etl")
    val audit = new AuditSink(spark).attach(book)

    // Chapter 1: extract+load — loader discovers tables, one page each,
    // 3-way parallel (extract.js:6,32-39)
    val extract = book.addChapter(100, "extract+load", threads = 3)
    extract.addLoader("discover") {
      for (t <- Seq("customer", "orders", "part")) {
        val (key, tsCol) = t match {
          case "customer" => ("c_custkey", None)
          case "orders"   => ("o_orderkey", Some("o_orderdate"))
          case "part"     => ("p_partkey", None)
        }
        extract.addPage(s"extract_$t") {
          tsCol match {
            case Some(ts) => TableOps.incrementalExtract(source.getAll(t), dest.table(t), ts, key)
            case None     => TableOps.insertData(dest.table(t), source.getAll(t), key)
          }
        }
      }
    }

    // Chapter 2: transform users — the UPDATE…JOIN enrich
    // (transform/users.js:10-33) as left-join + coalesce + rewrite
    val transform = book.addChapter(200, "transform")
    transform.addPage("users") {
      val c = dest.getAll("customer")
      val agg = dest.getAll("orders").groupBy($"o_custkey")
        .agg(count(lit(1)).as("cnt"), sum($"o_totalprice").as("spent"))
      val enriched = c.join(agg, $"c_custkey" === $"o_custkey", "left")
        .select(c.columns.map(col) :+
          coalesce($"cnt", lit(0L)).as("totalPurchases") :+
          coalesce($"spent", lit(0.0)).as("totalSpentCents"): _*)
      dest.table("customer").overwrite(enriched, distKey = Some("c_custkey"))
    }

    book.run()
    audit.flush(dest.table("empujar"))

    // goldens: row counts survive the round trip
    assert(dest.getAll("customer").count() == source.getAll("customer").count())
    assert(dest.getAll("orders").count() == source.getAll("orders").count())
    assert(dest.getAll("part").count() == source.getAll("part").count())

    // enrichment equals a directly-computed aggregate for a sample key
    val sample = source.getAll("orders").groupBy($"o_custkey").count()
      .orderBy(desc("count")).head()
    val k = sample.getLong(0); val expected = sample.getLong(1)
    val gotRow = dest.getAll("customer").filter($"c_custkey" === k).head()
    assert(gotRow.getAs[Long]("totalPurchases") == expected)

    // customers with no orders get zeros (LEFT JOIN semantics)
    val zeroCustomers = dest.getAll("customer").filter($"totalPurchases" === 0).count()
    val noOrderCustomers = source.getAll("customer")
      .join(source.getAll("orders"), $"c_custkey" === $"o_custkey", "left_anti").count()
    assert(zeroCustomers == noOrderCustomers)

    // idempotence: re-running the incremental extract changes nothing
    TableOps.incrementalExtract(source.getAll("orders"), dest.table("orders"),
      "o_orderdate", "o_orderkey")
    assert(dest.getAll("orders").count() == source.getAll("orders").count())

    // audit: exactly one book:end (etl.js:128-134)
    val auditDf = dest.getAll("empujar")
    assert(auditDf.filter($"state" === "book:end").count() == 1)
    assert(auditDf.filter($"state" === "page:end").count() >= 4)
  }

  test("curation book: ingest → near-dup dedup → quality gate as chapters") {
    import graft.functions.TextKernels
    import graft.ops.Dedup

    val destRoot = Files.createTempDirectory("curation_dest").toString
    val registry = new ConnectionRegistry(spark)
    val source = registry.build("file", "source", Map("path" -> sf)).asInstanceOf[FileConnection]
    val dest = registry.build("file", "dest", Map("path" -> destRoot)).asInstanceOf[FileConnection]

    val book = new Book("curation")
    val audit = new AuditSink(spark).attach(book)

    val ingest = book.addChapter(100, "ingest")
    ingest.addPage("documents") {
      TableOps.insertData(dest.table("documents"), source.getAll("documents"), "doc_id")
    }

    val dedup = book.addChapter(200, "dedup")
    dedup.addPage("near_dup_keep_one") {
      val docs = dest.getAll("documents")
      val pairs = Dedup.minhashCandidatePairs(docs, "doc_id", "text",
        shingleWords = 3, bands = 4, rowsPerBand = 4)
      val keep = Dedup.nearDupSurvivors(docs, pairs, "doc_id")
        .filter($"keep_id" === $"doc_id").select($"doc_id")
      dest.table("documents").overwrite(docs.join(keep, Seq("doc_id")))
    }

    val curate = book.addChapter(300, "curate")
    curate.addPage("quality_gate") {
      val docs = dest.getAll("documents")
      val toks = TextKernels.tokens($"text")
      val quality = least(lit(1.0), size(toks).cast("double") / 100.0)
      dest.table("curated").overwrite(
        docs.select($"doc_id", size(toks).cast("long").as("n_tokens"),
            quality.as("quality_score"))
          .filter($"quality_score" >= 0.2))
    }

    book.run()
    audit.flush(dest.table("empujar"))

    val nSource = source.getAll("documents").count()
    val nDeduped = dest.getAll("documents").count()
    val nCurated = dest.getAll("curated").count()
    assert(nDeduped < nSource, "planted near-dups must collapse")
    assert(nCurated <= nDeduped && nCurated > 0)
    // chapters ran in priority order: dedup before curate
    val auditDf = dest.getAll("empujar")
    assert(auditDf.filter($"state" === "book:end").count() == 1)
    val ends = auditDf.filter($"state" === "chapter:end")
      .orderBy($"time").select($"name").collect().map(_.getString(0)).toSeq
    assert(ends === Seq("ingest", "dedup", "curate"))
  }
}
