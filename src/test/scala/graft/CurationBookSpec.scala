package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.connections.{ConnectionRegistry, FileConnection}
import graft.engine.{AuditSink, Book}
import graft.ops.{Dedup, QualityRules, Sample, ShardExport}

/** End-to-end LLM-data curation BOOK: the [EXT] pipeline operators
  * (quality gate → exact dedup → mixture sample → shard manifest)
  * driven through the reference's Book/Chapter/Page + audit-sink
  * orchestration surface (lib/book.js, lib/chapter.js;
  * test/integration/etl.js:128-134 asserts the audit table the same
  * way) — proving the engine DSL carries the curation pipeline, not
  * just the ETL fixtures.
  *
  * The pipeline stages write real ParquetTables between chapters (the
  * staged-table idiom every reference book uses), and the audit log is
  * asserted for ordering, completeness, and zero errors.
  */
class CurationBookSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val stopwords = Seq("the", "a", "of", "and", "to", "in")

  test("attritionFunnel labels every doc with its first failing stage, masses sum back") {
    import graft.ops.Corpus
    val good1 = "the quick brown fox jumps over the lazy dog again and again"
    val good2 = "a different corpus document with the usual stopwords in it and more"
    val docs = Seq(
      (1L, good1, "s1"),            // kept or sampled by hash
      (2L, good1, "s1"),            // exact duplicate of 1 → duplicate
      (3L, "too short", "s1"),      // fails the gate
      (4L, good2, "s2"))            // distinct good doc
      .toDF("doc_id", "text", "source")
    val got = Corpus.attritionFunnel(docs, "doc_id", "text", "source",
      Seq("the", "a", "of", "and", "to", "in"),
      rates = Map("s1" -> 1.0), defaultRate = 1.0)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // rate 1.0 everywhere → nothing sampled out
    assert(got("low_quality") === ((1L, "too short".length.toLong)))
    assert(got("duplicate") === ((1L, good1.length.toLong)))
    assert(got("kept") === ((2L, good1.length.toLong + good2.length)))
    assert(!got.contains("sampled_out"))
    // masses sum back to the input
    assert(got.values.map(_._1).sum === 4L)
    // zero rates → quality-surviving dedup winners all sample out
    val all0 = Corpus.attritionFunnel(docs, "doc_id", "text", "source",
      Seq("the", "a", "of", "and", "to", "in"),
      rates = Map.empty, defaultRate = 0.0)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(all0("sampled_out") === 2L)
    assert(!all0.contains("kept"))
  }

  test("book ingest with drift monitoring lands alerts in the audit stream (O6)") {
    import graft.sources.ParquetTable
    import graft.streaming.StreamingLift
    val base = Files.createTempDirectory("curation-drift")
    val registry = new ConnectionRegistry(spark)
    val dest = registry.build("file", "dest",
      Map("path" -> base.resolve("dest").toString)).asInstanceOf[FileConnection]
    val srcDir = base.resolve("incoming").toString
    val states = ParquetTable(spark, base.resolve("drift-states").toString)
    val alerts = ParquetTable(spark, base.resolve("drift-alerts").toString)
    val ckpt = base.resolve("ckpt").toString
    def stats(vs: Seq[Long]) = vs.map(v => ("web", v)).toDF("source", "n_chars")
    val schema = stats(Nil).schema

    val book = new Book("curation-monitored")
    val audit = new AuditSink(spark).attach(book)
    // day 1 establishes the baseline; day 2 arrives in a disjoint
    // length regime — the monitor must alert, and the alert must land
    // in the SAME audit table as the book lifecycle events (the
    // reference's one-event-stream convention, books/etl/book.js:13-15)
    stats(1L to 20L).write.parquet(srcDir + "/day1")
    val day1 = book.addChapter(100, "ingest_day1")
    day1.addPage("drift_monitored_ingest_day1") {
      StreamingLift.histDriftStream(spark, srcDir + "/*", schema, states,
        alerts, "source", "n_chars", ckpt).awaitTermination(60000)
    }
    val day2 = book.addChapter(200, "ingest_day2")
    day2.addPage("drift_monitored_ingest_day2") {
      stats((1L to 20L).map(_ + 100000L)).write.parquet(srcDir + "/day2")
      StreamingLift.histDriftStream(spark, srcDir + "/*", schema, states,
        alerts, "source", "n_chars", ckpt).awaitTermination(60000)
    }
    val monitor = book.addChapter(300, "drift_audit")
    monitor.addPage("record_drift") {
      book.data("n_drift") = audit.recordDrift(alerts.read, "source")
    }
    book.run()
    audit.flush(dest.table("empujar"))

    val events = dest.getAll("empujar")
      .select("state", "name", "data").collect()
    val drift = events.filter(_.getString(0) == "drift:alert")
    assert(drift.length === 1 && drift.head.getString(1) === "web")
    // fully disjoint regimes → exactly 1,000,000 ppm, carried verbatim
    assert(drift.head.getString(2).contains("\"tvd_ppm\": \"1000000\""))
    assert(book.data("n_drift") === 1)
    // the drift events coexist with the normal lifecycle shape
    assert(events.count(_.getString(0) == "book:end") === 1)
    assert(events.count(_.getString(0) == "book:error") === 0)
    assert(events.count(_.getString(0) == "chapter:end") === 3)
  }

  test("curation book: ingest → quality gate → dedup → mixture → shards, audited") {
    val destRoot = Files.createTempDirectory("curation_dest").toString
    val registry = new ConnectionRegistry(spark)
    val source = registry.build("file", "source", Map("path" -> sf))
      .asInstanceOf[FileConnection]
    val dest = registry.build("file", "dest", Map("path" -> destRoot))
      .asInstanceOf[FileConnection]

    val book = new Book("curation")
    val audit = new AuditSink(spark).attach(book)

    // Chapter 100 — ingest: raw docs plus 20 PLANTED exact duplicates
    // under high ids, so the dedup chapter has known prey. The loader
    // discovers the table then fans out the page (the reference's
    // discover-then-add-pages idiom).
    val ingest = book.addChapter(100, "ingest")
    ingest.addLoader("discover") {
      ingest.addPage("ingest_documents") {
        val raw = source.getAll("documents")
        val planted = raw.orderBy("doc_id").limit(20)
          .withColumn("doc_id", col("doc_id") + lit(1000000L))
        dest.table("docs_raw").overwrite(raw.unionByName(planted))
        book.data("n_raw") = dest.getAll("docs_raw").count()
      }
    }

    // Chapter 200 — quality gate: Gopher rules, keep pass == 1
    val quality = book.addChapter(200, "quality")
    quality.addPage("gopher_gate") {
      val docs = dest.getAll("docs_raw")
      val keep = QualityRules.gopherRules(docs, "doc_id", "text", stopwords)
        .filter(col("pass") === 1).select("doc_id")
      dest.table("docs_quality").overwrite(
        docs.join(keep, Seq("doc_id"), "left_semi"))
    }

    // Chapter 300 — exact dedup: one survivor (min id) per content
    val dedup = book.addChapter(300, "dedup")
    dedup.addPage("exact_dedup") {
      val docs = dest.getAll("docs_quality")
      val survivors = Dedup.exact(docs, "doc_id", "text")
        .select(col("keep_id").as("doc_id"))
      dest.table("docs_dedup").overwrite(
        docs.join(survivors, Seq("doc_id"), "left_semi"))
    }

    // Chapter 400 — mixture sample: deterministic per-source rates
    val mix = book.addChapter(400, "mixture")
    mix.addPage("mixture_sample") {
      val docs = dest.getAll("docs_dedup")
      dest.table("docs_train").overwrite(Sample.mixtureByHash(
        docs, "source", "doc_id",
        rates = Map("src0" -> 1.0, "src1" -> 0.25), defaultRate = 0.5))
    }

    // Chapter 500 — shard export manifest over the sampled set
    val shard = book.addChapter(500, "shards")
    shard.addPage("shard_manifest") {
      val train = dest.getAll("docs_train")
      val assigned = ShardExport.assign(train, "doc_id", numShards = 4, seed = 7L)
      dest.table("shard_manifest").overwrite(
        ShardExport.manifest(assigned, "doc_id", "n_chars"))
    }

    book.run()
    audit.flush(dest.table("empujar"))

    // ---- pipeline result assertions -------------------------------
    val nRaw = book.data("n_raw").asInstanceOf[Long]
    assert(nRaw === source.getAll("documents").count() + 20)

    val nQuality = dest.getAll("docs_quality").count()
    assert(nQuality <= nRaw)

    // every planted duplicate that survived the gate must lose exact
    // dedup to its lower-id original (identical text ⇒ identical
    // verdicts ⇒ the original is present too)
    val deduped = dest.getAll("docs_dedup")
    assert(deduped.filter(col("doc_id") >= 1000000L).count() === 0)
    assert(deduped.count() ===
      dest.getAll("docs_quality").select("text").distinct().count())

    // mixture is a deterministic subset with the configured rates
    val train = dest.getAll("docs_train")
    assert(train.count() > 0 && train.count() < deduped.count())
    assert(train.join(deduped, Seq("doc_id"), "left_anti").count() === 0)
    // rate 1.0 keeps ALL of src0
    assert(train.filter(col("source") === "src0").count() ===
      deduped.filter(col("source") === "src0").count())
    // rate 0.25 keeps strictly fewer of src1
    assert(train.filter(col("source") === "src1").count() <
      deduped.filter(col("source") === "src1").count())

    // shard manifest covers the whole training set, rows+bytes exact
    val manifest = dest.getAll("shard_manifest")
    assert(manifest.agg(sum("n_docs")).head().getLong(0) === train.count())
    assert(manifest.agg(sum("total_bytes")).head().getLong(0) ===
      train.agg(sum("n_chars")).head().getLong(0))

    // ---- audit assertions (the etl.js:128-134 shape) --------------
    val events = dest.getAll("empujar")
      .select("state", "name", "time").collect()
    def count(state: String) = events.count(_.getString(0) == state)
    assert(count("book:start") === 1)
    assert(count("book:end") === 1)
    assert(count("book:error") === 0)
    assert(count("chapter:start") === 5)
    assert(count("chapter:end") === 5)
    assert(count("loader:start") === 1)
    // every page ran exactly once
    val pageEnds = events.filter(_.getString(0) == "page:end").map(_.getString(1))
    assert(pageEnds.sorted.toSeq === Seq("exact_dedup", "gopher_gate",
      "ingest_documents", "mixture_sample", "shard_manifest"))
    // chapters completed in priority order
    val chapterEnds = events.filter(_.getString(0) == "chapter:end")
      .sortBy(_.getTimestamp(2).getTime).map(_.getString(1)).toSeq
    assert(chapterEnds === Seq("ingest", "quality", "dedup", "mixture", "shards"))
  }
}
