package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ParquetTable, VersionedLayout}

/** Deterministic crash-state fuzz over the versioned-pointer commit:
  * build a random publish history, plant ONE random crash artifact of
  * the kinds a real crash can leave (torn pointer content, pointer
  * deleted mid-swap with the intent present, stale intent beside a
  * valid pointer, complete-but-unpublished version directory,
  * incomplete version directory), then assert the reader invariants
  * that every individual spec pins, across the whole product space:
  *
  *  1. the table still reads without error;
  *  2. what it reads is EXACTLY one of the snapshots that was actually
  *     published (or named by a write-ahead intent — the in-flight
  *     publish's target, which under single-writer is the newest
  *     commit decision);
  *  3. data from a never-published, never-intended version is never
  *     served.
  */
class CommitProtocolFuzzSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val rnd = new scala.util.Random(20260813L)

  private def snapshot(tag: String) = Seq((1L, tag)).toDF("id", "v")

  test("random crash artifacts never surface unpublished data or break reads") {
    for (iter <- 1 to 40) {
      val dir = Files.createTempDirectory("graft-fuzz").resolve("t").toString
      val t = ParquetTable(spark, dir)
      val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

      // random committed history: 1-3 published snapshots
      val nCommits = 1 + rnd.nextInt(3)
      val published = (0 until nCommits).map { i =>
        val tag = s"it$iter-c$i"
        t.overwrite(snapshot(tag))
        tag
      }
      // GC retains live + one prior; both are legitimate read results
      val legitimate = collection.mutable.Set(published.takeRight(2): _*)

      // one random crash artifact
      rnd.nextInt(5) match {
        case 0 => // torn pointer content (mid truncate-PUT)
          val out = fs.create(VersionedLayout.pointer(dir), true)
          try out.write("v-0".getBytes("UTF-8")) finally out.close()
        case 1 => // pointer deleted mid-swap, intent present (names live)
          val live = t.versions.head
          val out = fs.create(VersionedLayout.intent(dir), true)
          try out.write(live.getBytes("UTF-8")) finally out.close()
          fs.delete(VersionedLayout.pointer(dir), false)
        case 2 => // stale intent next to a VALID pointer (old crash remnant)
          val prior = t.versions.last
          val out = fs.create(VersionedLayout.intent(dir), true)
          try out.write(prior.getBytes("UTF-8")) finally out.close()
          // a valid pointer always wins over a stale intent, but if the
          // pointer is later torn, healing to this intent is legitimate
          legitimate += published(t.versions.indexOf(prior) match {
            case i if i >= 0 => published.length - 1 - i
            case _ => published.length - 1
          })
        case 3 => // complete but never-published (crash before publish)
          snapshot(s"it$iter-CRASHED").write
            .parquet(s"$dir/${VersionedLayout.nextVersion(Some(t.versions.head))}")
        case 4 => // incomplete write (no _SUCCESS)
          val crashed = s"$dir/${VersionedLayout.nextVersion(Some(t.versions.head))}"
          snapshot(s"it$iter-PARTIAL").write.parquet(crashed)
          fs.delete(new Path(s"$crashed/_SUCCESS"), false)
      }

      val got = t.read.as[(Long, String)].collect().toSeq
      assert(got.size === 1, s"iter $iter: read ${got.size} rows")
      val tag = got.head._2
      assert(!tag.endsWith("CRASHED") && !tag.endsWith("PARTIAL"),
        s"iter $iter: served never-published data '$tag'")
      assert(legitimate.contains(tag),
        s"iter $iter: served '$tag', expected one of $legitimate")
      fs.delete(new Path(dir), true)
    }
  }

  /** The round-9 failures both came from metadata (`_GRAFT_BUCKETS`,
    * `_GRAFT_MUTS`, `_GRAFT_META`) interacting with `gc`/`publish`/
    * `rollback` in ways no single-path spec exercised. This fuzz
    * drives a bucketed table through random
    * overwrite/append/rollback/crash-debris interleavings and asserts
    * after every sequence that (1) the table reads exactly the rows
    * the op history implies, (2) the root bucket-layout guard exists
    * with the right content and still rejects a mismatched caller,
    * (3) the live version's pinned meta carries the layout tag, and
    * (4) the mutation counter equals the in-place-mutation count of
    * whichever version is live (including a version re-promoted by
    * rollback, whose historical counter must resurface).
    */
  test("metadata survives random overwrite/append/rollback/crash interleavings") {
    for (iter <- 1 to 25) {
      val dir = Files.createTempDirectory("graft-fuzzmeta").resolve("t").toString
      val t = ParquetTable(spark, dir, buckets = 4, bucketKey = "id")
      val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      var nextId = 0L
      def row(tag: String) = { nextId += 1; Seq((nextId, tag)).toDF("id", "v") }

      // model: per-version contents and in-place mutation counts
      // ("" keys the legacy/un-versioned root)
      val contents = collection.mutable.Map[String, Vector[String]]()
      val muts = collection.mutable.Map[String, Long]().withDefaultValue(0L)
      def liveKey = t.liveVersion.getOrElse("")

      val nOps = 6 + rnd.nextInt(6)
      for (op <- 0 until nOps) rnd.nextInt(6) match {
        case 0 | 1 => // append: in-place, bumps the LIVE dir's counter
          val tag = s"it$iter-a$op"
          t.append(row(tag))
          contents(liveKey) = contents.getOrElse(liveKey, Vector.empty) :+ tag
          muts(liveKey) = muts(liveKey) + 1
        case 2 | 3 => // overwrite: fresh version, counter resets
          val tag = s"it$iter-o$op"
          t.overwrite(row(tag))
          contents(liveKey) = Vector(tag)
          muts(liveKey) = 0L
        case 4 => // rollback when a retained older snapshot exists
          t.liveVersion.foreach { live =>
            if (t.versions.exists(_ < live)) t.rollback()
          }
        case 5 => // crash debris: complete-but-unpublished dir + stale intent
          val orphan = VersionedLayout.freshVersion(fs, dir, t.liveVersion)
          Seq((999999L, s"it$iter-CRASHED")).toDF("id", "v")
            .write.parquet(s"$dir/$orphan")
          t.liveVersion.foreach { live =>
            val out = fs.create(VersionedLayout.intent(dir), true)
            try out.write(live.getBytes("UTF-8")) finally out.close()
          }
      }
      if (!contents.contains(liveKey)) contents(liveKey) = Vector.empty

      // (1) contents match the op history for whichever version is live
      val got = t.read.as[(Long, String)].collect().map(_._2).sorted.toSeq
      assert(got === contents(liveKey).sorted, s"iter $iter live=$liveKey")
      // (4) mutation counter tracks the live version, incl. re-promoted ones
      assert(t.mutationCount === muts(liveKey), s"iter $iter live=$liveKey")
      if (contents(liveKey).nonEmpty || muts.values.exists(_ > 0) ||
          t.liveVersion.isDefined) {
        // (2) root guard intact, correct, and enforcing
        val p = new Path(dir, "_GRAFT_BUCKETS")
        assert(fs.exists(p), s"iter $iter: root bucket guard lost")
        val in = fs.open(p)
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        assert(txt === "4:id", s"iter $iter: guard content '$txt'")
        intercept[IllegalArgumentException](
          ParquetTable(spark, dir, buckets = 8, bucketKey = "id")
            .append(row("MISMATCH")))
      }
      // (3) every published overwrite pinned the layout into its meta
      t.liveVersion.foreach { live =>
        assert(t.versionMeta(live).get("graft.buckets") === Some("4:id"),
          s"iter $iter: version meta missing layout tag")
      }
      fs.delete(new Path(dir), true)
    }
  }
}
