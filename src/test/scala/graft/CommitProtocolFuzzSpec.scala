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
}
