package graft

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine._

/** Orchestration-core behaviors, mirroring test/lib/book.js and
  * test/lib/chapter.js of the reference.
  */
class EngineSpec extends AnyFunSuite {

  private def record(): (ConcurrentLinkedQueue[String], String => Unit) = {
    val q = new ConcurrentLinkedQueue[String]()
    (q, (s: String) => q.add(s))
  }

  test("chapters run in priority order (book.js:104-117)") {
    val (log, add) = record()
    val b = new Book("t")
    b.addChapter(300, "third").addPage("p3")(add("3"))
    b.addChapter(100, "first").addPage("p1")(add("1"))
    b.addChapter(200, "second").addPage("p2")(add("2"))
    b.run()
    assert(log.asScala.toSeq == Seq("1", "2", "3"))
  }

  test("--chapters list and range selection (book.js:119-145)") {
    def runWith(sel: String): Seq[String] = {
      val (log, add) = record()
      val b = new Book("t", BookOptions(chapterSelection = Some(sel)))
      b.addChapter(1, "c1").addPage("p")(add("1"))
      b.addChapter(2, "c2").addPage("p")(add("2"))
      b.addChapter(3, "c3").addPage("p")(add("3"))
      b.run()
      log.asScala.toSeq
    }
    assert(runWith("1,3") == Seq("1", "3"))
    assert(runWith("2-3") == Seq("2", "3"))
  }

  test("loaders run before pages and may add pages (chapter.js:7-24,82-84)") {
    val (log, add) = record()
    val b = new Book("t")
    val c = b.addChapter(1, "c", threads = 2)
    c.addLoader("discover") {
      add("loader")
      // dynamic fan-out: one page per discovered unit (extract.js:32-39)
      c.addPage("dyn1")(add("dyn1"))
      c.addPage("dyn2")(add("dyn2"))
    }
    b.run()
    val seq = log.asScala.toSeq
    assert(seq.head == "loader")
    assert(seq.toSet == Set("loader", "dyn1", "dyn2"))
  }

  test("pages run concurrently up to threads (chapter.js:26-70)") {
    val b = new Book("t")
    val c = b.addChapter(1, "c", threads = 4)
    val t0 = System.currentTimeMillis()
    (1 to 4).foreach(i => c.addPage(s"p$i")(Thread.sleep(300)))
    b.run()
    val wall = System.currentTimeMillis() - t0
    assert(wall < 1000, s"4x300ms pages at threads=4 took ${wall}ms — not parallel")
  }

  test("serial when threads=1") {
    val b = new Book("t")
    val c = b.addChapter(1, "c", threads = 1)
    val t0 = System.currentTimeMillis()
    (1 to 3).foreach(i => c.addPage(s"p$i")(Thread.sleep(150)))
    b.run()
    assert(System.currentTimeMillis() - t0 >= 450)
  }

  test("failure carries {chapter, page} context and halts (book.js:45-71,314-331)") {
    val (log, add) = record()
    val b = new Book("t")
    b.addChapter(1, "boom").addPage("bad")(throw new RuntimeException("nope"))
    b.addChapter(2, "after").addPage("never")(add("never"))
    val e = intercept[BookError](b.run())
    assert(e.chapter == "boom")
    assert(e.page == "bad")
    assert(!log.asScala.toSeq.contains("never")) // halted at failing chapter
  }

  test("state events stream in lifecycle order (book.js:234-310)") {
    val events = new ConcurrentLinkedQueue[String]()
    val b = new Book("t")
    b.onState(e => events.add(e.state))
    b.addChapter(1, "c").addPage("p")(())
    b.run()
    val s = events.asScala.toSeq
    assert(s.head == "book:start")
    assert(s.last == "book:end")
    assert(s.containsSlice(Seq("chapter:start", "page:start", "page:end", "chapter:end")))
  }

  test("pid lock: second live acquire throws, stale pid stolen (book.js:84-101)") {
    val dir = Files.createTempDirectory("pids").toString
    val l1 = PidLock.acquire(dir, "b")
    intercept[IllegalStateException](PidLock.acquire(dir, "b"))
    l1.release()
    // release leaves the file in place: deleting after close would race
    // a new acquirer locking the same inode (the unlink would orphan
    // THEIR lock and admit a third concurrent holder)
    assert(Files.exists(java.nio.file.Paths.get(dir, "b.pid")))
    // the inert unlocked file is simply re-acquired
    PidLock.acquire(dir, "b").release()
    // stale pid (dead process id) is stolen
    Files.write(java.nio.file.Paths.get(dir, "b.pid"), "999999999".getBytes)
    PidLock.acquire(dir, "b").release()
  }

  test("audit sink captures book:end exactly once (etl.js:128-134)") {
    import TestSpark._
    val b = new Book("etl")
    val sink = new AuditSink(spark).attach(b)
    b.addChapter(1, "c").addPage("p")(())
    b.run()
    val df = sink.toDf
    assert(df.filter(df("state") === "book:end").count() == 1)
    assert(df.columns.toSeq == Seq("state", "time", "name", "duration", "data"))
  }

  test("logger filters by level and writes JSON lines to the file transport (logger.js)") {
    val f = java.nio.file.Files.createTempFile("graft-log", ".log")
    val log = new Logger(stdout = false, file = Some(f.toString), level = "info")
    log.log("page detail", "debug")    // below threshold — dropped
    log.log("chapter done", "info")
    log.log("boom", "error", Map("chapter" -> "c1"))
    log.log("weird", "not-a-level")    // unknown severity → info, logged
    log.close()
    val lines = java.nio.file.Files.readAllLines(f)
    assert(lines.size === 3, s"debug must be filtered at info: $lines")
    assert(lines.get(0).contains("\"level\": \"info\"") &&
      lines.get(0).contains("\"message\": \"chapter done\""))
    assert(lines.get(1).contains("\"level\": \"error\"") &&
      lines.get(1).contains("\"chapter\": \"c1\""))
    assert(lines.get(2).contains("\"message\": \"weird\""))
    // every line parses as a JSON object (winston json:true shape)
    lines.forEach(l => assert(l.startsWith("{") && l.endsWith("}")))
  }

  test("a debug threshold admits page chatter; an error threshold drops info") {
    val f = java.nio.file.Files.createTempFile("graft-log", ".log")
    val dbg = new Logger(stdout = false, file = Some(f.toString), level = "trace")
    dbg.log("page detail", "debug")
    dbg.close()
    assert(java.nio.file.Files.readAllLines(f).size === 1)
    val f2 = java.nio.file.Files.createTempFile("graft-log", ".log")
    val err = new Logger(stdout = false, file = Some(f2.toString), level = "error")
    err.log("chapter done", "info")
    err.log("boom", "crit")
    err.close()
    val lines = java.nio.file.Files.readAllLines(f2)
    assert(lines.size === 1 && lines.get(0).contains("boom"))
  }

  test("unknown logLevel threshold fails fast") {
    val e = intercept[IllegalArgumentException](
      new Logger(stdout = false, file = None, level = "loud"))
    assert(e.getMessage.contains("logLevel"))
  }

  test("book state events cross-wire into book.logger with the verbosity split") {
    val f = java.nio.file.Files.createTempFile("graft-book", ".log")
    val b = new Book("logged", BookOptions(logFile = Some(f.toString)))
    b.addChapter(1, "c").addPage("p")(())
    b.run()
    b.logger.close()
    val lines = java.nio.file.Files.readAllLines(f)
    val text = String.join("\n", lines)
    // default info threshold: book/chapter skeleton present…
    assert(text.contains("book:start") && text.contains("chapter:end"))
    // …page chatter filtered (debug severity, reference's split)
    assert(!text.contains("page:start"), s"page events must be debug: $text")
    val dbgFile = java.nio.file.Files.createTempFile("graft-book", ".log")
    val b2 = new Book("logged2",
      BookOptions(logFile = Some(dbgFile.toString), logLevel = "debug"))
    b2.addChapter(1, "c").addPage("p")(())
    b2.run()
    b2.logger.close()
    assert(String.join("\n",
      java.nio.file.Files.readAllLines(dbgFile)).contains("page:start"))
  }

  test("BookOptions.fromArgs parses the reference CLI flags; typos fail fast") {
    val o = BookOptions.fromArgs(Array(
      "--chapters", "100-300", "--logLevel", "debug", "--logFile", "run.log",
      "--logStdout", "true", "--getAllLimit", "1000", "--pidDir", "pids"))
    assert(o === BookOptions(Some("100-300"), Some(1000L), Some("pids"),
      "debug", Some("run.log"), logStdout = true))
    // unknown flag: fail, don't silently run at the wrong verbosity
    val e = intercept[IllegalArgumentException](
      BookOptions.fromArgs(Array("--loglevel", "debug")))
    assert(e.getMessage.contains("--loglevel"))
    intercept[IllegalArgumentException](
      BookOptions.fromArgs(Array("--chapters"))) // dangling flag
    // parsed selection drives chapter filtering end-to-end
    val (log, add) = record()
    val b = new Book("cli", BookOptions.fromArgs(Array("--chapters", "2-3")))
    b.addChapter(1, "c1").addPage("p")(add("1"))
    b.addChapter(2, "c2").addPage("p")(add("2"))
    b.addChapter(3, "c3").addPage("p")(add("3"))
    b.run()
    assert(log.asScala.toSeq === Seq("2", "3"))
  }

  test("emphatically writes the starred banner (logger.js:58-71)") {
    val f = java.nio.file.Files.createTempFile("graft-log", ".log")
    val log = new Logger(stdout = false, file = Some(f.toString), level = "info")
    log.emphatically("all done")
    log.close()
    val lines = java.nio.file.Files.readAllLines(f)
    assert(lines.size === 5)
    assert(lines.get(2).contains("** all done **"))
    assert(lines.get(1).contains("*" * ("all done".length + 6)))
  }
}
