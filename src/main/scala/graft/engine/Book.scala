package graft.engine

import java.util.concurrent.{ConcurrentLinkedQueue, Executors}
import scala.collection.mutable
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.jdk.CollectionConverters._
import scala.util.{Failure, Success, Try}

/** The dataflow DSL (SURVEY.md §1.1, §3.1): a Book of priority-ordered
  * Chapters run serially; each Chapter runs its Loaders first (in
  * parallel — loaders may dynamically add Pages, the reference's
  * discover-then-fan-out idiom, `lib/chapter.js:82-84`), then its Pages
  * with bounded parallelism (`threads`, `lib/chapter.js:124`).
  *
  * Pages are driver-side closures over DataFrames: driver concurrency
  * here is orchestration only — the actual data parallelism lives in
  * Spark's scheduler, so `threads` bounds concurrent *jobs*, not tasks.
  * Failure is fail-fast with {chapter, page} context
  * (`lib/book.js:280-287,314-331`).
  */
final class Book(val name: String, val options: BookOptions = BookOptions()) {
  private val chapters = mutable.ArrayBuffer.empty[Chapter]
  private val listeners = mutable.ArrayBuffer.empty[StateEvent => Unit]

  /** Leveled operator log (`lib/logger.js`; `--logLevel` =
    * options.logLevel). State events are cross-wired in [[emit]]
    * alongside the [[AuditSink]] listeners: page/loader chatter at
    * `debug`, errors at `error`, the rest at `info` — so the default
    * threshold shows the chapter skeleton and a `--logLevel debug` run
    * shows per-page progress, matching the reference's verbosity split
    * (`lib/book.js` logs page detail at debug/trace).
    */
  val logger: Logger =
    new Logger(options.logStdout, options.logFile, options.logLevel)

  private def severityOf(state: String): String =
    if (state.endsWith(":error")) "error"
    else if (state.startsWith("page:") || state.startsWith("loader:")) "debug"
    else "info"
  // book.data scratch (lib/book.js:40). TrieMap, not mutable.Map: the
  // reference is single-threaded but pages here genuinely run
  // concurrently (threads > 1), and a plain HashMap corrupts under
  // concurrent put.
  val data: mutable.Map[String, Any] = scala.collection.concurrent.TrieMap.empty

  def addChapter(priority: Int, chapterName: String, threads: Int = 1): Chapter = {
    val c = new Chapter(this, priority, chapterName, threads)
    chapters += c
    c
  }

  def onState(f: StateEvent => Unit): Unit = listeners += f

  private[engine] def emit(state: String, name: String, durationMs: Long = 0L,
      extra: Map[String, String] = Map.empty): Unit = {
    val ev = StateEvent(state, System.currentTimeMillis(), name, durationMs / 1000.0, extra)
    logger.log(s"$state $name" +
      (if (durationMs > 0) f" (${durationMs / 1000.0}%.1fs)" else ""),
      severityOf(state), extra)
    listeners.foreach(_(ev))
  }

  /** `--chapters "1,4"` / `"100-300"` selection (`lib/book.js:16-38`). */
  private[engine] def selected(priority: Int): Boolean = options.chapterSelection match {
    case None => true
    case Some(sel) => sel.split(",").map(_.trim).exists {
      case s if s.contains("-") =>
        val Array(lo, hi) = s.split("-", 2).map(_.trim.toInt)
        priority >= lo && priority <= hi
      case s => Try(s.toInt).toOption.contains(priority)
    }
  }

  /** Serial chapters, fail-fast; single-instance pid lock around the
    * whole run (`lib/book.js:84-101,227-333`).
    */
  def run(): Unit = {
    val lock = options.pidDir.map(d => PidLock.acquire(d, name))
    val t0 = System.currentTimeMillis()
    emit("book:start", name)
    try {
      chapters.sortBy(_.priority).foreach { c =>
        if (selected(c.priority)) c.run()
      }
      emit("book:end", name, System.currentTimeMillis() - t0)
    } catch {
      case e: BookError =>
        emit("book:error", name, System.currentTimeMillis() - t0,
          Map("error" -> e.getMessage, "chapter" -> e.chapter, "page" -> e.page))
        throw e
    } finally {
      lock.foreach(_.release())
      // release the file transport (idempotent; reopens on later use)
      logger.close()
    }
  }
}

final case class BookOptions(
    chapterSelection: Option[String] = None, // --chapters
    getAllLimit: Option[Long] = None,        // global row cap (lib/book.js:74)
    pidDir: Option[String] = None,
    logLevel: String = "info",               // --logLevel (lib/logger.js)
    logFile: Option[String] = None,          // --logFile (JSON lines)
    logStdout: Boolean = false)              // console transport opt-in

object BookOptions {
  /** The reference's CLI wiring (`optimist.argv` merged into book
    * options, `books/etl/book.js:7`): `--chapters 1,4` / `100-300`,
    * `--logLevel debug`, `--logFile run.log`, `--logStdout true`,
    * `--getAllLimit 1000`, `--pidDir pids`. Unknown flags fail fast —
    * a typoed `--loglevel` silently ignored would run at the wrong
    * verbosity forever.
    */
  def fromArgs(args: Array[String], base: BookOptions = BookOptions()): BookOptions = {
    require(args.length % 2 == 0,
      s"flags come in --name value pairs, got: ${args.mkString(" ")}")
    args.grouped(2).foldLeft(base) { case (o, Array(flag, v)) =>
      flag match {
        case "--chapters"    => o.copy(chapterSelection = Some(v))
        case "--getAllLimit" => o.copy(getAllLimit = Some(v.toLong))
        case "--pidDir"      => o.copy(pidDir = Some(v))
        case "--logLevel"    => o.copy(logLevel = v)
        case "--logFile"     => o.copy(logFile = Some(v))
        case "--logStdout"   => o.copy(logStdout = v.toBoolean)
        case other => throw new IllegalArgumentException(
          s"unknown flag '$other'; known: --chapters --getAllLimit " +
            "--pidDir --logLevel --logFile --logStdout")
      }
    }
  }
}

final case class StateEvent(state: String, timeMs: Long, name: String,
    durationSec: Double, data: Map[String, String])

final class BookError(val chapter: String, val page: String, cause: Throwable)
  extends RuntimeException(s"chapter=$chapter page=$page: ${cause.getMessage}", cause)

final class Chapter(book: Book, val priority: Int, val name: String, threads: Int) {
  private val loaders = mutable.ArrayBuffer.empty[(String, () => Unit)]
  // Pages may be added concurrently by loaders (lib/chapter.js:82-84).
  private val pages = new ConcurrentLinkedQueue[(String, () => Unit)]()

  def addLoader(loaderName: String)(f: => Unit): Unit = loaders += (loaderName -> (() => f))
  def addPage(pageName: String)(f: => Unit): Unit = pages.add(pageName -> (() => f))

  private[engine] def run(): Unit = {
    val t0 = System.currentTimeMillis()
    book.emit("chapter:start", name)
    // Loaders run in parallel BEFORE pages materialize (lib/chapter.js:41-77).
    runBounded(loaders.toSeq, loaders.size.max(1), "loader")
    // Pages with bounded parallelism (async.parallelLimit, lib/chapter.js:124).
    runBounded(pages.asScala.toSeq, threads.max(1), "page")
    book.emit("chapter:end", name, System.currentTimeMillis() - t0)
  }

  private def runBounded(jobs: Seq[(String, () => Unit)], bound: Int, kind: String): Unit = {
    if (jobs.isEmpty) return
    val pool = Executors.newFixedThreadPool(math.min(bound, jobs.size))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = jobs.map { case (jobName, f) =>
        Future {
          val t = System.currentTimeMillis()
          book.emit(s"$kind:start", jobName)
          try { f(); book.emit(s"$kind:end", jobName, System.currentTimeMillis() - t) }
          catch { case e: Throwable => throw new BookError(name, jobName, e) }
        }
      }
      Await.result(Future.sequence(futures), Duration.Inf)
    } catch {
      case e: BookError => throw e
      case e: Throwable => e.getCause match {
        case be: BookError => throw be
        case _ => throw new BookError(name, "?", e)
      }
    } finally pool.shutdown()
  }
}

/** Single-instance lock (`ensurePid`, `lib/book.js:84-101`): throws
  * (reporting the holder's pid, the reference's error shape) if a live
  * process holds the lock.
  *
  * Held as an OS advisory file lock, not a pid-liveness protocol: the
  * lock dies WITH the process, so a crashed book needs no stale-pid
  * stealing (the file may linger but is unlocked and simply
  * re-acquired), and there is no read-check-delete window in which two
  * losers can each free the other's freshly re-acquired lock — the
  * race that makes every delete-based steal unsound. The pid is still
  * written into the file for the error message and for humans.
  */
final class PidLock private (ch: java.nio.channels.FileChannel) {
  /** Closing the channel releases the OS lock; the file is left in
    * place on purpose. Deleting it after close would race a new
    * acquirer that locked the same inode in between — the unlink
    * would orphan THEIR lock and let a third process acquire a fresh
    * file concurrently. An inert unlocked pid file costs nothing and
    * is simply re-locked by the next acquire.
    */
  def release(): Unit = ch.close()
}
object PidLock {
  def acquire(dir: String, name: String): PidLock = {
    val d = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(d)
    val p = d.resolve(s"$name.pid")
    val ch = java.nio.channels.FileChannel.open(p,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.READ,
      java.nio.file.StandardOpenOption.WRITE)
    val lock =
      try Option(ch.tryLock())
      catch { // same-JVM holder surfaces as Overlapping, not null
        case _: java.nio.channels.OverlappingFileLockException => None
      }
    lock match {
      case None =>
        val old =
          try {
            val buf = java.nio.ByteBuffer.allocate(64)
            val n = ch.read(buf, 0)
            if (n <= 0) "?" else new String(buf.array(), 0, n, "UTF-8").trim
          } finally ch.close()
        throw new IllegalStateException(s"pid $old already running book $name")
      case Some(_) =>
        ch.truncate(0)
        ch.write(java.nio.ByteBuffer.wrap(
          ProcessHandle.current().pid().toString.getBytes("UTF-8")), 0)
        ch.force(true)
        new PidLock(ch)
    }
  }
}
