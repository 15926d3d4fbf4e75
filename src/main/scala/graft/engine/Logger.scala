package graft.engine

/** Leveled human-facing logging — the engine analogue of the
  * reference's winston wrapper (`lib/logger.js`): a console transport
  * and an optional JSON-lines file transport, both filtered by one
  * `--logLevel` threshold, plus the `emphatically` starred-banner
  * helper (`lib/logger.js:58-71`). This is the OPERATOR surface; the
  * machine-readable state stream stays on [[AuditSink]], and [[Book]]
  * cross-wires its state events into both.
  *
  * Severity table is the reference's (`lib/logger.js:22-32`): trace=0,
  * debug=1, info=2, notice=3, warning=4, error=5, crit=6, alert=7,
  * emerg=8. A message passes when its priority >= the threshold's —
  * the ascending-severity reading the table was written for (winston
  * 2's npm-mode comparison runs the other way, which with this table
  * would suppress errors at `info`; that upstream quirk is not
  * semantics worth matching). Unknown severities default to `info`,
  * as the reference's `log` does (`lib/logger.js:49-56`).
  *
  * Transports are driver-side and synchronized: engine pages run
  * genuinely concurrently (Chapter threads > 1), and interleaved
  * half-lines or a torn JSON record would make the log file useless.
  */
final class Logger(stdout: Boolean, file: Option[String],
    level: String = "info") {
  import Logger.levels

  private val threshold = levels.getOrElse(level,
    throw new IllegalArgumentException(
      s"unknown logLevel '$level'; one of ${levels.keys.toSeq.sorted.mkString(",")}"))

  // the file transport opens LAZILY on first passing write and close()
  // is idempotent-and-reopenable (append mode): a Book can close its
  // logger at run end without leaking one fd per Book instance, and a
  // stray post-run log line simply reopens the file
  private var sinkW: java.io.PrintWriter = null
  private def sink(): Option[java.io.PrintWriter] = file.map { f =>
    if (sinkW == null) {
      val p = java.nio.file.Paths.get(f)
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      sinkW = new java.io.PrintWriter(java.nio.file.Files.newBufferedWriter(p,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND))
    }
    sinkW
  }

  def log(message: String, severity: String = "info",
      data: Map[String, String] = Map.empty): Unit = {
    val sev = if (levels.contains(severity)) severity else "info"
    if (levels(sev) >= threshold) synchronized {
      val now = java.time.Instant.ofEpochMilli(System.currentTimeMillis())
      if (stdout) {
        val extra = if (data.isEmpty) "" else " " + graft.util.Json.obj(data.toSeq.sorted)
        println(s"$now - $sev: $message$extra")
      }
      sink().foreach { w =>
        // winston file transport shape (json:true): one JSON object
        // per line with level/message/timestamp (+ data fields)
        val fields = Seq("level" -> sev, "message" -> message,
          "timestamp" -> now.toString) ++ data.toSeq.sorted
        w.println(graft.util.Json.obj(fields))
        w.flush()
      }
    }
  }

  /** The starred banner for headline events (`lib/logger.js:58-71`). */
  def emphatically(message: String, severity: String = "info"): Unit = {
    val stars = "*" * (message.length + 6)
    log("", severity)
    log(stars, severity)
    log(s"** $message **", severity)
    log(stars, severity)
    log("", severity)
  }

  def close(): Unit = synchronized {
    if (sinkW != null) { sinkW.close(); sinkW = null }
  }
}

object Logger {
  /** `lib/logger.js:22-32`, ascending severity. */
  val levels: Map[String, Int] = Map(
    "trace" -> 0, "debug" -> 1, "info" -> 2, "notice" -> 3,
    "warning" -> 4, "error" -> 5, "crit" -> 6, "alert" -> 7, "emerg" -> 8)

  /** A logger that emits nowhere — the default when a Book is run
    * headless (tests, embedded use). */
  def silent: Logger = new Logger(stdout = false, file = None, level = "emerg")
}
