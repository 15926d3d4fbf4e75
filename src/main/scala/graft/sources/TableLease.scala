package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** Table-scoped single-writer lease — the [[graft.engine.PidLock]]
  * model (reference: `lib/book.js:84-101`) at TABLE granularity, for
  * the mutable-state tables streams and maintenance ops share.
  *
  * The streaming indexes and their side outputs document a
  * single-writer contract ("stream stopped — like every maintenance
  * op here"), but documentation refuses nothing: a standalone
  * compaction launched against an index a live stream is folding into
  * would interleave an `overwriteBuckets` with the stream's appends.
  * The lease makes the contract code: a small `_GRAFT_LEASE` file at
  * the table root (spared by version GC like every `_GRAFT_*`
  * artifact), taken by streams for their whole run and by maintenance
  * ops for their critical section; a second writer REFUSES loudly,
  * naming the holder.
  *
  * Why a lease FILE and not an OS `FileChannel` lock like PidLock:
  * the table may live on an object store, where advisory OS locks do
  * not exist — the lease is a plain object PUT/GET/DELETE, the same
  * primitives the versioned-layout publish already relies on.
  * The trade-offs are explicit:
  *
  *  - '''same process''': a holder registers an aliveness probe
  *    (streams: `query.isActive`); a terminated stream's lease is
  *    reclaimed deterministically by the next acquirer — no listener
  *    races, no sleeps.
  *  - '''same host, dead process''': the recorded pid no longer runs
  *    (`ProcessHandle.of(pid)`) — crash-stale, reclaimed
  *    automatically. (A recycled pid pointing at an unrelated live
  *    process refuses conservatively; see `break`.)
  *  - '''different host''': liveness cannot be probed from here, so
  *    the acquirer always refuses and names the holder. Freeing a
  *    lease whose holder is known dead is a human/orchestrator call:
  *    [[TableLease.break]]. A cluster-grade deployment layers a
  *    TTL/heartbeat on top; that renewal policy is deliberately out
  *    of scope here, exactly as the reference's pid lock is
  *    single-box.
  *
  * The create-if-absent PUT is atomic on HDFS and single-box
  * filesystems; S3-class stores need conditional-PUT semantics (now
  * standard) wired into their Hadoop connector for the same guarantee.
  */
final class TableLease private[sources] (
    private[sources] val leasePath: Path,
    private[sources] val fs: FileSystem,
    val token: String,
    tablePath: String) {

  /** True when `t` is the table this lease was taken on — maintenance
    * ops called under a caller-held lease verify coverage instead of
    * re-acquiring (a second acquire by the same process on the same
    * table is a refusal, not re-entrancy: two writers in one JVM are
    * still two writers).
    */
  def covers(t: ParquetTable): Boolean =
    new Path(t.path) == new Path(tablePath)

  /** Delete the lease file — only if it still carries this lease's
    * token (a broken-then-reacquired lease is someone else's; deleting
    * it here would orphan THEIR lease, the unsoundness PidLock's doc
    * names). Idempotent.
    */
  def release(): Unit = {
    TableLease.unregister(leasePath)
    if (TableLease.readInfo(fs, leasePath).exists(_.get("token").contains(token)))
      fs.delete(leasePath, false): Unit
  }
}

object TableLease {
  val LeaseFile = "_GRAFT_LEASE"

  /** Process-wide holder registry: lease-file URI → (token, aliveness
    * probe). Lets an acquirer in the SAME process distinguish "held by
    * a live stream → refuse" from "held by a query that already
    * terminated → crash-stale, reclaim" without sleeping on listener
    * callbacks.
    */
  private val live =
    new java.util.concurrent.ConcurrentHashMap[String, (String, () => Boolean)]
  private val tokenCounter = new java.util.concurrent.atomic.AtomicLong(0L)

  private def leasePathOf(table: ParquetTable): Path =
    new Path(table.path, LeaseFile)
  private def fsOf(table: ParquetTable): FileSystem =
    new Path(table.path).getFileSystem(
      table.spark.sparkContext.hadoopConfiguration)
  private def localHost: String =
    try java.net.InetAddress.getLocalHost.getHostName
    catch { case _: java.net.UnknownHostException => "localhost" }

  private[sources] def readInfo(fs: FileSystem,
      p: Path): Option[Map[String, String]] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      Some(text.linesIterator.filter(_.contains("=")).map { l =>
        val i = l.indexOf('='); l.substring(0, i) -> l.substring(i + 1)
      }.toMap)
    }

  /** Bind an aliveness probe to a held lease (streams call this right
    * after `start()` with `() => query.isActive`). Until bound, the
    * holder is presumed alive.
    */
  def bind(lease: TableLease, alive: () => Boolean): Unit =
    live.put(lease.leasePath.toString, (lease.token, alive)): Unit

  private def unregister(p: Path): Unit = live.remove(p.toString): Unit

  /** Take the table's lease or throw `IllegalStateException` naming
    * the current holder. Stale leases (terminated same-process holder,
    * dead same-host pid) are reclaimed automatically; a different-host
    * holder always refuses — see the class doc and [[break]].
    */
  def acquire(table: ParquetTable, owner: String): TableLease = {
    val fs = fsOf(table)
    val p = leasePathOf(table)
    val token =
      s"${ProcessHandle.current().pid()}-${tokenCounter.incrementAndGet()}-" +
        java.util.UUID.randomUUID().toString.take(8)
    var attempt = 0
    while (attempt < 3) {
      attempt += 1
      val existing = readInfo(fs, p)
      existing match {
        case None =>
          try {
            val out = fs.create(p, false) // create-if-absent: the lock PUT
            try out.write(
              (s"token=$token\nowner=$owner\n" +
                s"pid=${ProcessHandle.current().pid()}\nhost=$localHost\n" +
                s"epoch=${System.currentTimeMillis()}\n").getBytes("UTF-8"))
            finally out.close()
            // read-back guard: two same-instant creators on a store
            // whose create-if-absent is last-writer-wins resolve to
            // whoever's content survived
            if (readInfo(fs, p).exists(_.get("token").contains(token))) {
              // presumed alive until bind() wires the real probe —
              // without this, a same-process second acquire would
              // mistake an unbound holder's own pid for a stale lease
              live.put(p.toString, (token, () => true))
              return new TableLease(p, fs, token, table.path)
            }
          } catch {
            case _: org.apache.hadoop.fs.FileAlreadyExistsException => ()
            case _: java.io.IOException => () // racing creator won
          }
        case Some(info) =>
          val hToken = info.getOrElse("token", "?")
          val hOwner = info.getOrElse("owner", "?")
          val hPid = info.get("pid").flatMap(_.toLongOption)
          val hHost = info.getOrElse("host", "?")
          val registered = Option(live.get(p.toString))
          val stale = registered match {
            case Some((tok, aliveFn)) if tok == hToken => !aliveFn()
            case _ =>
              if (hHost != localHost) false // cannot probe across hosts
              else hPid match {
                case Some(pid) if pid == ProcessHandle.current().pid() =>
                  // our own pid but no registry entry: the holder
                  // object is unreachable (e.g. a previous classloader
                  // in the same JVM) — nothing can ever release it
                  true
                case Some(pid) =>
                  !ProcessHandle.of(pid).map[Boolean](_.isAlive).orElse(false)
                case None => false
              }
          }
          if (stale) { unregister(p); fs.delete(p, false): Unit }
          else throw new IllegalStateException(
            s"table ${table.path} is lease-held by owner '$hOwner' " +
              s"(pid $hPid on $hHost, token $hToken) — a second writer " +
              "would interleave with a live stream or maintenance op; " +
              "if the holder is known dead on another host, " +
              "TableLease.break(table) reclaims it")
      }
    }
    throw new IllegalStateException(
      s"could not acquire lease on ${table.path} after $attempt attempts " +
        "(create-if-absent kept losing races)")
  }

  /** Forcibly delete the lease file — the manual reclaim for a holder
    * the automatic staleness rules cannot probe (dead process on
    * another host). Verifying the holder is actually gone is the
    * caller's responsibility.
    */
  def break(table: ParquetTable): Unit = {
    val p = leasePathOf(table)
    unregister(p)
    fsOf(table).delete(p, false): Unit
  }

  /** The current holder's recorded fields, if any (for diagnostics). */
  def holder(table: ParquetTable): Option[Map[String, String]] =
    readInfo(fsOf(table), leasePathOf(table))

  /** Run `f` holding the table's lease, releasing on every exit — the
    * maintenance-op critical section.
    */
  def withLease[A](table: ParquetTable, owner: String)(f: => A): A = {
    val l = acquire(table, owner)
    try f finally l.release()
  }
}
