package graft.util

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo for pinned prework — the shared mechanism
  * behind [[graft.ops.GraphFrameLite.cached]],
  * [[graft.ops.LangId.profilesCached]], and the dedup candidate/
  * survivor caches: `build` runs at most once per (SparkContext, key),
  * keyed on the application id so a NEW context (whose pinned RDD
  * blocks died with the old one) never reads a stale entry, and
  * entries from stopped contexts are dropped on every access so a JVM
  * cycling sessions (test suites, long-lived drivers) cannot
  * accumulate dead references.
  *
  * Soundness contract, same as every caller documents: the value
  * `build` produces must be a pure function of `key` over IMMUTABLE
  * source data — that is what makes serving it to a later query
  * correct. Callers pin what they build (`Pin.cut`) so reuse reads
  * materialized blocks instead of replaying lineage.
  *
  * '''Memory governance.''' Pinned prework competes with shuffle and
  * execution memory, so residency is a CONTRACT here, not a
  * convention:
  *
  *  - every build logs its measured pinned bytes and the cache's
  *    running total ([[residency]] re-measures live at any time —
  *    local-checkpoint blocks from the storage manager, reliable
  *    checkpoints from their files);
  *  - [[release]]/[[releaseAll]] retire an entry's blocks through
  *    [[Pin.retire]] (values expose their cuts either by BEING a
  *    pinned DataFrame or via [[SessionCache.PinnedArtifact]]);
  *  - an optional byte budget (`spark.graft.sessionCache.maxBytes`,
  *    session conf) turns the log into a policy: if the new artifact
  *    ALONE exceeds the budget it is REFUSED up front — returned to
  *    the caller unmanaged and not retained (so the next lookup
  *    rebuilds rather than silently squatting on executor memory) and
  *    NO other entry is touched; otherwise the least-recently-USED
  *    other entries are evicted (released) until the total fits.
  *
  * '''Eviction vs in-flight queries.''' An evicted entry's
  * `localCheckpoint` blocks are unpersisted ([[Pin.retire]]), and a
  * local-checkpointed RDD cannot recompute lost blocks — so evicting
  * a frame another thread obtained moments ago and is still reading
  * would fail that thread's job mid-action. Eviction therefore
  * SKIPS any entry obtained within the grace window
  * (`spark.graft.sessionCache.graceMs`, default 30000): every
  * [[cached]] access — hit or build — stamps the entry's wall clock,
  * so a frame a concurrent page just obtained is not pulled out
  * from under it while its grace holds — a NARROWING of the
  * check-then-act race, not an elimination (the action runs outside
  * the cache's monitor, so an action slower than the grace window
  * can still lose blocks and must retry; see govern()'s eviction
  * loop). The budget may consequently be exceeded
  * transiently (logged loudly) until grace lapses; the residual
  * contract is the read-through discipline every caller here
  * follows — artifacts are re-obtained via [[cached]] per use, and a
  * single use must complete within the grace window, or the frame
  * may lose blocks mid-job and the query must retry via [[cached]].
  */
object SessionCache {

  /** Implemented by cached values that are not themselves DataFrames
    * but own pinned cuts (e.g. [[graft.ops.GraphFrameLite]]'s lazy
    * canonical/symmetric/degree frames): exposes the cuts forced SO
    * FAR, for byte accounting and release. Must never force an
    * unbuilt lazy member.
    */
  trait PinnedArtifact { def pinnedFrames: Seq[DataFrame] }

  /** Lazy cell so the EXPENSIVE build runs at most once even when two
    * threads race the first access: a losing un-forced Cell is a
    * discarded closure — nothing was computed or pinned — while the
    * winning cell's `lazy val` synchronizes every reader onto one
    * build (racing an eager value here would leak the loser's pinned
    * blocks for the app lifetime).
    */
  private final class Cell(build: () => AnyRef) {
    @volatile var built = false
    @volatile var lastUsed = 0L
    @volatile var lastUsedNanos = 0L // wall clock of last access, for grace
    lazy val value: AnyRef = { val v = build(); built = true; v }
  }

  private val cache =
    scala.collection.concurrent.TrieMap[(String, String), Cell]()
  private val ticks = new AtomicLong()

  /** `spark.graft.sessionCache=off` (session conf) bypasses every
    * cached wrapper: callers fall back to their RAW un-pinned form.
    * The plan-contract sweep uses this — a pinned frame's plan is a
    * bare LogicalRDD scan, which would hide the operator's declared
    * topology from the no-cartesian audit.
    */
  def enabled(spark: SparkSession): Boolean =
    spark.conf.get("spark.graft.sessionCache", "on") != "off"

  /** Session conf holding the optional pinned-bytes budget. */
  val MaxBytesKey = "spark.graft.sessionCache.maxBytes"

  /** Session conf: eviction grace window in milliseconds — an entry
    * accessed within it is never evicted for budget (class doc).
    */
  val GraceMsKey = "spark.graft.sessionCache.graceMs"

  def cached[T <: AnyRef](spark: SparkSession, key: String)(build: => T): T = {
    val appId = spark.sparkContext.applicationId
    cache.keys.iterator.filter(_._1 != appId).foreach(cache.remove)
    val k = (appId, key)
    cache.get(k) match {
      case Some(c) =>
        c.lastUsed = ticks.incrementAndGet()
        c.lastUsedNanos = System.nanoTime()
        c.value.asInstanceOf[T]
      case None =>
        val cell = new Cell(() => build)
        cell.lastUsed = ticks.incrementAndGet()
        cell.lastUsedNanos = System.nanoTime()
        val winner = cache.putIfAbsent(k, cell).getOrElse(cell)
        winner.lastUsedNanos = System.nanoTime()
        val v = winner.value.asInstanceOf[T]
        if (winner eq cell) govern(spark, k, cell)
        v
    }
  }

  /** Live pinned bytes per key for the CURRENT context (unbuilt cells
    * report nothing; values without measurable pins report 0).
    */
  def residency(spark: SparkSession): Map[String, Long] = {
    val appId = spark.sparkContext.applicationId
    cache.toSeq.collect {
      case ((a, key), cell) if a == appId && cell.built =>
        key -> bytesOf(spark, cell.value)
    }.toMap
  }

  /** Retire one entry's pinned blocks ([[Pin.retire]]) and forget it;
    * false when no such entry. The caller declares the artifact dead —
    * no live frame may still read it (the [[Pin.retire]] contract).
    */
  def release(spark: SparkSession, key: String): Boolean = synchronized {
    val k = (spark.sparkContext.applicationId, key)
    cache.get(k) match {
      case Some(cell) => releaseEntry(spark, k, cell); true
      case None => false
    }
  }

  /** [[release]] every entry of the current context. */
  def releaseAll(spark: SparkSession): Unit = synchronized {
    val appId = spark.sparkContext.applicationId
    cache.toSeq.foreach { case (k, cell) =>
      if (k._1 == appId) releaseEntry(spark, k, cell)
    }
  }

  /** Measured pinned bytes of the entry, then remove + retire it. */
  private def releaseEntry(spark: SparkSession, k: (String, String),
      cell: Cell): Long = {
    cache.remove(k)
    if (!cell.built) 0L
    else {
      val b = bytesOf(spark, cell.value)
      cell.value match {
        case df: DataFrame => Pin.retire(df)
        case a: PinnedArtifact => a.pinnedFrames.foreach(Pin.retire)
        case _ => () // plain driver-side value: GC reclaims it
      }
      b
    }
  }

  /** Post-build accounting + budget policy (see class doc). */
  private def govern(spark: SparkSession, k: (String, String),
      cell: Cell): Unit = synchronized {
    val own = bytesOf(spark, cell.value)
    val others = cache.toSeq
      .filter { case (ok, _) => ok._1 == k._1 && ok != k }
    val total = own + others.map { case (_, c) =>
      if (c.built) bytesOf(spark, c.value) else 0L }.sum
    System.err.println(s"[graft] sessionCache +'${k._2}': ~$own bytes " +
      s"pinned (total ~$total across ${others.size + 1} entries)")
    spark.conf.getOption(MaxBytesKey).map(_.toLong).foreach { budget =>
      if (own > budget) {
        // the new artifact ALONE exceeds the budget: refuse to RETAIN
        // it — up front, without evicting anything else (flushing the
        // warm cache could not make it fit anyway). The value is still
        // returned (the caller holds it and may Pin.retire it), but
        // the cache will not squat on its blocks — the next lookup
        // rebuilds.
        cache.remove(k)
        System.err.println(s"[graft] sessionCache REFUSED '${k._2}': " +
          s"~$own bytes exceeds the $budget-byte budget alone; returned " +
          "unmanaged, not retained")
      } else {
        val graceNanos =
          spark.conf.get(GraceMsKey, "30000").toLong * 1000000L
        val now = System.nanoTime()
        var t = total
        for ((ok, oc) <- others.sortBy(_._2.lastUsed) if t > budget) {
          if (now - oc.lastUsedNanos < graceNanos) {
            // obtained within the grace window: a concurrent query may
            // be mid-action on its localCheckpoint blocks — don't pull
            // them out from under it (class doc). RESIDUAL RACE, by
            // design: the stamp is read here, the action runs OUTSIDE
            // this monitor — a query that obtained the entry can still
            // be mid-action when its grace lapses at a later govern()
            // pass (or can obtain it between this read and the release
            // below). The grace window NARROWS the hazard to
            // actions slower than graceMs, it does not close it; a
            // query that loses its blocks recomputes from lineage
            // (correctness is never at stake — only the wasted work).
            System.err.println(s"[graft] sessionCache kept '${ok._2}' " +
              "despite budget pressure: accessed within the " +
              s"grace window (${graceNanos / 1000000L} ms)")
          } else {
            val freed = releaseEntry(spark, ok, oc)
            t -= freed
            System.err.println(s"[graft] sessionCache evicted '${ok._2}' " +
              s"(~$freed bytes) for the $budget-byte budget")
          }
        }
        if (t > budget) {
          System.err.println(s"[graft] sessionCache OVER BUDGET: ~$t " +
            s"bytes pinned vs $budget allowed — grace-protected entries " +
            "kept; pressure resolves when their grace lapses")
        }
      }
    }
  }

  /** Live pinned bytes of a cached value: a cut DataFrame's blocks
    * from the storage manager (or its reliable-checkpoint files), a
    * [[PinnedArtifact]]'s forced cuts summed, anything else via the
    * driver-side size estimator.
    */
  private def bytesOf(spark: SparkSession, v: AnyRef): Long = v match {
    case df: DataFrame => frameBytes(spark, df)
    case a: PinnedArtifact => a.pinnedFrames.map(frameBytes(spark, _)).sum
    case other => org.apache.spark.util.SizeEstimator.estimate(other)
  }

  private def frameBytes(spark: SparkSession, df: DataFrame): Long =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        val id = l.rdd.id
        spark.sparkContext.getRDDStorageInfo.find(_.id == id)
          .map(i => i.memSize + i.diskSize)
          .orElse(l.rdd.getCheckpointFile.map { p =>
            val path = new org.apache.hadoop.fs.Path(p)
            path.getFileSystem(spark.sparkContext.hadoopConfiguration)
              .getContentSummary(path).getLength
          })
          .getOrElse(0L)
      case _ => 0L // derived or never-cut frame: no blocks of its own
    }
}
