package graft.util

import org.apache.spark.sql.SparkSession

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
  */
object SessionCache {
  /** Lazy cell so the EXPENSIVE build runs at most once even when two
    * threads race the first access: TrieMap.getOrElseUpdate may
    * evaluate its default twice, but a losing un-forced Cell is a
    * discarded closure — nothing was computed or pinned — while the
    * winning cell's `lazy val` synchronizes every reader onto one
    * build (racing an eager value here would leak the loser's pinned
    * blocks for the app lifetime).
    */
  private final class Cell(build: () => AnyRef) {
    lazy val value: AnyRef = build()
  }

  private val cache =
    scala.collection.concurrent.TrieMap[(String, String), Cell]()

  /** `spark.graft.sessionCache=off` (session conf) bypasses every
    * cached wrapper: callers fall back to their RAW un-pinned form.
    * The plan-contract sweep uses this — a pinned frame's plan is a
    * bare LogicalRDD scan, which would hide the operator's declared
    * topology from the no-cartesian audit.
    */
  def enabled(spark: SparkSession): Boolean =
    spark.conf.get("spark.graft.sessionCache", "on") != "off"

  def cached[T <: AnyRef](spark: SparkSession, key: String)(build: => T): T = {
    val appId = spark.sparkContext.applicationId
    cache.keys.iterator.filter(_._1 != appId).foreach(cache.remove)
    cache.getOrElseUpdate((appId, key), new Cell(() => build))
      .value.asInstanceOf[T]
  }
}
