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
  private val cache =
    scala.collection.concurrent.TrieMap[(String, String), AnyRef]()

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
    cache.getOrElseUpdate((appId, key), build).asInstanceOf[T]
  }
}
