package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.util.SessionCache

/** The session-scoped prework memo every `*Cached` operator rides on
  * (GraphFrameLite, LangId profiles, dedup candidate/survivor tables):
  * build-at-most-once is what makes pinning prework SAFE — a second
  * build under a racing first access would leak a second pinned copy
  * for the application lifetime. The race test pins the lazy-Cell
  * fix: TrieMap.getOrElseUpdate may evaluate its default more than
  * once, but only the winning cell's build may ever run.
  */
class SessionCacheSpec extends AnyFunSuite {
  import TestSpark._

  test("same (session, key) builds once and serves the same instance") {
    val builds = new AtomicInteger(0)
    val key = s"spec-memo-${System.nanoTime()}"
    def get(): AnyRef = SessionCache.cached[AnyRef](spark, key) {
      builds.incrementAndGet(); new Object
    }
    val first = get()
    assert(get() eq first)
    assert(builds.get() === 1)
  }

  test("distinct keys build independently") {
    val builds = new AtomicInteger(0)
    val tag = System.nanoTime()
    val a = SessionCache.cached[AnyRef](spark, s"spec-a-$tag") {
      builds.incrementAndGet(); new Object
    }
    val b = SessionCache.cached[AnyRef](spark, s"spec-b-$tag") {
      builds.incrementAndGet(); new Object
    }
    assert(!(a eq b))
    assert(builds.get() === 2)
  }

  test("16 threads racing the first access run exactly one build") {
    val builds = new AtomicInteger(0)
    val key = s"spec-race-${System.nanoTime()}"
    val n = 16
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(n)
    try {
      val futures = (1 to n).map { _ =>
        pool.submit(new java.util.concurrent.Callable[AnyRef] {
          def call(): AnyRef = {
            start.await()
            SessionCache.cached[AnyRef](spark, key) {
              builds.incrementAndGet()
              Thread.sleep(20) // widen the window a losing build would hit
              new Object
            }
          }
        })
      }
      start.countDown()
      val got = futures.map(_.get(30, TimeUnit.SECONDS))
      assert(builds.get() === 1)
      assert(got.forall(_ eq got.head))
    } finally pool.shutdownNow()
  }

  test("release retires a pinned entry's blocks and the next lookup rebuilds") {
    val builds = new AtomicInteger(0)
    val key = s"spec-rel-${System.nanoTime()}"
    def get() = SessionCache.cached[org.apache.spark.sql.DataFrame](spark, key) {
      builds.incrementAndGet()
      spark.range(20000).toDF("n").localCheckpoint(true)
    }
    val df = get()
    val rddId = df.queryExecution.analyzed
      .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD].rdd.id
    // residency measures the LIVE pinned blocks
    assert(SessionCache.residency(spark).getOrElse(key, 0L) > 0L)
    assert(spark.sparkContext.getPersistentRDDs.contains(rddId))
    assert(SessionCache.release(spark, key))
    assert(!SessionCache.release(spark, key), "second release: no entry")
    assert(!SessionCache.residency(spark).contains(key))
    assert(!spark.sparkContext.getPersistentRDDs.contains(rddId),
      "release must retire the blocks, not just forget the key")
    get()
    assert(builds.get() === 2, "released key rebuilds on next lookup")
    assert(SessionCache.release(spark, key))
  }

  test("maxBytes budget: LRU eviction makes room; an oversized artifact is refused") {
    val tag = System.nanoTime()
    val builds = new AtomicInteger(0)
    def get(key: String) = SessionCache.cached[org.apache.spark.sql.DataFrame](
        spark, key) {
      builds.incrementAndGet()
      spark.range(20000).toDF("n").localCheckpoint(true)
    }
    val kA = s"spec-gov-a-$tag"; val kB = s"spec-gov-b-$tag"
    val kC = s"spec-gov-c-$tag"
    get(kA)
    val bytesA = SessionCache.residency(spark)(kA)
    assert(bytesA > 0L)
    // budget fits ~1.5 same-sized entries: adding B must evict A (the
    // least recently used), keep B, and A must rebuild on re-request
    spark.conf.set(SessionCache.MaxBytesKey, (bytesA * 3 / 2).toString)
    try {
      get(kB)
      assert(!SessionCache.residency(spark).contains(kA), "A evicted")
      assert(SessionCache.residency(spark).contains(kB), "B retained")
      get(kA)
      assert(builds.get() === 3, "evicted A rebuilt")
      // an artifact that ALONE exceeds the budget is refused: returned
      // but not retained, so every lookup rebuilds
      spark.conf.set(SessionCache.MaxBytesKey, "1")
      get(kC); get(kC)
      assert(builds.get() === 5, "refused entry is never retained")
      assert(!SessionCache.residency(spark).contains(kC))
    } finally {
      spark.conf.unset(SessionCache.MaxBytesKey)
      SessionCache.releaseAll(spark)
      assert(SessionCache.residency(spark).isEmpty)
    }
  }

  test("the off-switch reads the session conf, not the shared context") {
    assert(SessionCache.enabled(spark))
    val alt = spark.newSession()
    alt.conf.set("spark.graft.sessionCache", "off")
    try {
      assert(!SessionCache.enabled(alt))
      assert(SessionCache.enabled(spark)) // sibling session unaffected
    } finally alt.conf.unset("spark.graft.sessionCache")
  }
}
