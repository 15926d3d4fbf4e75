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
/** Executor-side gate for the grace-window test: lives at top level so
  * the task closure resolves it statically instead of capturing the
  * (non-serializable) test instance. local[n] only — one JVM.
  */
object GraceGate {
  @volatile var latch: java.util.concurrent.CountDownLatch = _
  val slowPartition: Iterator[Long] => Iterator[Long] = { it =>
    latch.countDown(); Thread.sleep(300); it
  }
}

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
    // least recently used), keep B, and A must rebuild on re-request.
    // graceMs=0 so eviction is deterministic here (A was accessed
    // milliseconds ago; the in-flight grace guard has its own test).
    spark.conf.set(SessionCache.MaxBytesKey, (bytesA * 3 / 2).toString)
    spark.conf.set(SessionCache.GraceMsKey, "0")
    try {
      get(kB)
      assert(!SessionCache.residency(spark).contains(kA), "A evicted")
      assert(SessionCache.residency(spark).contains(kB), "B retained")
      get(kA)
      assert(builds.get() === 3, "evicted A rebuilt")
      // an artifact that ALONE exceeds the budget is refused UP FRONT:
      // returned but not retained (every lookup rebuilds) — and the
      // refusal must NOT collaterally flush the entries that fit
      spark.conf.set(SessionCache.MaxBytesKey, "1")
      val warmBefore = SessionCache.residency(spark).keySet
      get(kC); get(kC)
      assert(builds.get() === 5, "refused entry is never retained")
      assert(!SessionCache.residency(spark).contains(kC))
      assert(SessionCache.residency(spark).keySet === warmBefore,
        "refusing an oversized artifact must not evict the warm cache " +
          "(eviction could never make it fit)")
    } finally {
      spark.conf.unset(SessionCache.MaxBytesKey)
      spark.conf.unset(SessionCache.GraceMsKey)
      SessionCache.releaseAll(spark)
      assert(SessionCache.residency(spark).isEmpty)
    }
  }

  test("grace window: budget eviction never severs a frame a concurrent " +
      "query just obtained") {
    import org.apache.spark.sql.DataFrame
    val tag = System.nanoTime()
    def pinned(key: String): DataFrame =
      SessionCache.cached[DataFrame](spark, key) {
        spark.range(20000).toDF("n").localCheckpoint(true)
      }
    val kA = s"spec-grace-a-$tag"; val kB = s"spec-grace-b-$tag"
    val dfA = pinned(kA)
    val bytesA = SessionCache.residency(spark)(kA)
    // budget admits only ~one entry; a 60 s grace covers the whole test
    spark.conf.set(SessionCache.MaxBytesKey, (bytesA * 3 / 2).toString)
    spark.conf.set(SessionCache.GraceMsKey, "60000")
    val pool = Executors.newFixedThreadPool(2)
    GraceGate.latch = new CountDownLatch(1)
    try {
      // thread 1: a slow action over A — each partition sleeps, so the
      // job is mid-flight while thread 2 applies budget pressure (the
      // gate lives in a top-level object so the task closure captures
      // nothing non-serializable)
      val slowCount = pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = {
          val df = pinned(kA)
          import spark.implicits._
          df.as[Long].mapPartitions(GraceGate.slowPartition).count()
        }
      })
      GraceGate.latch.await(30, TimeUnit.SECONDS)
      // thread 2 (this one): building B pushes the total past budget;
      // A is within grace so it must be KEPT, not evicted — otherwise
      // thread 1's localCheckpointed RDD loses blocks mid-job
      pinned(kB)
      assert(SessionCache.residency(spark).contains(kA),
        "grace-protected entry survived budget pressure")
      assert(slowCount.get(60, TimeUnit.SECONDS) === 20000L,
        "in-flight query over the pinned frame completed")
      // sanity: dfA itself still readable (blocks intact)
      assert(dfA.count() === 20000L)
    } finally {
      pool.shutdownNow()
      spark.conf.unset(SessionCache.MaxBytesKey)
      spark.conf.unset(SessionCache.GraceMsKey)
      SessionCache.releaseAll(spark)
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
