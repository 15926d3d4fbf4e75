package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SketchAgg
import graft.ops.Sketch

/** The aggregate-function sketch surface: per-group states in one
  * pass, bit-parity with the relational table ops, and the
  * merge-equivalence property (slice → sketch → merge ≡ one pass)
  * at the AGGREGATE level — the datasketches-style lifecycle a
  * per-source 100 TB report runs on stored per-day states.
  */
class SketchAggSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val P = 8
  private def keys = (1 to 2000).map(i => (s"k${i % 700}", s"s${i % 5}"))
    .toDF("k", "src")

  test("hll_sketch_agg state matches the relational hllRegisters bit-for-bit") {
    val state = keys.agg(SketchAgg.hllSketch(col("k"), P).as("st"))
      .head().getAs[Array[Byte]]("st")
    val rel = Sketch.hllRegisters(keys, "k", P)
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1).toInt).toMap
    assert(state.length === (1 << P))
    state.zipWithIndex.foreach { case (rho, reg) =>
      assert((rho & 0xff) === rel.getOrElse(reg, 0),
        s"register $reg: agg ${rho & 0xff} vs relational ${rel.getOrElse(reg, 0)}")
    }
  }

  test("hllReportOf a state reproduces the relational hllReport row") {
    val got = keys.agg(SketchAgg.hllSketch(col("k"), P).as("st"))
      .select(SketchAgg.hllReportOf(col("st"), P).as("r"))
      .select("r.m", "r.n_nonzero", "r.sum_q", "r.est").head()
    val want = Sketch.hllReport(keys, "k", P)
      .select("m", "n_nonzero", "sum_q", "est").head()
    assert(got === want)
  }

  test("hllReportOf with a mismatched p fails loudly, never mis-estimates") {
    // a p=10 state reported with the default p=8 would scale the
    // harmonic sum by the wrong alpha*m^2 — the report must reject a
    // state whose register count contradicts p (cmEstimate's shape
    // guard, mirrored)
    val st = keys.agg(SketchAgg.hllSketch(col("k"), 10).as("st"))
    val e = intercept[Exception] {
      st.select(SketchAgg.hllReportOf(col("st"), 8).as("r")).select("r.est").head()
    }
    def chain(t: Throwable): Seq[Throwable] =
      t +: Option(t.getCause).toSeq.flatMap(chain)
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).map(t => String.valueOf(t.getMessage)).mkString("|")
        .contains("different p"),
      s"expected the p-mismatch guard, got: $e")
  }

  test("merge-equivalence: per-slice HLL states merged == one-pass state") {
    val whole = keys.agg(SketchAgg.hllSketch(col("k"), P).as("st"))
      .head().getAs[Array[Byte]]("st")
    val merged = keys
      .groupBy(col("src")).agg(SketchAgg.hllSketch(col("k"), P).as("st"))
      .agg(SketchAgg.hllMerge(col("st"), P).as("st"))
      .head().getAs[Array[Byte]]("st")
    assert(merged.toSeq === whole.toSeq)
  }

  test("cm_sketch_agg state matches the relational countMinTable cell-for-cell") {
    val D = 4; val W = 256
    val state = keys.agg(SketchAgg.cmSketch(col("k"), D, W).as("st"))
      .head() match { case r => r.getSeq[Long](r.fieldIndex("st")) }
    val rel = Sketch.countMinTable(keys, "k", D, W)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(state.size === D * W)
    for (i <- 0 until D; c <- 0 until W)
      assert(state(i * W + c) === rel.getOrElse((i.toLong, c.toLong), 0L),
        s"cell ($i,$c)")
  }

  test("merge-equivalence: per-slice CM states merged == one-pass state") {
    val D = 4; val W = 256
    val whole = keys.agg(SketchAgg.cmSketch(col("k"), D, W).as("st"))
      .head() match { case r => r.getSeq[Long](r.fieldIndex("st")) }
    val merged = keys
      .groupBy(col("src")).agg(SketchAgg.cmSketch(col("k"), D, W).as("st"))
      .agg(SketchAgg.cmMerge(col("st"), D, W).as("st"))
      .head() match { case r => r.getSeq[Long](r.fieldIndex("st")) }
    assert(merged === whole)
  }

  test("cmEstimateOf never undershoots the exact count") {
    val D = 4; val W = 64 // narrow on purpose: collisions guaranteed
    val st = keys.agg(SketchAgg.cmSketch(col("k"), D, W).as("st"))
    val exact = keys.groupBy("k").count()
    val audit = exact.crossJoin(broadcast(st))
      .select(col("k"), col("count"),
        SketchAgg.cmEstimateOf(col("st"), col("k"), D, W).as("est"))
      .collect()
    assert(audit.nonEmpty)
    audit.foreach(r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("count"), s"undershoot at $r"))
  }

  test("one pass, many groups: GROUP BY source yields a state per group") {
    val per = keys.groupBy("src").agg(SketchAgg.hllSketch(col("k"), P).as("st"))
    assert(per.count() === 5)
    // each group's state audits against the relational path on its slice
    val s0 = per.filter(col("src") === "s0").head().getAs[Array[Byte]]("st")
    val rel = Sketch.hllRegisters(keys.filter(col("src") === "s0"), "k", P)
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1).toInt).toMap
    s0.zipWithIndex.foreach { case (rho, reg) =>
      assert((rho & 0xff) === rel.getOrElse(reg, 0))
    }
  }

  test("SQL surface: registered aggregates run in spark.sql") {
    SketchAgg.registerSql(spark)
    keys.createOrReplaceTempView("ska_t")
    val viaSql = spark.sql(
      """SELECT src, hll_sketch_agg(k, 8) AS st, cm_sketch_agg(k, 4, 256) AS cst
        |FROM ska_t GROUP BY src""".stripMargin)
    assert(viaSql.count() === 5)
    viaSql.createOrReplaceTempView("ska_states")
    val merged = spark.sql(
      """SELECT hll_merge_agg(st, 8) AS st, cm_merge_agg(cst, 4, 256) AS cst
        |FROM ska_states""".stripMargin).head()
    val whole = keys.agg(SketchAgg.hllSketch(col("k"), P).as("st"),
      SketchAgg.cmSketch(col("k"), 4, 256).as("cst")).head()
    assert(merged.getAs[Array[Byte]]("st").toSeq ===
      whole.getAs[Array[Byte]]("st").toSeq)
    assert(merged.getSeq[Long](merged.fieldIndex("cst")) === whole.getSeq[Long](whole.fieldIndex("cst")))
    // scalar estimator also reachable from SQL, over the merged state
    val est = spark.sql(
      "SELECT cm_state_est(cm_merge_agg(cst, 4, 256), 'k1', 4, 256) AS e " +
        "FROM ska_states").head().getLong(0)
    val exact = keys.filter(col("k") === "k1").count()
    assert(est >= exact && exact > 0)
    // the HLL report reads a merged state from SQL and agrees with the
    // relational report over the whole input
    val rep = spark.sql(
      "SELECT hll_state_report(hll_merge_agg(st, 8), 8) AS r FROM ska_states")
      .select("r.m", "r.n_nonzero", "r.sum_q", "r.est").head()
    val want = Sketch.hllReport(keys, "k", P)
      .select("m", "n_nonzero", "sum_q", "est").head()
    assert(rep === want)
  }

  test("streaming: per-group sketch states accumulate across micro-batches") {
    // the aggregate lifecycle under Structured Streaming: two file
    // micro-batches, complete-mode groupBy — the final per-source
    // state must equal the batch state over the union, i.e. stream
    // restarts/increments never change the sketch (mergeability is
    // exactly what makes the sketch streamable)
    val dir = java.nio.file.Files.createTempDirectory("graft-ska-stream").toString
    val half1 = keys.filter(xxhash64(col("k")) % 2 === 0)
    val half2 = keys.filter(xxhash64(col("k")) % 2 =!= 0)
    half1.write.parquet(dir + "/f1")
    half2.write.parquet(dir + "/f2")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ska-ckpt").toString
    val q = spark.readStream.schema(keys.schema).parquet(dir + "/*")
      .groupBy(col("src")).agg(SketchAgg.hllSketch(col("k"), P).as("st"))
      .writeStream.outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("memory").queryName("ska_stream_out").start()
    q.awaitTermination(60000)
    val streamed = spark.table("ska_stream_out").collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]]("st").toSeq).toMap
    val batch = keys.groupBy(col("src"))
      .agg(SketchAgg.hllSketch(col("k"), P).as("st")).collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]]("st").toSeq).toMap
    assert(streamed === batch)
  }

  test("bloom state sets exactly the k salted-hex60 bits of each key") {
    val M = 1024; val K = 3
    val state = keys.agg(SketchAgg.bloomSketch(col("k"), M, K).as("st"))
      .head().getAs[Array[Byte]]("st")
    assert(state.length === M / 8)
    // relational replay of every bit position (the oracle's view)
    val want = keys.select(col("k")).distinct().collect().map(_.getString(0))
      .flatMap(k => (0 until K).map(i =>
        (graft.functions.Kernels.hex60String(s"bl$i:$k") % M).toInt))
      .toSet
    val got = (0 until M).filter(b => (state(b >>> 3) & (1 << (b & 7))) != 0).toSet
    assert(got === want)
  }

  test("bloomContainsOf: no false negatives ever; FPs exist at a narrow m") {
    // m chosen so the filter is PARTIALLY filled: 700 keys x 3 hashes
    // into 2048 bits gives fill ~= 1-e^(-2100/2048) ~= 0.64, so the
    // false-positive rate is fill^3 ~= 0.26 — FPs certainly exist over
    // 500 probes, but nowhere near all of them collide. (At m=256 the
    // filter saturates and EVERY absent probe collides — that regime
    // can only witness the no-false-negative half.)
    val M = 2048; val K = 3
    val st = keys.agg(SketchAgg.bloomSketch(col("k"), M, K).as("st"))
    val members = keys.select(col("k")).distinct()
      .crossJoin(broadcast(st))
      .select(SketchAgg.bloomContainsOf(col("st"), col("k"), M, K).as("hit"))
      .collect()
    assert(members.nonEmpty && members.forall(_.getBoolean(0)),
      "a member probed absent — bloom false negative")
    val absent = (1 to 500).map(i => s"absent$i").toDF("k")
      .crossJoin(broadcast(st))
      .select(SketchAgg.bloomContainsOf(col("st"), col("k"), M, K).as("hit"))
      .collect().count(_.getBoolean(0))
    assert(absent > 0, "a 64%-full 3-hash filter must collide over 500 probes")
    assert(absent < 500, "not everything may collide")
  }

  test("merge-equivalence: per-slice bloom states ORed == one-pass state") {
    val M = 1024
    val whole = keys.agg(SketchAgg.bloomSketch(col("k"), M, 3).as("st"))
      .head().getAs[Array[Byte]]("st")
    val merged = keys
      .groupBy(col("src")).agg(SketchAgg.bloomSketch(col("k"), M, 3).as("st"))
      .agg(SketchAgg.bloomMerge(col("st"), M).as("st"))
      .head().getAs[Array[Byte]]("st")
    assert(merged.toSeq === whole.toSeq)
  }

  test("bloom shape guards: wrong-m probe/report/merge fail loudly") {
    val st = keys.agg(SketchAgg.bloomSketch(col("k"), 1024, 3).as("st"))
    def chain(t: Throwable): Seq[Throwable] =
      t +: Option(t.getCause).toSeq.flatMap(chain)
    def msg(e: Throwable) =
      chain(e).map(t => String.valueOf(t.getMessage)).mkString("|")
    val e1 = intercept[Exception] {
      st.select(SketchAgg.bloomContainsOf(col("st"), lit("x"), 2048, 3)).head()
    }
    assert(msg(e1).contains("different m"), s"probe guard: $e1")
    val e2 = intercept[Exception] {
      st.select(SketchAgg.bloomReportOf(col("st"), 2048)).head()
    }
    assert(msg(e2).contains("different m"), s"report guard: $e2")
    val e3 = intercept[Exception] {
      st.agg(SketchAgg.bloomMerge(col("st"), 2048)).head()
    }
    assert(msg(e3).contains("different m"), s"merge guard: $e3")
  }

  test("bloomReportOf counts set bits integer-exactly") {
    val M = 1024
    val r = keys.agg(SketchAgg.bloomSketch(col("k"), M, 3).as("st"))
      .select(SketchAgg.bloomReportOf(col("st"), M).as("r"))
      .select("r.m", "r.n_set", "r.fill_ppm").head()
    val nset = keys.select(col("k")).distinct().collect().map(_.getString(0))
      .flatMap(k => (0 until 3).map(i =>
        graft.functions.Kernels.hex60String(s"bl$i:$k") % M)).toSet.size
    assert(r.getLong(0) === M.toLong)
    assert(r.getLong(1) === nset.toLong)
    assert(r.getLong(2) === nset.toLong * 1000000L / M)
  }

  test("SQL surface: bloom aggregates, probe, and report run in spark.sql") {
    SketchAgg.registerSql(spark)
    keys.createOrReplaceTempView("ska_bloom_t")
    val per = spark.sql(
      """SELECT src, bloom_sketch_agg(k, 1024, 3) AS st
        |FROM ska_bloom_t GROUP BY src""".stripMargin)
    assert(per.count() === 5)
    per.createOrReplaceTempView("ska_bloom_states")
    val merged = spark.sql(
      "SELECT bloom_merge_agg(st, 1024) AS st FROM ska_bloom_states").head()
      .getAs[Array[Byte]]("st")
    val whole = keys.agg(SketchAgg.bloomSketch(col("k"), 1024, 3)).head()
      .getAs[Array[Byte]](0)
    assert(merged.toSeq === whole.toSeq)
    val hit = spark.sql(
      "SELECT bloom_state_contains(bloom_merge_agg(st, 1024), 'k1', 1024, 3) " +
        "FROM ska_bloom_states").head().getBoolean(0)
    assert(hit, "member must probe present through the SQL surface")
    val rep = spark.sql(
      "SELECT bloom_state_report(bloom_merge_agg(st, 1024), 1024) AS r " +
        "FROM ska_bloom_states").select("r.n_set").head().getLong(0)
    assert(rep > 0L)
  }

  test("kmv state is exactly the k smallest distinct hex60 hashes, sorted") {
    val K = 32
    val st = keys.agg(SketchAgg.kmvSketch(col("k"), K).as("st")).head()
      .getSeq[Long](0)
    val want = keys.select(col("k")).distinct().collect().map(_.getString(0))
      .map(graft.functions.Kernels.hex60String).distinct.sorted.take(K).toSeq
    assert(st === want)
  }

  test("kmv ignores NULL keys; an all-NULL group yields an EMPTY state") {
    // the q204 overlap matrix drops empty states with size(st) > 0 to
    // match its oracle's `WHERE text IS NOT NULL` — that filter is
    // only sound if NULL inputs never contribute a hash
    val mixed = Seq(("a", Some("x")), ("a", None), ("b", None))
      .toDF("src", "k")
    val st = mixed.groupBy(col("src"))
      .agg(SketchAgg.kmvSketch(col("k"), 8).as("st"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(st("a") === Seq(graft.functions.Kernels.hex60String("x")))
    assert(st("b").isEmpty)
  }

  test("merge-equivalence: per-slice KMV states merged == one-pass state") {
    val K = 32
    val whole = keys.agg(SketchAgg.kmvSketch(col("k"), K).as("st")).head()
      .getSeq[Long](0)
    val merged = keys
      .groupBy(col("src")).agg(SketchAgg.kmvSketch(col("k"), K).as("st"))
      .agg(SketchAgg.kmvMerge(col("st"), K).as("st")).head()
      .getSeq[Long](0)
    assert(merged === whole)
  }

  test("kmv serialize/deserialize round-trips the buffer bit-for-bit") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val a = SketchAgg.KmvSketchAgg(Literal("x"), 16)
    val buf = a.createAggregationBuffer()
    Seq("alpha", "beta", "gamma", "delta", "alpha").foreach(s =>
      buf.add(graft.functions.Kernels.hex60String(s)): Unit)
    val rt = a.deserialize(a.serialize(buf))
    assert(rt === buf) // TreeSet equality = same elements in order
    // merge aggregate shares the wire format: its deserialize reads
    // the sketch aggregate's serialize output
    val m = SketchAgg.KmvMergeAgg(Literal(Array.empty[Long]), 16)
    assert(m.deserialize(a.serialize(buf)) === buf)
  }

  test("kmv shape guard: folding a state built with a larger k fails loudly") {
    // 700 distinct keys fill a k=64 state; merging it at k=16 must
    // reject (h_k differs per k, silently re-trimming would report a
    // wrong estimator input)
    val st = keys.agg(SketchAgg.kmvSketch(col("k"), 64).as("st"))
    def chain(t: Throwable): Seq[Throwable] =
      t +: Option(t.getCause).toSeq.flatMap(chain)
    val e = intercept[Exception] {
      st.agg(SketchAgg.kmvMerge(col("st"), 16)).head()
    }
    assert(chain(e).map(t => String.valueOf(t.getMessage)).mkString("|")
      .contains("larger k"), s"expected the k-mismatch guard, got: $e")
    val e2 = intercept[Exception] {
      st.select(SketchAgg.kmvReportOf(col("st"), 16)).head()
    }
    assert(chain(e2).map(t => String.valueOf(t.getMessage)).mkString("|")
      .contains("larger k"), s"expected the report k-guard, got: $e2")
  }

  test("kmvReportOf: under-full state is exact; full state estimates via h_k") {
    val exact = keys.select(col("k")).distinct().count()
    // k=4096 > 700 distinct keys → under-full → est IS the exact count
    val uf = keys.agg(SketchAgg.kmvSketch(col("k"), 4096).as("st"))
      .select(SketchAgg.kmvReportOf(col("st"), 4096).as("r"))
      .select("r.k", "r.k_used", "r.h_k", "r.est_distinct").head()
    assert(uf.getLong(0) === 4096L)
    assert(uf.getLong(1) === exact)
    assert(uf.getLong(3) === exact)
    // k=64 → full → est = (k−1)·2⁶⁰ ÷ h_k exactly, and within the
    // KMV error envelope (σ ≈ 1/√(k−2) ≈ 13%; 2× is ~8σ) of exact
    val full = keys.agg(SketchAgg.kmvSketch(col("k"), 64).as("st"))
      .select(SketchAgg.kmvReportOf(col("st"), 64).as("r"))
      .select("r.k_used", "r.h_k", "r.est_distinct").head()
    assert(full.getLong(0) === 64L)
    val hk = full.getLong(1)
    assert(full.getLong(2) ===
      (BigInt(63) * (BigInt(1) << 60) / BigInt(hk)).toLong)
    assert(full.getLong(2) > exact / 2 && full.getLong(2) < exact * 2,
      s"estimate ${full.getLong(2)} vs exact $exact")
  }

  test("kmvSummary guards h_k == 0: the k=1 zero-hash state reports exactly") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val s = SketchAgg.kmvSummary(new GenericArrayData(Array(0L)), 1)
    assert(s.getLong(0) === 1L && s.getLong(1) === 0L && s.getLong(2) === 1L)
  }

  test("SQL surface: kmv aggregates and report run in spark.sql") {
    SketchAgg.registerSql(spark)
    keys.createOrReplaceTempView("ska_kmv_t")
    val per = spark.sql(
      "SELECT src, kmv_sketch_agg(k, 32) AS st FROM ska_kmv_t GROUP BY src")
    assert(per.count() === 5)
    per.createOrReplaceTempView("ska_kmv_states")
    val merged = spark.sql(
      "SELECT kmv_merge_agg(st, 32) AS st FROM ska_kmv_states").head()
      .getSeq[Long](0)
    val whole = keys.agg(SketchAgg.kmvSketch(col("k"), 32)).head()
      .getSeq[Long](0)
    assert(merged === whole)
    val rep = spark.sql(
      "SELECT kmv_state_report(kmv_merge_agg(st, 32), 32) AS r " +
        "FROM ska_kmv_states").select("r.k", "r.k_used", "r.h_k").head()
    assert(rep.getLong(0) === 32L && rep.getLong(1) === 32L)
    assert(rep.getLong(2) === whole.last)
  }

  test("kmv partition invariance: the state is independent of data layout") {
    val a = keys.repartition(1).agg(SketchAgg.kmvSketch(col("k"), 32)).head()
      .getSeq[Long](0)
    val b = keys.repartition(13, col("src"))
      .agg(SketchAgg.kmvSketch(col("k"), 32)).head().getSeq[Long](0)
    assert(a === b)
  }

  test("partition invariance: the state is independent of data layout") {
    val a = keys.repartition(1).agg(SketchAgg.hllSketch(col("k"), P)).head()
      .getAs[Array[Byte]](0).toSeq
    val b = keys.repartition(13, col("src")).agg(SketchAgg.hllSketch(col("k"), P))
      .head().getAs[Array[Byte]](0).toSeq
    assert(a === b)
  }

  // ---- moments (power-sum) sketch ------------------------------------

  private def nums = (1 to 500).map(i => (i.toLong % 97, s"s${i % 4}"))
    .toDF("x", "src")

  private def stateOf(df: org.apache.spark.sql.DataFrame): Seq[BigDecimal] = {
    val c = SketchAgg.momentsSketch(col("x")).as("st")
    df.agg(c).head().getSeq[java.math.BigDecimal](0).map(BigDecimal(_))
  }

  test("moments state is the exact integer power sums; NULLs are skipped") {
    val xs = (1 to 500).map(i => (i.toLong % 97))
    val withNull = nums.select(
      when(col("x") % 7 === 0, lit(null)).otherwise(col("x")).as("x"))
    val kept = xs.filter(_ % 7 != 0)
    val st = stateOf(withNull)
    def pow(k: Int) = kept.map(x => BigInt(x).pow(k)).sum
    assert(st === Seq(BigDecimal(kept.size), BigDecimal(pow(1)),
      BigDecimal(pow(2)), BigDecimal(pow(3)), BigDecimal(pow(4))))
  }

  test("moments merge-equivalence: per-slice states merged == one-pass, exactly") {
    val whole = stateOf(nums)
    val merged = nums.groupBy(col("src"))
      .agg(SketchAgg.momentsSketch(col("x")).as("st"))
      .agg(SketchAgg.momentsMerge(col("st")).as("st")).head()
      .getSeq[java.math.BigDecimal](0).map(BigDecimal(_))
    assert(merged === whole)
  }

  test("moments big-value path and long-accumulator flush stay exact") {
    // x = 39999 rides the long fast path at the flush boundary
    // (3 rows exceed the Σx⁴ headroom check), x = 1e6 takes the
    // BigInteger branch outright — both must agree with BigInt math
    val xs = Seq.fill(6)(39999L) ++ Seq(1000000L, 3L)
    val st = stateOf(xs.toDF("x"))
    def pow(k: Int) = xs.map(x => BigInt(x).pow(k)).sum
    assert(st === Seq(BigDecimal(xs.size), BigDecimal(pow(1)),
      BigDecimal(pow(2)), BigDecimal(pow(3)), BigDecimal(pow(4))))
  }

  test("moments serialize/deserialize round-trips; merge shares the wire format") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val a = SketchAgg.MomentsSketchAgg(Literal(1L))
    val buf = a.createAggregationBuffer()
    Seq(3L, 39999L, 1000000L, -5L).foreach(x =>
      a.update(buf, org.apache.spark.sql.catalyst.InternalRow(x)))
    val bytes = a.serialize(buf)
    assert(a.serialize(a.deserialize(bytes)).toSeq === bytes.toSeq)
    val m = SketchAgg.MomentsMergeAgg(Literal(null, a.dataType))
    assert(m.serialize(m.deserialize(bytes)).toSeq === bytes.toSeq)
  }

  test("moments shape guard: folding a malformed state fails loudly") {
    val bad = nums.agg(SketchAgg.momentsSketch(col("x")).as("st"))
      .select(slice(col("st"), 1, 3).as("st"))
    val e = intercept[Exception] {
      bad.agg(SketchAgg.momentsMerge(col("st"))).head()
    }
    def chain(t: Throwable): Seq[Throwable] =
      t +: Option(t.getCause).toSeq.flatMap(chain)
    assert(chain(e).map(t => String.valueOf(t.getMessage)).mkString("|")
      .contains("expected 5"), s"expected the shape guard, got: $e")
  }

  test("momentsReportOf: known symmetric data, empty state, constant column") {
    // 1..9: mean 5, var_pop 60/9, skew exactly 0 (m3num is exactly the
    // integer 0 before any division), positive tail bound above mean
    val r = (1L to 9L).toDF("x")
      .agg(SketchAgg.momentsSketch(col("x")).as("st"))
      .select(SketchAgg.momentsReportOf(col("st")).as("r"))
      .select("r.n", "r.mean", "r.var_pop", "r.skew", "r.kurt_excess",
        "r.cantelli_p99").head()
    // var_pop follows the documented power-sum shape p2 − mean² (one
    // rounding different from 60/9 — the oracle mirrors THIS shape)
    val v = 285.0 / 9.0 - 5.0 * 5.0
    assert(r.getLong(0) === 9L && r.getDouble(1) === 5.0)
    assert(r.getDouble(2) === v && r.getDouble(3) === 0.0)
    assert(r.getDouble(5) === 5.0 + math.sqrt(v * 99.0))
    // merging no states at all: an empty buffer reports all zeros
    val z = nums.filter(col("x") < 0)
      .agg(SketchAgg.momentsSketch(col("x")).as("st"))
      .select(SketchAgg.momentsReportOf(col("st")).as("r"))
      .select("r.n", "r.mean", "r.cantelli_p99").head()
    assert(z.getLong(0) === 0L && z.getDouble(1) === 0.0 &&
      z.getDouble(2) === 0.0)
    // constant column: var 0 → the zero-variance guard pins skew/kurt
    // to 0 and the tail bound to the mean itself
    val c = Seq.fill(10)(7L).toDF("x")
      .agg(SketchAgg.momentsSketch(col("x")).as("st"))
      .select(SketchAgg.momentsReportOf(col("st")).as("r"))
      .select("r.var_pop", "r.skew", "r.kurt_excess", "r.cantelli_p99").head()
    assert(c.getDouble(0) === 0.0 && c.getDouble(1) === 0.0 &&
      c.getDouble(2) === 0.0 && c.getDouble(3) === 7.0)
  }

  test("SQL surface: moments aggregates and report run in spark.sql") {
    SketchAgg.registerSql(spark)
    nums.createOrReplaceTempView("ska_mom_t")
    val per = spark.sql(
      "SELECT src, moments_sketch_agg(x) AS st FROM ska_mom_t GROUP BY src")
    assert(per.count() === 4)
    per.createOrReplaceTempView("ska_mom_states")
    val merged = spark.sql(
      "SELECT moments_merge_agg(st) AS st FROM ska_mom_states").head()
      .getSeq[java.math.BigDecimal](0).map(BigDecimal(_))
    assert(merged === stateOf(nums))
    val rep = spark.sql(
      "SELECT moments_state_report(moments_merge_agg(st)) AS r " +
        "FROM ska_mom_states").select("r.n", "r.mean").head()
    assert(rep.getLong(0) === 500L)
    val mean = stateOf(nums)(1).toDouble / 500.0
    assert(rep.getDouble(1) === mean)
  }

  test("moments partition invariance: the state is independent of data layout") {
    val a = stateOf(nums.repartition(1))
    val b = stateOf(nums.repartition(13, col("src")))
    assert(a === b)
  }

  // ---- log-histogram quantile sketch ---------------------------------

  test("logHistBucket/bounds: small values exact, brackets hold, width <= 1/16") {
    (0 to 15).foreach { x =>
      assert(SketchAgg.logHistBucket(x.toLong) === x)
      assert(SketchAgg.logHistBounds(x) === ((x.toLong, x.toLong)))
    }
    val rnd = new scala.util.Random(42)
    val xs = Seq(16L, 17L, 31L, 32L, 33L, 1L << 40, Long.MaxValue) ++
      Seq.fill(3000)(rnd.nextLong() & Long.MaxValue)
    xs.foreach { x =>
      val b = SketchAgg.logHistBucket(x)
      assert(b >= 0 && b < SketchAgg.LogHistBuckets)
      val (lo, hi) = SketchAgg.logHistBounds(b)
      assert(lo <= x && x <= hi, s"$x outside [$lo,$hi] (bucket $b)")
      if (x >= 16L)
        assert(hi - lo + 1L <= math.max(lo / 16L, 1L),
          s"bucket $b wider than the 1/16 relative guarantee")
    }
    intercept[IllegalArgumentException](SketchAgg.logHistBucket(-1L))
  }

  test("loghist merge-equivalence: per-slice states merged == one-pass state") {
    val df = (1 to 900).map(i => (s"s${i % 5}", (i.toLong * i) % 100000))
      .toDF("src", "x")
    val whole = df.agg(SketchAgg.logHistSketch(col("x")).as("st")).head()
      .getSeq[Long](0)
    val merged = df.groupBy(col("src"))
      .agg(SketchAgg.logHistSketch(col("x")).as("st"))
      .agg(SketchAgg.logHistMerge(col("st")).as("st")).head()
      .getSeq[Long](0)
    assert(merged === whole)
  }

  test("logHistReportOf: sub-16 data is EXACT; brackets contain true rank stats") {
    // all values < 16 → every bucket is a singleton, so lo == hi ==
    // the exact rank statistic
    val small = (1L to 10L).toDF("x")
      .agg(SketchAgg.logHistSketch(col("x")).as("st"))
      .select(SketchAgg.logHistReportOf(col("st")).as("r"))
      .select("r.n", "r.p50_lo", "r.p50_hi", "r.p99_lo", "r.p99_hi",
        "r.max_lo", "r.max_hi").head()
    assert(small.getLong(0) === 10L)
    assert((small.getLong(1), small.getLong(2)) === ((5L, 5L)))
    assert((small.getLong(3), small.getLong(4)) === ((10L, 10L)))
    assert((small.getLong(5), small.getLong(6)) === ((10L, 10L)))
    // spread data: brackets must contain the true rank statistics
    val xs = (1L to 1000L).toSeq
    val r = xs.toDF("x")
      .agg(SketchAgg.logHistSketch(col("x")).as("st"))
      .select(SketchAgg.logHistReportOf(col("st")).as("r"))
      .select("r.p50_lo", "r.p50_hi", "r.p90_lo", "r.p90_hi",
        "r.p99_lo", "r.p99_hi", "r.max_lo", "r.max_hi").head()
    def rank(p: Long) = xs.sorted.apply(((1000L * p + 99L) / 100L - 1L).toInt)
    assert(r.getLong(0) <= rank(50) && rank(50) <= r.getLong(1))
    assert(r.getLong(2) <= rank(90) && rank(90) <= r.getLong(3))
    assert(r.getLong(4) <= rank(99) && rank(99) <= r.getLong(5))
    assert(r.getLong(6) <= 1000L && 1000L <= r.getLong(7))
  }

  test("loghist shape guard + empty state zeros + NULL skipping") {
    val df = (1 to 50).map(i => (s"s${i % 3}", i.toLong)).toDF("src", "x")
    val bad = df.agg(SketchAgg.logHistSketch(col("x")).as("st"))
      .select(slice(col("st"), 1, 7).as("st"))
    val e = intercept[Exception] {
      bad.agg(SketchAgg.logHistMerge(col("st"))).head()
    }
    def chain(t: Throwable): Seq[Throwable] =
      t +: Option(t.getCause).toSeq.flatMap(chain)
    assert(chain(e).map(t => String.valueOf(t.getMessage)).mkString("|")
      .contains("expected 1008"), s"expected the shape guard, got: $e")
    val z = df.filter(col("x") < 0L)
      .agg(SketchAgg.logHistSketch(col("x")).as("st"))
      .select(SketchAgg.logHistReportOf(col("st")).as("r"))
      .select("r.n", "r.max_hi").head()
    assert(z.getLong(0) === 0L && z.getLong(1) === 0L)
    val withNull = df.select(
      when(col("x") % 5 === 0, lit(null)).otherwise(col("x")).as("x"))
    val n = withNull.agg(SketchAgg.logHistSketch(col("x")).as("st"))
      .select(SketchAgg.logHistReportOf(col("st")).as("r"))
      .select("r.n").head().getLong(0)
    assert(n === 40L, "NULL inputs must be skipped")
  }

  test("weighted builds == repeat-expansion exactly; zero/NULL no-ops; negative w loud") {
    val pairs = Seq((3L, 1L), (7L, 4L), (50000L, 2L), (0L, 3L), (9L, 0L))
    val expanded = pairs.flatMap { case (x, w) => Seq.fill(w.toInt)(x) }
    val wdf = pairs.toDF("x", "w")
    val mW = wdf.agg(SketchAgg.momentsSketchW(col("x"), col("w")).as("st"))
      .head().getSeq[java.math.BigDecimal](0).map(BigDecimal(_))
    val mR = expanded.toDF("x")
      .agg(SketchAgg.momentsSketch(col("x")).as("st"))
      .head().getSeq[java.math.BigDecimal](0).map(BigDecimal(_))
    assert(mW === mR)
    val hW = wdf.agg(SketchAgg.logHistSketchW(col("x"), col("w")).as("st"))
      .head().getSeq[Long](0)
    val hR = expanded.toDF("x")
      .agg(SketchAgg.logHistSketch(col("x")).as("st")).head().getSeq[Long](0)
    assert(hW === hR)
    // NULL x or w rows contribute nothing
    val withNulls = Seq((Some(5L), Some(2L)), (None, Some(9L)), (Some(4L), None))
      .toDF("x", "w")
    val n = withNulls.agg(SketchAgg.momentsSketchW(col("x"), col("w")).as("st"))
      .select(SketchAgg.momentsReportOf(col("st")).as("r"))
      .select("r.n").head().getLong(0)
    assert(n === 2L)
    // negative weight: loud failure, never a silent subtraction
    val e = intercept[Exception] {
      Seq((1L, -1L)).toDF("x", "w")
        .agg(SketchAgg.logHistSketchW(col("x"), col("w"))).head()
    }
    def chain(t: Throwable): Seq[Throwable] =
      t +: Option(t.getCause).toSeq.flatMap(chain)
    assert(chain(e).map(t => String.valueOf(t.getMessage)).mkString("|")
      .contains("must be >= 0"))
  }

  test("SQL surface: weighted builds fold with the unweighted merge aggregates") {
    SketchAgg.registerSql(spark)
    val pairs = Seq(("a", 3L, 2L), ("a", 8L, 1L), ("b", 40L, 5L))
      .toDF("g", "x", "w")
    pairs.createOrReplaceTempView("ska_w_t")
    val merged = spark.sql(
      """SELECT loghist_state_report(loghist_merge_agg(st)) AS r FROM (
           SELECT g, loghist_wsketch_agg(x, w) AS st FROM ska_w_t GROUP BY g)""")
      .select("r.n").head().getLong(0)
    assert(merged === 8L)
    val m = spark.sql(
      """SELECT moments_state_report(moments_merge_agg(st)) AS r FROM (
           SELECT g, moments_wsketch_agg(x, w) AS st FROM ska_w_t GROUP BY g)""")
      .select("r.n", "r.mean").head()
    assert(m.getLong(0) === 8L)
    assert(m.getDouble(1) === (3.0 * 2 + 8.0 + 40.0 * 5) / 8.0)
  }

  test("SQL surface: loghist aggregates and report run in spark.sql") {
    SketchAgg.registerSql(spark)
    val df = (1 to 300).map(i => (s"s${i % 3}", i.toLong * 7)).toDF("src", "x")
    df.createOrReplaceTempView("ska_lh_t")
    val per = spark.sql(
      "SELECT src, loghist_sketch_agg(x) AS st FROM ska_lh_t GROUP BY src")
    assert(per.count() === 3)
    per.createOrReplaceTempView("ska_lh_states")
    val merged = spark.sql(
      "SELECT loghist_merge_agg(st) AS st FROM ska_lh_states").head()
      .getSeq[Long](0)
    val whole = df.agg(SketchAgg.logHistSketch(col("x"))).head().getSeq[Long](0)
    assert(merged === whole)
    val rep = spark.sql(
      "SELECT loghist_state_report(loghist_merge_agg(st)) AS r " +
        "FROM ska_lh_states").select("r.n").head()
    assert(rep.getLong(0) === 300L)
  }

  private def causeChain(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
      .map(e => String.valueOf(e.getMessage)).mkString(" | ")

  test("moments input guard: |x| past the decimal(38,0) bound fails fast") {
    // boundary value itself is fine (its 4th power still fits 38 digits)
    Seq(SketchAgg.MOMENTS_MAX_X).toDF("x")
      .agg(SketchAgg.momentsSketch(col("x"))).head()
    // one past: fail at the INPUT, naming the bound -- not an opaque
    // Decimal ArithmeticException at eval time (epoch-nano timestamps)
    val e1 = intercept[Exception] {
      Seq(SketchAgg.MOMENTS_MAX_X + 1L).toDF("x")
        .agg(SketchAgg.momentsSketch(col("x"))).head()
    }
    assert(causeChain(e1).contains("3162277660"))
    // the weighted build guards the same bound
    val e2 = intercept[Exception] {
      Seq((SketchAgg.MOMENTS_MAX_X + 1L, 5L)).toDF("x", "w")
        .agg(SketchAgg.momentsSketchW(col("x"), col("w"))).head()
    }
    assert(causeChain(e2).contains("3162277660"))
  }

  test("moments eval overflow is reported loudly, not as an opaque Decimal error") {
    // each input passes the per-row bound, but two of them push the
    // power sum past 10^38 -- the eval guard names the condition
    val big = 3000000000L // x^4 = 8.1e37; two rows -> 1.62e38
    val e = intercept[Exception] {
      Seq(big, big).toDF("x").agg(SketchAgg.momentsSketch(col("x"))).head()
    }
    assert(causeChain(e).contains("overflows the decimal(38,0) state"))
  }

  test("logHistSummary quantile ranks are exact at near-2^63 weighted mass") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val heavy = SketchAgg.logHistBucket(12345L)
    val light = SketchAgg.logHistBucket(7L)
    val arr = new Array[Long](SketchAgg.LogHistBuckets)
    arr(heavy) = 9200000000000000000L - 100L
    arr(light) = 100L
    val out = SketchAgg.logHistSummary(new GenericArrayData(arr))
    assert(out.getLong(0) === 9200000000000000000L)
    // with the old n*p+99 product these ranks wrapped NEGATIVE and the
    // brackets collapsed to the lowest occupied bucket
    Seq(1, 3, 5).foreach { i => // p50, p90, p99 lo-offsets
      assert(out.getLong(i) <= 12345L && 12345L <= out.getLong(i + 1),
        s"quantile bracket at offset $i missed the heavy bucket: " +
          s"[${out.getLong(i)}, ${out.getLong(i + 1)}]")
    }
    // total mass past 2^63 fails loudly instead of wrapping
    val over = new Array[Long](SketchAgg.LogHistBuckets)
    over(heavy) = 6000000000000000000L
    over(light) = 6000000000000000000L
    intercept[ArithmeticException](
      SketchAgg.logHistSummary(new GenericArrayData(over)))
  }

  test("weighted loghist build and merge fail loudly on counter overflow") {
    val e = intercept[Exception] {
      Seq((5L, Long.MaxValue), (5L, 2L)).toDF("x", "w")
        .agg(SketchAgg.logHistSketchW(col("x"), col("w"))).head()
    }
    assert(causeChain(e).toLowerCase.contains("overflow"))
    val e2 = intercept[Exception] {
      Seq((5L, Long.MaxValue, "a"), (5L, 2L, "b")).toDF("x", "w", "g")
        .groupBy(col("g"))
        .agg(SketchAgg.logHistSketchW(col("x"), col("w")).as("st"))
        .agg(SketchAgg.logHistMerge(col("st")).as("st")).head()
    }
    assert(causeChain(e2).toLowerCase.contains("overflow"))
  }
}
