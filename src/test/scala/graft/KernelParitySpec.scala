package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Kernels, TextKernels, VectorKernels}
import graft.ops.Multimodal

/** The compiled StaticInvoke kernels must be BIT-IDENTICAL to their
  * Column-expression counterparts (that is what keeps the DuckDB
  * oracles valid after the hot paths switched to Kernels).
  */
class KernelParitySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("minhash signature parity on the corpus") {
    val mismatch = docs.select(
      Kernels.minhashSigOf(col("text"), 16, 3).as("fast"),
      TextKernels.minhashSig(
        TextKernels.wordShingles(TextKernels.tokens(col("text")), 3), 16).as("slow"))
      .filter(not(col("fast") === col("slow"))).count()
    assert(mismatch === 0)
  }

  test("simhash parity on the corpus") {
    val mismatch = docs.select(
      Kernels.simhash60Of(col("text")).as("fast"),
      TextKernels.simhash60(
        TextKernels.tokenHashes(TextKernels.tokens(col("text")))).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(mismatch === 0)
  }

  test("fingerprint parity on the corpus") {
    val mismatch = docs.select(
      Kernels.fingerprintOf(col("text")).as("fast"),
      TextKernels.rollingFingerprint(TextKernels.tokens(col("text"))).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(mismatch === 0)
  }

  test("minhash parity on edge cases (short docs, repeated words, empty)") {
    val edge = Seq("a", "a b", "x x x x x x", "", "one two three four five")
      .toDF("text")
    val mismatch = edge.select(
      Kernels.minhashSigOf(col("text"), 8, 3).as("fast"),
      TextKernels.minhashSig(
        TextKernels.wordShingles(TextKernels.tokens(col("text")), 3), 8).as("slow"))
      .filter(not(col("fast") === col("slow"))).count()
    assert(mismatch === 0)
  }

  test("wordShingles parity on corpus + edge cases (order included)") {
    val edge = Seq("a", "a b", "x x x x x x", "one two three four five").toDF("text")
    for (d <- Seq(docs, edge)) {
      val mismatch = d.select(
        Kernels.wordShinglesOf(col("text"), 3).as("fast"),
        TextKernels.wordShingles(TextKernels.tokens(col("text")), 3).as("slow"))
        .filter(not(col("fast") === col("slow"))).count()
      assert(mismatch === 0)
    }
  }

  test("cosine parity on embeddings, bit-exact") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val na = VectorKernels.l2norm(col("embedding"))
    val nb = VectorKernels.l2norm(col("qvec"))
    val slow = when(na > 0 && nb > 0,
      VectorKernels.dot(col("embedding"), col("qvec")) / (na * nb))
    val mismatch = e.crossJoin(q)
      .select(Kernels.cosineOf(col("embedding"), col("qvec")).as("fast"), slow.as("slow"))
      .filter(col("fast") =!= col("slow")).count()  // bit-exact equality
    assert(mismatch === 0)
  }

  test("cosine: zero-norm and length-mismatch give NULL") {
    val df = Seq(
      (Seq(0f, 0f), Seq(1f, 2f)),
      (Seq(1f, 2f), Seq(1f)),
      (Seq(3f, 4f), Seq(3f, 4f))).toDF("a", "b")
    val got = df.select(Kernels.cosineOf(col("a"), col("b")).as("c")).collect()
    assert(got(0).isNullAt(0))
    assert(got(1).isNullAt(0))
    assert(math.abs(got(2).getDouble(0) - 1.0) < 1e-15)
  }

  test("sortedPairs parity with the interpreted transform expansion") {
    val buckets = Seq(Seq(5L, 1L, 3L), Seq(2L, 9L), Seq(7L), Seq.empty[Long],
      Seq(4L, 8L, 2L, 6L, 0L)).toDF("ids")
    // reference: sort, then nested-transform i<j expansion
    val slow = buckets.select(explode(flatten(transform(
      sort_array(col("ids")), (x, i) =>
        transform(slice(sort_array(col("ids")), i + lit(2), size(col("ids"))),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      .select(col("p.a"), col("p.b")).collect().map(r => (r.getLong(0), r.getLong(1)))
    val fast = buckets.select(explode(Kernels.sortedPairsOf(col("ids"))).as("p"))
      .select(col("p.a"), col("p.b")).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fast.sorted.toSeq === slow.sorted.toSeq)
    assert(fast.length === 3 + 1 + 0 + 0 + 10)
  }

  test("stringPairs parity with the interpreted transform expansion") {
    val sets = Seq(
      Seq("b", "a", "c"), Seq("x", "y"), Seq("only"), Seq.empty[String]
    ).toDF("ts").select(sort_array(col("ts")).as("ts"))
    val slow = sets.select(explode(flatten(transform(col("ts"), (x, i) =>
        transform(slice(col("ts"), i + lit(2), size(col("ts"))),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      .select(col("p.a"), col("p.b")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val fast = sets.select(explode(Kernels.stringPairsOf(col("ts"))).as("p"))
      .select(col("p.a"), col("p.b")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(fast.sorted.toSeq === slow.sorted.toSeq)
    assert(fast.length === 3 + 1)
  }

  test("hybridFeatures == shingle-hash set + distinct-token set, one row each") {
    val d = Seq((1L, "the cat and the hat sat"), (2L, ""), (3L, "one two"),
      (4L, "a b a b a")).toDF("i", "t")
    val f = d.select(col("i"),
      explode(Kernels.hybridFeaturesOf(col("t"), 3)).as("f"))
    // exactly one of (g, w) per row
    assert(f.filter(col("f.g").isNotNull === col("f.w").isNotNull).count() === 0)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.get(1).toString)).toSet
    assert(pairs(f.filter(col("f.g").isNotNull).select(col("i"), col("f.g"))) ===
      pairs(d.select(col("i"),
        explode(Kernels.shingleHashes60Of(col("t"), 3)).as("g"))))
    assert(pairs(f.filter(col("f.w").isNotNull).select(col("i"), col("f.w"))) ===
      pairs(d.select(col("i"),
        explode(array_distinct(split(col("t"), " "))).as("w"))))
  }

  test("sortedIntersectCount parity with size(array_intersect) on sorted sets") {
    val pairs = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 9L, 11L)),   // partial overlap
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),            // identical
      (Seq(1L, 2L), Seq(5L, 6L, 7L)),                // disjoint
      (Seq.empty[Long], Seq(1L, 2L)),                // one empty
      (Seq.empty[Long], Seq.empty[Long]))            // both empty
      .toDF("a", "b")
    val got = pairs.select(
      Kernels.sortedIntersectCountOf(col("a"), col("b")).as("c"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    got.foreach { case (c, ref) => assert(c === ref) }
    assert(got.map(_._1).toSeq === Seq(2L, 3L, 0L, 0L, 0L))
  }

  test("sortedPairsWithSizes sorts jointly by id and keeps payload aligned") {
    val df = Seq((Seq(30L, 10L, 20L), Seq(3, 1, 2))).toDF("ids", "ns")
    val rows = df.select(explode(Kernels.sortedPairsWithSizesOf(col("ids"), col("ns"))).as("p"))
      .select(col("p.a"), col("p.na"), col("p.b"), col("p.nb"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    assert(rows.toSeq === Seq((10L, 1, 20L, 2), (10L, 1, 30L, 3), (20L, 2, 30L, 3)))
  }

  test("kernels are SQL-callable after GraftExtensions.register") {
    GraftExtensions.register(spark)
    docs.createOrReplaceTempView("docs_sql")
    val viaSql = spark.sql(
      """SELECT graft_simhash60(text) AS sh, graft_fingerprint(text) AS fp,
                graft_minhash(text, 8, 3) AS mh, graft_shingles(text, 3) AS sg
         FROM docs_sql""")
    val viaCol = docs.select(
      Kernels.simhash60Of(col("text")).as("sh"),
      Kernels.fingerprintOf(col("text")).as("fp"),
      Kernels.minhashSigOf(col("text"), 8, 3).as("mh"),
      Kernels.wordShinglesOf(col("text"), 3).as("sg"))
    assert(viaSql.exceptAll(viaCol).count() === 0)
    assert(viaCol.exceptAll(viaSql).count() === 0)
    // the sketch aggregates register through the same path — one
    // builder list, both registration surfaces (extensions + live)
    val sk = spark.sql(
      "SELECT hll_state_report(hll_sketch_agg(text, 8), 8).n_nonzero FROM docs_sql")
      .head().getLong(0)
    assert(sk > 0)

    val cos = spark.sql(
      "SELECT graft_cosine(array(1.0, 0.0), array(1.0, 0.0)) AS c").head().getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-15)

    val pairs = spark.sql(
      "SELECT graft_pairs(array(3L, 1L, 2L)) AS p").head().getSeq[Row](0)
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))) ===
      Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    val spairs = spark.sql(
      "SELECT graft_string_pairs(array('a', 'b', 'c')) AS p").head().getSeq[Row](0)
    assert(spairs.map(r => (r.getString(0), r.getString(1))) ===
      Seq(("a", "b"), ("a", "c"), ("b", "c")))
    val shHashes = spark.sql(
      "SELECT graft_shingle_hashes(text, 3) AS h FROM docs_sql LIMIT 1").count()
    assert(shHashes === 1)

    val media = spark.sql(
      """SELECT graft_media_features(cast('abc' AS binary), 8) AS f,
                graft_pool_bytes(cast('0123456789' AS binary), 4) AS p""").head()
    assert(media.getSeq[Float](0) ===
      Multimodal.fakeFeatures("abc".getBytes("UTF-8")).toSeq)
    assert(media.getSeq[Long](1) === Seq(49L, 53L, 56L))

    val r7 = spark.sql(
      """SELECT graft_pair_keys(array(3L, 1L, 2L)) AS pk,
                graft_byte_histogram(cast('AAaa' AS binary), 16) AS bh,
                graft_dhash60(cast('0123456789' AS binary)) AS dh""").head()
    assert(r7.getSeq[Long](0) ===
      Seq((1L << 32) | 2L, (1L << 32) | 3L, (2L << 32) | 3L))
    val bh = r7.getSeq[Long](1)
    assert(bh(4) === 2L && bh(6) === 2L && bh.sum === 4L)
    assert(r7.getLong(2) ===
      Kernels.dhash60("0123456789".getBytes("UTF-8")))

    val ps = spark.sql(
      "SELECT graft_phrase_scan('a a a b c', 'a a\nb c') AS s").head()
      .getSeq[Long](0)
    assert(ps === Seq(3L, 2L),
      "two overlapping 'a a' + one 'b c'; both phrases present")

    // the KMV and bloom state-report builders ride the same shared
    // builder list — SQL-vs-Column parity through the extensions hook,
    // field for field (the HLL sibling is pinned above)
    import graft.functions.SketchAgg
    val kmvSql = spark.sql(
      "SELECT kmv_state_report(kmv_sketch_agg(text, 16), 16) AS r FROM docs_sql")
      .select("r.k", "r.k_used", "r.h_k", "r.est_distinct").head()
    val kmvCol = docs.agg(SketchAgg.kmvSketch(col("text"), 16).as("st"))
      .select(SketchAgg.kmvReportOf(col("st"), 16).as("r"))
      .select("r.k", "r.k_used", "r.h_k", "r.est_distinct").head()
    assert(kmvSql === kmvCol)
    assert(kmvSql.getLong(1) > 0L)
    val blSql = spark.sql(
      "SELECT bloom_state_report(bloom_sketch_agg(text, 1024, 3), 1024) AS r " +
        "FROM docs_sql").select("r.m", "r.n_set", "r.fill_ppm").head()
    val blCol = docs.agg(SketchAgg.bloomSketch(col("text"), 1024, 3).as("st"))
      .select(SketchAgg.bloomReportOf(col("st"), 1024).as("r"))
      .select("r.m", "r.n_set", "r.fill_ppm").head()
    assert(blSql === blCol)
    assert(blSql.getLong(1) > 0L)
    // moments and loghist report builders, same shared builder list
    val momSql = spark.sql(
      "SELECT moments_state_report(moments_sketch_agg(length(text))) AS r " +
        "FROM docs_sql")
      .select("r.n", "r.mean", "r.var_pop", "r.skew", "r.kurt_excess",
        "r.cantelli_p99").head()
    val momCol = docs
      .agg(SketchAgg.momentsSketch(length(col("text"))).as("st"))
      .select(SketchAgg.momentsReportOf(col("st")).as("r"))
      .select("r.n", "r.mean", "r.var_pop", "r.skew", "r.kurt_excess",
        "r.cantelli_p99").head()
    assert(momSql === momCol)
    assert(momSql.getLong(0) > 0L)
    val lhSql = spark.sql(
      "SELECT loghist_state_report(loghist_sketch_agg(length(text))) AS r " +
        "FROM docs_sql")
      .select("r.n", "r.p50_lo", "r.p50_hi", "r.p99_lo", "r.p99_hi",
        "r.max_lo", "r.max_hi").head()
    val lhCol = docs
      .agg(SketchAgg.logHistSketch(length(col("text"))).as("st"))
      .select(SketchAgg.logHistReportOf(col("st")).as("r"))
      .select("r.n", "r.p50_lo", "r.p50_hi", "r.p99_lo", "r.p99_hi",
        "r.max_lo", "r.max_hi").head()
    assert(lhSql === lhCol)
    assert(lhSql.getLong(0) > 0L)
  }

  test("media kernels match an independent byte-loop reference") {
    def refFeatures(p: Array[Byte], dim: Int): Seq[Float] = {
      val acc = new Array[Long](dim)
      for (i <- p.indices) acc(i % dim) = (acc(i % dim) * 31 + (p(i) & 0xff)) % 1000003L
      acc.toSeq.map(_.toFloat / 1000003.0f)
    }
    def refPool(p: Array[Byte], f: Int): Seq[Long] =
      p.grouped(f).map(w => (w.map(_ & 0xff).sum / w.length).toLong).toSeq
    val df = Seq("hello world", "", "0123456789", "a" * 257).toDF("text")
      .select(col("text").cast("binary").as("payload"))
    val got = df.select(
      Kernels.mediaFeaturesOf(col("payload"), 8).as("f"),
      Kernels.poolBytesOf(col("payload"), 4).as("p"),
      col("payload")).collect()
    for (r <- got) {
      val p = r.getAs[Array[Byte]]("payload")
      assert(r.getSeq[Float](0) === refFeatures(p, 8))
      assert(r.getSeq[Long](1) === refPool(p, 4))
      assert(Multimodal.fakeFeatures(p).toSeq === refFeatures(p, Multimodal.FeatureDim))
    }
  }

  test("multimodal feature/resize plans are codegen'd (no DeserializeToObject)") {
    val in = Multimodal.ingest(
      docs.select(col("doc_id"), col("text")), "doc_id", "text", "x")
    for (df <- Seq(
        Multimodal.extractFeatures(in, "doc_id"),
        Multimodal.resize(in, "doc_id", 16))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("DeserializeToObject"), plan)
      assert(plan.contains("static_invoke"), plan)
    }
  }

  test("kernel plan stays inside WholeStageCodegen (no interpreted HOFs)") {
    val plan = docs.select(Kernels.simhash60Of(col("text")))
      .queryExecution.executedPlan.toString
    // "*(n)" marks a WholeStageCodegen span in the rendered plan
    assert(plan.contains("*(1) Project [static_invoke"), plan)
  }
}
