package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSIR-style importance resampling (r16 verdict task 6): every
  * assertion hand-computed from the hex60 feature hashes —
  * delta→(dim 17, +1), tau→(18, +1), bb→(16, +1), chi→(1, −1) at
  * dims = 32 — through the add-one bucket models, the ⌊2²⁰·ratio⌋
  * quantization, the mass-weighted mean, and the PPS draw.
  *
  * Corpus: target doc "delta delta tau"; raw docs "delta bb" and
  * "chi chi chi". Models: N_t = 3, N_r = 5;
  * dim17 (c_t 2, c_r 1) → q = ⌊2²⁰·3·37/(2·35)⌋ = 1662741;
  * dim16 (0, 1) → ⌊2²⁰·37/70⌋ = 554247;
  * dim1 (0, 3) → ⌊2²⁰·37/140⌋ = 277123.
  * (Saturation at 2⁴⁰ is corpus-unreachable below ~2²⁰·dims raw
  * tokens, so no unit corpus can trigger it; its oracle parity is
  * algebraic — r_int ≥ 2²⁰ ⇔ scaled ≥ 2⁴⁰, both floors of the same
  * rational — and the branch is exercised structurally by q231.)
  */
class DsirSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def corpus = Seq(
    (1L, "src0", "delta delta tau"),
    (2L, "raw", "delta bb"),
    (3L, "raw", "chi chi chi"))
    .toDF("doc_id", "source", "text")

  test("importanceWeights: hand-computed quantized mean ratios, " +
      "target docs excluded") {
    val w = graft.ops.Dsir.importanceWeights(
        corpus, "doc_id", "text", col("source") === "src0", dims = 32)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("feat_mass"), r.getAs[Long]("ratio_q"))).toMap
    // doc2: dims 17 + 16, one token each -> (1662741 + 554247) / 2
    // doc3: dim 1, three tokens        -> 3*277123 / 3
    assert(w === Map(2L -> ((2L, 1108494L)), 3L -> ((3L, 277123L))))
  }

  test("importanceWeights: null target flag means raw") {
    val w = graft.ops.Dsir.importanceWeights(
        corpus.withColumn("source",
          when(col("source") === "raw", lit(null: String))
            .otherwise(col("source"))),
        "doc_id", "text", col("source") === "src0", dims = 32)
      .collect().map(_.getLong(0)).sorted
    assert(w.toList === List(2L, 3L))
  }

  test("resample: PPS draw on the hand-computed line") {
    // total 1385617, k=2 -> step 692808; points 692808 (doc2),
    // 1385616 (doc3): one hit each
    val hits = graft.ops.Dsir.resample(
        corpus, "doc_id", "text", col("source") === "src0",
        k = 2, dims = 32)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("w"),
        r.getAs[Long]("n_hits"))).sortBy(_._1)
    assert(hits.toList === List((2L, 1108494L, 1L), (3L, 277123L, 1L)))
  }
}
