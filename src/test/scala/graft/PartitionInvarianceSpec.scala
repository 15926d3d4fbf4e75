package graft

import org.scalatest.funsuite.AnyFunSuite

/** Determinism under re-partitioning: the engine's core claim for its
  * quantized/integer-exact operators is that results are a pure
  * function of the DATA — independent of shuffle partition count,
  * task scheduling, and aggregation order. This sweep re-runs a
  * deliberately tricky slice of the registered queries (decimal moment
  * sums, ⌊·2²⁰⌋ quantization, driver-looped fixpoints, window
  * argmaxes, connected components, BPE training) on a sibling session
  * with a DIFFERENT `spark.sql.shuffle.partitions` and demands
  * bit-identical row sets.
  */
class PartitionInvarianceSpec extends AnyFunSuite {
  import TestSpark._

  private val slice = Seq(
    "q100_zscore",          // integer z-quantization
    "q135_assortativity",   // decimal(38,0) moment sums
    "q146_pagerank",        // driver-looped fixpoint, lineage cuts
    "q32_neardup_dedup",    // minhash LSH + connected components
    "q177_theil_sen",       // quantized slopes, domain-window median
    "q187_bpe_train",       // iterative argmax + islands application
    "q188_ks_drift",        // distributed prefix sums, argmax struct
    "q19_jaccard_pairs",    // inverted-index pair expansion
    "q194_repeated_spans",  // gaps-and-islands over covered positions
    "q195_boilerplate_catalog") // deterministic top-k over span texts

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** Session-cached queries would serve the SAME pinned frame to the
    * sibling session (the cache is keyed on the shared SparkContext),
    * collapsing the invariance check into self-comparison — so the
    * alt-session side runs the RAW uncached operator for those. This
    * checks strictly more: the pinned cache content must equal a
    * fresh differently-partitioned computation.
    */
  private val uncachedForm: Map[String, (org.apache.spark.sql.SparkSession,
      String) => org.apache.spark.sql.DataFrame] = Map(
    "q32_neardup_dedup" -> ((s, dir) => {
      val docs = graft.sources.Tables.documents(s, dir)
      val pairs = graft.ops.Dedup.minhashCandidatePairs(docs, "doc_id",
        "text", shingleWords = 3, bands = 4, rowsPerBand = 4)
      graft.ops.Dedup.nearDupSurvivors(docs, pairs, "doc_id")
    }),
    "q187_bpe_train" -> ((s, dir) => graft.ops.NgramLm.bpeTrain(
      graft.sources.Tables.documents(s, dir), "text", merges = 3)),
    "q19_jaccard_pairs" -> ((s, dir) => graft.ops.Dedup.jaccardPairs(
      graft.sources.Tables.documents(s, dir), "doc_id", "text",
      shingleWords = 3, threshold = 0.2, maxDf = 10000)))

  for (name <- slice) {
    test(s"$name is invariant to the shuffle partition count") {
      val base = rows(SparkEntry.queries(name)(spark, sf))
      val alt = spark.newSession()
      alt.conf.set("spark.sql.shuffle.partitions", "7")
      try {
        val got = rows(
          uncachedForm.getOrElse(name, SparkEntry.queries(name))(alt, sf))
        assert(got === base)
      } finally alt.conf.unset("spark.sql.shuffle.partitions")
    }
  }
}
