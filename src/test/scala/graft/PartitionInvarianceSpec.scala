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
    "q195_boilerplate_catalog", // deterministic top-k over span texts
    "q224_pack_chunks",     // distributed prefix sum + chunk fan-out
    "q225_effective_size",  // whole-corpus cluster sizes, integer ppm
    "q226_proportional_sample") // largest remainder + bounded min-k heap

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  for (name <- slice) {
    test(s"$name is invariant to the shuffle partition count") {
      val base = rows(SparkEntry.queries(name)(spark, sf))
      val alt = spark.newSession()
      alt.conf.set("spark.sql.shuffle.partitions", "7")
      // session caches OFF on the alt side: a cached query would serve
      // the SAME pinned frame to the sibling session (the cache keys
      // on the shared SparkContext), collapsing the check into
      // self-comparison. With the bypass, the pinned cache content
      // must equal a fresh differently-partitioned raw computation —
      // strictly stronger, and future cached queries joining the
      // slice stay covered automatically.
      alt.conf.set("spark.graft.sessionCache", "off")
      try {
        val got = rows(SparkEntry.queries(name)(alt, sf))
        assert(got === base)
      } finally alt.conf.unset("spark.sql.shuffle.partitions")
    }
  }
}
