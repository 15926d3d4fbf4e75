package graft

import org.scalatest.funsuite.AnyFunSuite

/** Scale contract over the DECLARED physical topology of every
  * registered query: no query may plan a cartesian product, and
  * broadcast-nested-loop joins are allowed only where the broadcast
  * side is a bounded literal/scalar by construction (allowlisted, with
  * the reason). Plan SHAPES are scale-invariant — AQE re-sizes
  * exchanges at runtime but does not introduce or remove a declared
  * cartesian — so this sweep is the regression guard that keeps a
  * future refactor from silently reintroducing an all-pairs join the
  * SCALE.md audit ruled out.
  */
class PlanContractSpec extends AnyFunSuite {
  import TestSpark._

  /** Queries whose plan legitimately contains BroadcastNestedLoopJoin:
    * every build side here is BOUNDED BY CONSTRUCTION — a scalar or a
    * small fixed set that does not grow with the corpus — so the
    * "nested loop" is a constant-time probe per row, never an
    * all-pairs product:
    *  - q22/q23: the single query vector (1 row);
    *  - q66: the corpus-total doc count (1 row, the idf denominator);
    *  - q70: the calendar spine (rows = days in the queried range);
    *  - q80: the decile boundary array (1 row of 9 cut points);
    *  - q83: the query batch (bounded by the kNN API contract; the
    *    per-(row × query) scores immediately fold into the k-bounded
    *    TopKHeap partial aggregate, so nothing quadratic survives the
    *    map side).
    */
  private val boundedBnlj: Set[String] = Set(
    "q22_ann_topk", "q23_ivf_topk", "q66_tfidf", "q70_gap_fill",
    "q80_equidepth", "q83_batch_knn",
    "q95_hot_keys", // 1-row total joined for the share denominator
    "q97_fd_check", // three pairs of 1-row distinct-count aggregates
    "q99_forward_fill", // the q70-style calendar spine (groups × days)
    "q101_ann_recall", // the q83 query batch + queries × centroids probe
                       // ranking — both sides IVF-contract small
    "q102_cooccurrence", // 1-row user-universe total for the lift denominator
    "q133_skyline", // 1-row survivor-count tripwire (assert_true guard)
                    // broadcast into the global frontier pass
    "q212_t_closeness", // combos × ordinal-domain grid + 1-row scalars —
                        // bounded by quasi/domain cardinality, never corpus
    "q213_hist_drift",  // the 1-row global log-histogram state broadcast
    "q143_record_linkage", // 1-row corpus total for the rarity-weight scale
    "q148_chi2_tokens",    // 1-row corpus-total N for the χ² contingency
    "q152_interpolate",    // the q70-style calendar spine (groups × days)
    "q154_bm25",           // 1-row (N, T) corpus totals for the BM25 ratios
    "q161_ema",            // the q70-style calendar spine (groups × days)
    "q162_quantile_norm",  // 1-row corpus total N for the quantile scale
    "q168_ivf_stats",      // 1-row corpus total + queries × centroids probe
    "q169_pmi_pairs",      // 1-row corpus doc count for the PMI scale
    "q181_modularity",     // 1-row edge total m for the Q denominator
    "q184_langid_confusion", // the docs × LANGUAGES spine — the distinct
                             // label set is a small constant by the
                             // classifier's construction (q83 rule)
    "q188_ks_drift",       // 1-row (n_a, n_b) totals broadcast for the
                           // CDF cross-multiplication
    "q192_join_size_est",  // two 1-row folds (exact size, sketch min)
                           // cross-joined into the single report row
    "q204_kmv_source_overlap", // per-source sketch-state table joined
                               // to itself — rows = #sources, each a
                               // fixed ≤k-long array (q83 bounded rule)
    "q215_ndcg", // 1-row DCG × 1-row IDCG final-report assembly, plus
                 // the q154 BM25 corpus totals underneath
    "q220_leakage_split", // 1-row leakage-invariant frame broadcast
                          // into the per-split report
    "q221_collocations",  // 1-row corpus bigram total N for the lift
                          // denominator (q169 rule)
    "q228_unigram_train",     // 1-row dpLen oracle-precondition guard
    "q229_tokenizer_compare", // frame (raise_error tripwire, the q133
    "q230_unigram_coverage",  // rule) broadcast into the final report
    "q233_cluster_keywords")  // 1-row corpus token total N for the
                              // lift denominator (q66/q169 rule)

  for (name <- SparkEntry.queries.keys.toSeq.sorted) {
    test(s"$name declares no cartesian product") {
      // sweep the DECLARED topology with session caches OFF: a pinned
      // prework frame's plan is a bare LogicalRDD scan, which would
      // hide the underlying operator's join shape from this audit
      val raw = spark.newSession()
      raw.conf.set("spark.graft.sessionCache", "off")
      val plan = SparkEntry.queries(name)(raw, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product")
      if (!boundedBnlj(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans an unexpected broadcast nested loop join")
    }
  }
}
