package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.util.Pin.PinOps
import graft.functions.TextKernels._

/** [EXT] Deduplication operators over a document corpus (SURVEY.md §7.1
  * step 6; generalizes the reference's keyed keep-latest dedup,
  * /root/reference/lib/connections/redshift.js:400-413, from key
  * equality to content equality and near-equality).
  *
  * Scale notes (100 TB):
  *  - `exact` shuffles once on a 128-bit content hash — uniformly
  *    distributed, so no skew; AQE coalesces the post-agg partitions.
  *  - `minhashCandidatePairs` computes signatures map-side (compiled
  *    kernel, one pass), then shuffles only (band_idx, band_key) rows;
  *    bucket sizes are the only blow-up risk, controlled by band count
  *    / rows-per-band and capped by `maxBucket`.
  *  - `jaccardPairs` groups an inverted index by shingle and expands
  *    posting lists — the standard Spark near-dup verifier; never an
  *    all-pairs product.
  */
object Dedup {

  /** Exact content dedup: one row per distinct content hash with the
    * surviving (minimum) id and the number of copies collapsed.
    */
  def exact(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.groupBy(md5(col(contentCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))


  /** MinHash + LSH banding candidate pairs: docs sharing ANY band key.
    * numHashes = bands * rowsPerBand signature entries.
    *
    * Signatures are computed ONCE (a self-join would recompute the
    * whole minhash pipeline on both sides): explode band keys, group
    * by (band_idx, band_key), expand each bucket's sorted id list into
    * its i<j pairs. Bucket size bounds the expansion; buckets larger
    * than `maxBucket` are degenerate bands (near-constant content) and
    * are dropped — at corpus scale such a bucket would emit
    * O(bucket²) pairs and is never what dedup wants.
    */
  /** (id, band_idx, band_key) rows of every document — the LSH index
    * entries [[minhashCandidatePairs]] buckets on, exposed so an
    * INCREMENTAL consumer (streaming near-dup, batch-vs-corpus probes)
    * can persist them and probe new arrivals against history without
    * re-signing the corpus. The signature comes from the compiled
    * single-pass kernel; NULL texts contribute no rows.
    */
  def bandKeyRows(df: DataFrame, idCol: String, textCol: String,
      shingleWords: Int = 3, bands: Int = 4,
      rowsPerBand: Int = 4): DataFrame = {
    val sig = df.select(
      col(idCol),
      graft.functions.Kernels.minhashSigOf(col(textCol),
        bands * rowsPerBand, shingleWords).as("sig"))
    sig.select(col(idCol).cast("long").as(idCol),
      posexplode(lshBandKeys(col("sig"), bands, rowsPerBand))
        .as(Seq("band_idx", "band_key")))
  }

  /** Batch-vs-corpus band-key PROBE — the vs_corpus arm of
    * [[graft.streaming.StreamingLift.nearDupStream]], exposed as a
    * batch operator so the streaming arithmetic is oracle-gated by a
    * relational twin (q214): join the batch's band keys against the
    * persisted index on (band_idx, band_key), skip index groups past
    * `maxBucket` rows (a degenerate band would emit O(bucket) pairs
    * per arriving doc) and tombstoned groups (NULL id — the bucketed
    * stream's overflow poisoning), and emit distinct ascending
    * (doc_a, doc_b) pairs. Scale shape: the batch side is the small
    * probe; the group-size window and the join shuffle only
    * fixed-width band keys, never text.
    */
  def bandIndexProbe(index: DataFrame, batchKeys: DataFrame,
      idCol: String, maxBucket: Int = 10000): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band_idx"), col("band_key"))
    val healthy = index
      .withColumn("__tomb", max(when(col(idCol).isNull, 1).otherwise(0)).over(w))
      .withColumn("__bn", count(lit(1)).over(w))
      .filter(col("__tomb") === 0 && col("__bn") <= maxBucket)
      .drop("__tomb", "__bn")
    healthy
      .withColumnRenamed(idCol, "doc_a")
      .join(batchKeys.withColumnRenamed(idCol, "doc_b"),
        Seq("band_idx", "band_key"))
      .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
        greatest(col("doc_a"), col("doc_b")).as("doc_b"))
      .filter(col("doc_a") =!= col("doc_b"))
      .distinct()
  }

  def minhashCandidatePairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleWords: Int = 3, bands: Int = 4, rowsPerBand: Int = 4,
      maxBucket: Int = 10000): DataFrame = {
    // compiled single-pass signature kernel (graft.functions.Kernels):
    // tokenize → shingle → hash → k permutations in one static call
    // inside WholeStageCodegen, bit-identical to the Column form.
    val bandRows = bandKeyRows(df, idCol, textCol, shingleWords, bands,
      rowsPerBand)
    // size-capped collect (bounded aggregation buffers even on a
    // degenerate bucket), then compiled pair expansion (ascending-id
    // i<j pairs).
    val buckets = bandRows
      .groupBy(col("band_idx"), col("band_key"))
      .agg(graft.functions.CappedCollect.cappedLongList(col(idCol), maxBucket).as("cl"))
      .filter(col("cl.n").between(2, maxBucket))
    buckets
      .select(explode(graft.functions.Kernels.sortedPairsOf(col("cl.ids"))).as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .distinct()
  }

  /** Session-cached [[minhashCandidatePairs]]: the banded candidate
    * set over a given corpus is the shared first step of the whole
    * near-dup family (pair listing, dedup, cluster reports, curation
    * funnels) — built once per (SparkContext, key) and pinned
    * ([[graft.util.SessionCache]]; `df`'s content must be a pure
    * function of `key`, i.e. immutable source data).
    */
  def minhashCandidatePairsCached(df: DataFrame, key: String,
      idCol: String, textCol: String,
      shingleWords: Int = 3, bands: Int = 4, rowsPerBand: Int = 4,
      maxBucket: Int = 10000): DataFrame =
    if (!graft.util.SessionCache.enabled(df.sparkSession))
      minhashCandidatePairs(df, idCol, textCol, shingleWords, bands,
        rowsPerBand, maxBucket)
    else graft.util.SessionCache.cached(df.sparkSession,
      s"dedup-pairs:$key:$idCol:$textCol:$shingleWords:$bands:$rowsPerBand:$maxBucket")(
      minhashCandidatePairs(df, idCol, textCol, shingleWords, bands,
        rowsPerBand, maxBucket).cutLineage)

  /** MinHash estimator calibration: for every LSH candidate pair, the
    * signature-agreement Jaccard ESTIMATE (matching positions / k)
    * next to the EXACT shingle-set Jaccard and the absolute error —
    * the measurement a pipeline runs before committing to
    * (bands × rows) parameters at corpus scale.
    *
    * Shape: candidate pairs come from [[minhashCandidatePairs]] (never
    * all-pairs) and are pinned (small); the corpus semi-joins down to
    * pair-touched ids BEFORE any per-doc kernel runs, so signatures
    * and shingle sets are computed for candidates only — one full
    * kernel pass total (inside candidate generation), not three. The
    * per-pair comparison folds two 16-element arrays — interpreted
    * HOFs are fine here because it runs per CANDIDATE, not per row.
    * All counts integer; the two divisions and one subtraction are the
    * only float steps, identical expression trees on both engines.
    */
  def minhashCalibration(
      df: DataFrame, idCol: String, textCol: String,
      shingleWords: Int = 3, bands: Int = 4, rowsPerBand: Int = 4,
      maxBucket: Int = 10000): DataFrame = {
    val k = bands * rowsPerBand
    // the pair set is small (candidates, not corpus) and is read three
    // times below (output spine, touched-id filter, joins) — pin it so
    // the banding lineage runs once, same as propagateLabels' edges
    val pairs = minhashCandidatePairs(df, idCol, textCol, shingleWords,
      bands, rowsPerBand, maxBucket).cutLineage
    // kernel work only for pair-touched docs: semi-join the corpus down
    // to candidate ids FIRST (candidates ≪ corpus), so the signature
    // and shingle-set kernels never run for rows no pair references
    val touched = pairs.select(col("doc_a").as("__fid"))
      .unionByName(pairs.select(col("doc_b").as("__fid"))).distinct()
    // pinned as well: feats feeds BOTH pair-side joins — without the
    // pin the corpus scan + kernels would run once per side
    val feats = df.select(col(idCol).cast("long").as("__fid"), col(textCol))
      .join(touched, Seq("__fid"), "left_semi")
      .select(col("__fid"),
        graft.functions.Kernels.minhashSigOf(col(textCol), k, shingleWords).as("__sig"),
        // sorted once per touched doc → per-pair two-pointer verify
        // (the q139 verify-kernel pattern; exact-jaccard semantics
        // unchanged, the sets are distinct)
        array_sort(graft.functions.Kernels.shingleHashes60Of(
          col(textCol), shingleWords)).as("__sh"))
      .cutLineage
    pairs
      .join(feats.select(col("__fid").as("doc_a"), col("__sig").as("sig_a"),
        col("__sh").as("sh_a")), Seq("doc_a"))
      .join(feats.select(col("__fid").as("doc_b"), col("__sig").as("sig_b"),
        col("__sh").as("sh_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        aggregate(zip_with(col("sig_a"), col("sig_b"),
            (x, y) => when(x === y, lit(1L)).otherwise(lit(0L))),
          lit(0L), (acc, v) => acc + v).as("n_match"),
        graft.functions.Kernels.sortedIntersectCountOf(
          col("sh_a"), col("sh_b")).as("inter"),
        (size(col("sh_a")) + size(col("sh_b"))).cast("long").as("sum_sizes"))
      .select(col("doc_a"), col("doc_b"),
        (col("n_match").cast("double") / k).as("est_jaccard"),
        (col("inter").cast("double") /
          (col("sum_sizes") - col("inter")).cast("double")).as("jaccard"))
      .withColumn("abs_err", abs(col("est_jaccard") - col("jaccard")))
  }

  /** The full τ-sweep of [[minhashCalibration]]: one confusion-matrix
    * row PER candidate threshold, from ONE calibration pass — the
    * operating CURVE an engineer reads to pick the dedup threshold
    * (q98's single-τ audit, swept). The τ fan-out multiplies only the
    * CANDIDATE pairs (already ≪ corpus) by |thresholds| literal rows
    * map-side; the per-τ rollup is one aggregation keyed on τ.
    *
    * Thresholds are integer percents; est/exact Jaccard are the
    * calibration's cross-engine-identical doubles, compared against
    * the same τ/100 double literal on both engines.
    *
    * Output per τ: (tau_pct, n_candidates, n_pred, n_true, n_tp,
    * precision, recall_in_candidates) — ratios null at 0 denominators.
    */
  def lshOperatingCurve(
      df: DataFrame, idCol: String, textCol: String,
      shingleWords: Int = 3, bands: Int = 4, rowsPerBand: Int = 4,
      tausPct: Seq[Int] = Seq(30, 40, 50, 60, 70, 80)): DataFrame = {
    require(tausPct.nonEmpty && tausPct.forall(t => t >= 0 && t <= 100),
      s"thresholds must be percents: $tausPct")
    val cal = minhashCalibration(df, idCol, textCol,
      shingleWords, bands, rowsPerBand)
    cal
      .select(col("est_jaccard"), col("jaccard"),
        explode(array(tausPct.map(t => lit(t.toLong)): _*)).as("tau_pct"))
      .withColumn("__t", col("tau_pct").cast("double") / 100.0)
      .groupBy(col("tau_pct"))
      .agg(
        count(lit(1)).as("n_candidates"),
        count(when(col("est_jaccard") >= col("__t"), lit(1))).as("n_pred"),
        count(when(col("jaccard") >= col("__t"), lit(1))).as("n_true"),
        count(when(col("est_jaccard") >= col("__t") &&
          col("jaccard") >= col("__t"), lit(1))).as("n_tp"))
      .withColumn("precision",
        when(col("n_pred") > 0,
          col("n_tp").cast("double") / col("n_pred").cast("double")))
      .withColumn("recall_in_candidates",
        when(col("n_true") > 0,
          col("n_tp").cast("double") / col("n_true").cast("double")))
  }

  /** Exact n-gram Jaccard similarity for pairs sharing ≥1 shingle,
    * emitted when jaccard ≥ threshold.
    *
    * Shape: ONE pass builds the inverted index (shingle → sorted
    * [(id, setSize)]), each posting list expands to its i<j pairs, and
    * a pair-count gives the intersection — no self-join, so the
    * shingle pipeline is computed once and the only shuffles are the
    * index groupBy and the pair groupBy. Posting-list length is the
    * doc frequency of a shingle; the quadratic expansion on hot
    * shingles is inherent to exact sharing-a-shingle semantics (use
    * `minhashCandidatePairs` as the pre-filter at corpus scale).
    */
  def jaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleWords: Int = 3, threshold: Double = 0.5,
      maxDf: Int = 10000): DataFrame =
    jaccardPairsFrom(
      pairIntersections(df, idCol, textCol, shingleWords, maxDf), threshold)

  /** [[jaccardPairs]] over a PRECOMPUTED intersection frame
    * ([[pairIntersectionsCached]]) — the reuse form when several
    * reports read the same pair-intersection core.
    */
  def jaccardPairsFrom(intersections: DataFrame,
      threshold: Double = 0.5): DataFrame =
    intersections
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))

  /** Exact shingle-set CONTAINMENT for pairs sharing ≥1 shingle:
    * `inter / min(|A|, |B|)` — the asymmetric near-dup signal Jaccard
    * misses (a document embedded whole inside a larger one has low
    * Jaccard but containment ≈ 1; quote-heavy and template-wrapped
    * corpora are full of these). Emitted when containment ≥ num/den,
    * compared as the integer cross-multiplication
    * `den·inter ≥ num·min(na, nb)` — no float threshold edge.
    *
    * Same single-pass inverted-index shape (and `maxDf` boilerplate
    * cap) as [[jaccardPairs]]; at corpus scale run it on
    * [[minhashCandidatePairs]] survivors.
    *
    * Output: (doc_a, doc_b, na, nb, inter, containment).
    */
  def containmentPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleWords: Int = 3, thresholdNum: Long = 1, thresholdDen: Long = 2,
      maxDf: Int = 10000): DataFrame =
    containmentPairsFrom(
      pairIntersections(df, idCol, textCol, shingleWords, maxDf),
      thresholdNum, thresholdDen)

  /** [[containmentPairs]] over a PRECOMPUTED intersection frame
    * ([[pairIntersectionsCached]]). */
  def containmentPairsFrom(intersections: DataFrame,
      thresholdNum: Long = 1, thresholdDen: Long = 2): DataFrame =
    intersections
      .filter(col("inter") * thresholdDen >= least(col("na"), col("nb")) * thresholdNum)
      .withColumn("containment",
        col("inter").cast("double") / least(col("na"), col("nb")).cast("double"))
      .select(col("doc_a"), col("doc_b"), col("na").cast("long").as("na"),
        col("nb").cast("long").as("nb"), col("inter"), col("containment"))

  /** Session-cached [[pairIntersections]] core — the exact
    * pair-intersection table (doc_a, na, doc_b, nb, inter) is the
    * shared substrate of the exact-similarity reports (Jaccard pairs,
    * containment pairs); one inverted-index pass per (SparkContext,
    * key) serves all of them. Same purity contract as
    * [[minhashCandidatePairsCached]].
    */
  def pairIntersectionsCached(df: DataFrame, key: String, idCol: String,
      textCol: String, shingleWords: Int = 3, maxDf: Int = 10000): DataFrame =
    if (!graft.util.SessionCache.enabled(df.sparkSession))
      pairIntersections(df, idCol, textCol, shingleWords, maxDf)
    else graft.util.SessionCache.cached(df.sparkSession,
      s"dedup-inter:$key:$idCol:$textCol:$shingleWords:$maxDf")(
      pairIntersections(df, idCol, textCol, shingleWords, maxDf).cutLineage)

  /** Shared verifier core: exact shingle-set intersection sizes for
    * every pair sharing ≥1 (sub-maxDf) shingle. ONE pass builds the
    * inverted index (shingle → sorted [(id, setSize)]), each posting
    * list expands to its i<j pairs, and a pair-count gives the
    * intersection — no self-join, two shuffles total.
    * Output: (doc_a, na, doc_b, nb, inter).
    */
  private def pairIntersections(
      df: DataFrame, idCol: String, textCol: String,
      shingleWords: Int, maxDf: Int): DataFrame =
    // invert on 60-bit shingle HASHES, not strings: 8-byte shuffle
    // keys; the oracle hashes identically so semantics are unchanged.
    pairIntersectionsOfSets(
      df.select(col(idCol).cast("long").as(idCol),
        graft.functions.Kernels.shingleHashes60Of(col(textCol), shingleWords).as("s")),
      idCol, maxDf)

  /** The same verifier core over ANY per-doc long-hash set column
    * (`(idCol: long, s: array<long>)` — distinct elements): shingle
    * sets, winnowed fingerprint sets, token-hash sets all share it.
    */
  private def pairIntersectionsOfSets(
      sh: DataFrame, idCol: String, maxDf: Int): DataFrame = {
    val inv = sh.select(col(idCol).as("i"), size(col("s")).as("n"),
      explode(col("s")).as("g"))
    // shingles hotter than maxDf are dropped (a df>maxDf shingle is
    // boilerplate that contributes ~nothing to jaccard but O(df²)
    // pairs); the capped collect keeps the buffer bounded either way.
    val lists = inv
      .groupBy(col("g"))
      .agg(graft.functions.CappedCollect.cappedPairList(col("i"), col("n"), maxDf).as("cl"))
      .filter(col("cl.n").between(2, maxDf))
    val pairs = lists.select(
      explode(graft.functions.Kernels.sortedPairsWithSizesOf(col("cl.ids"), col("cl.ns"))).as("p"))
    // na/nb are functions of the id, so they can ride as group keys
    pairs
      .groupBy(col("p.a").as("doc_a"), col("p.na").as("na"),
        col("p.b").as("doc_b"), col("p.nb").as("nb"))
      .agg(count(lit(1)).as("inter"))
  }

  /** Incremental near-dup candidates: pairs (batch doc, corpus doc)
    * sharing an LSH band key — the daily-ingest path. The corpus is
    * NEVER compared against itself (that work happened when each prior
    * batch arrived), so the cost scales with |batch| + the touched
    * band buckets, not |corpus|²; at deployment the corpus band table
    * is precomputed and stored bucketed on (band_idx, band_key) so
    * this join prunes to the batch's buckets.
    *
    * Output: (batch_id, corpus_id) candidate pairs; verify with
    * `jaccardPairs`-style exact scoring or treat band agreement as the
    * dedup signal (same trade as q18 vs q19).
    */
  def incrementalCandidates(
      corpus: DataFrame, batch: DataFrame, idCol: String, textCol: String,
      shingleWords: Int = 3, bands: Int = 4, rowsPerBand: Int = 4,
      maxBucket: Int = 10000): DataFrame = {
    def bandRows(df: DataFrame) = df.select(
      col(idCol).cast("long").as(idCol),
      graft.functions.Kernels.minhashSigOf(col(textCol), bands * rowsPerBand, shingleWords).as("sig"))
      .select(col(idCol),
        posexplode(lshBandKeys(col("sig"), bands, rowsPerBand)).as(Seq("band_idx", "band_key")))
    // bounded collects on BOTH sides; bucket-size caps apply per side
    def buckets(df: DataFrame, out: String) = bandRows(df)
      .groupBy(col("band_idx"), col("band_key"))
      .agg(graft.functions.CappedCollect.cappedLongList(col(idCol), maxBucket).as("cl"))
      .filter(col("cl.n") <= maxBucket)
      .select(col("band_idx"), col("band_key"), col("cl.ids").as(out))
    buckets(batch, "batch_ids")
      .join(buckets(corpus, "corpus_ids"), Seq("band_idx", "band_key"))
      .select(explode(col("batch_ids")).as("batch_id"), col("corpus_ids"))
      .select(col("batch_id"), explode(col("corpus_ids")).as("corpus_id"))
      .distinct()
  }

  /** Keep-one-per-near-dup-cluster: connected components over a
    * candidate-pair edge list by iterative min-label propagation, to
    * fixpoint. Every doc maps to the minimum id reachable from it
    * (singletons map to themselves) — the survivor its cluster keeps.
    *
    * Scale notes: iterations = cluster diameter with the default
    * `"propagate"` algorithm (near-dup clusters are shallow);
    * per-iteration lineage is cut with [[graft.util.Pin]] so the plan
    * does not grow exponentially; each iteration is one broadcast-able
    * join + groupBy on the edge list (edges ≪ corpus). For adversarial
    * graphs (long chains, billion-edge components) pass
    * `algorithm = "star"` — the large-star/small-star alternation
    * converges in O(log²) rounds regardless of diameter.
    */
  def nearDupSurvivors(docs: DataFrame, pairs: DataFrame, idCol: String,
      algorithm: String = "propagate"): DataFrame = {
    val clustered = (algorithm match {
      case "star"      => starContract(pairs)
      case "propagate" => propagateLabels(pairs)
      case other => throw new IllegalArgumentException(
        s"unknown algorithm '$other' (expected propagate|star)")
    }).select(col("node").as(idCol), col("label").as("keep_id"))
    // untouched docs trivially keep themselves (map-side union); with
    // "star" the cluster minima also land here — they keep themselves
    // too, so the output is identical across algorithms.
    val singletons = docs.select(col(idCol))
      .join(clustered.select(col(idCol)), Seq(idCol), "left_anti")
      .withColumn("keep_id", col(idCol))
    clustered.unionByName(singletons)
  }

  /** Session-cached [[nearDupSurvivors]]: the (doc → keep_id) cluster
    * assignment is the shared second step of the near-dup reports
    * (dedup output, dedup report, cluster-size histogram, curation
    * funnel) — the fixpoint loop runs once per (SparkContext, key,
    * algorithm) and later queries read the pinned assignment. Same
    * purity contract as [[minhashCandidatePairsCached]]; key BOTH
    * frames' provenance into `key` (corpus + pair parameters).
    */
  def nearDupSurvivorsCached(docs: DataFrame, pairs: DataFrame,
      key: String, idCol: String,
      algorithm: String = "propagate"): DataFrame =
    if (!graft.util.SessionCache.enabled(docs.sparkSession))
      nearDupSurvivors(docs, pairs, idCol, algorithm)
    else graft.util.SessionCache.cached(docs.sparkSession,
      s"dedup-surv:$key:$idCol:$algorithm")(
      nearDupSurvivors(docs, pairs, idCol, algorithm).cutLineage)

  /** Min-label propagation over edge-touched nodes, to fixpoint.
    * Rounds = cluster diameter. Iterates ONLY over edge-touched
    * nodes — dup clusters are a tiny fraction of a corpus, so the
    * loop never scans the full table.
    */
  private def propagateLabels(pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .unionByName(pairs.select(col("doc_b").as("u"), col("doc_a").as("v")))
      .cutLineage
    // seed with the 1-hop minimum (what round one would compute from
    // identity labels) — same fixpoint, one fewer join round
    var labels = edges.groupBy(col("u").as("node"))
      .agg(least(min(col("v")), first(col("u"))).as("label"))
      .cutLineage
    var changed = 1L
    while (changed > 0) {
      // the loop var stays a DIRECT cut (carrying oldlabel alongside)
      // so cutLineageReplacing reclaims every superseded round's
      // checkpoint — Pin.retire is deliberately non-transitive
      val neighborMin = edges
        .join(labels.select(col("node"), col("label")), col("v") === col("node"))
        .groupBy(col("u")).agg(min(col("label")).as("nlabel"))
      val updated = labels.select(col("node"), col("label"))
        .join(neighborMin, col("node") === col("u"), "left")
        .select(col("node"), col("label").as("oldlabel"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        .cutLineageReplacing(labels)
      changed = updated.filter(col("label") < col("oldlabel")).count()
      labels = updated
    }
    labels.select(col("node"), col("label"))
  }

  /** Large-star/small-star alternation (the MapReduce connected-
    * components algorithm of Kiveris et al., "Connected Components in
    * MapReduce and Beyond", SoCC'14 — public algorithm): same
    * min-label result as [[propagateLabels]] but O(log²) rounds
    * independent of component diameter, so a million-node chain
    * finishes in ~20 rounds instead of a million. Each round is two
    * groupBy+join passes over the (shrinking) edge list.
    *
    * At convergence every component is a star centered on its minimum
    * node: the directed edge set IS the (node → label) map; centers
    * appear only as labels and fall through to the singleton path.
    */
  private def starContract(pairs: DataFrame): DataFrame = {
    def canonical(e: DataFrame): DataFrame = e
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    // edge-set fingerprint for the convergence FAST PATH: one agg per
    // side instead of two exceptAll shuffles. bit_xor is
    // order-independent and overflow-free (ANSI-safe); edges are
    // distinct so no self-cancellation. A fingerprint match alone is
    // not proof (a ~2^-64 collision between different edge sets would
    // end the loop early and emit wrong cluster labels — silent data
    // loss in a dedup pipeline), so a match is CONFIRMED by one
    // exceptAll set-compare; it runs once, at convergence, and both
    // sides are distinct with equal counts so one direction suffices.
    def sig(e: DataFrame) = e
      .agg(count(lit(1)), coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L))).head()
    var edges = canonical(
      pairs.select(col("doc_a").as("u"), col("doc_b").as("v")))
      .cutLineage
    var done = edges.isEmpty
    var prevSig = if (done) null else sig(edges) // carried: one sig job per round
    while (!done) {
      // large-star: every node attaches its strictly-larger neighbors
      // to the minimum of its closed neighborhood
      val sym = edges.unionByName(edges.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy(col("u"))
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      val ls = sym.join(mins, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v")).distinct()
      // small-star: every node attaches itself and its smaller
      // neighbors to the minimum of its smaller neighborhood
      val mins2 = ls.groupBy(col("u")).agg(min(col("v")).as("m"))
      val ss = canonical(ls.join(mins2, "u")
        .select(explode(array(
          struct(col("v").as("u"), col("m").as("v")),
          struct(col("u").as("u"), col("m").as("v")))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v")))
        .cutLineage
      val ssSig = sig(ss)
      done = ssSig == prevSig && ss.exceptAll(edges).isEmpty
      prevSig = ssSig
      // retire AFTER the exceptAll set-compare that reads the old round
      graft.util.Pin.retire(edges)
      edges = ss
    }
    edges.select(col("u").as("node"), col("v").as("label"))
  }

  /** 60-bit SimHash per document (near-dup docs differ in few bits;
    * pair generation would bucket on a simhash prefix — same banding
    * idea as minhash).
    */
  def simhashes(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      graft.functions.Kernels.simhash60Of(col(textCol)).as("simhash"))

  /** Rolling polynomial fingerprint per document (cheap pre-filter:
    * equal fingerprints → verify with `jaccardPairs`).
    */
  def fingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      graft.functions.Kernels.fingerprintOf(col(textCol)).as("fingerprint"))

  /** WINNOWING fingerprint selection (the MOSS algorithm): from the
    * positional stream of `shingleWords`-gram hashes, every sliding
    * window of `window` consecutive hashes selects its minimum (ties →
    * the RIGHTMOST, the published tie rule), and the distinct selected
    * (position, hash) pairs are the document's fingerprints. The
    * guarantee: any shared substring of ≥ window+shingleWords-1 tokens
    * yields at least one shared fingerprint, with ~2/(window+1) of the
    * hash stream retained — position-robust overlap detection at a
    * fraction of the full shingle index's size.
    *
    * Entirely map-side, one compiled pass per document
    * ([[graft.functions.Kernels.winnowSelect]] — a StaticInvoke inside
    * WholeStageCodegen; the HOF-expression form was O(m²·w) because
    * Catalyst inlines the hash-array alias into every interpreted
    * lambda element). Documents shorter than one shingle select
    * nothing (explode drops them), and a hash stream shorter than
    * `window` yields its single global minimum. Downstream, join on
    * `fp` for overlap candidates — the index it feeds is |selected|
    * rows, not |positions|.
    *
    * Output: (idCol, pos, fp) — pos is the 1-based shingle position.
    */
  def winnow(df: DataFrame, idCol: String, textCol: String,
      shingleWords: Int = 3, window: Int = 4): DataFrame = {
    require(shingleWords >= 1 && window >= 1,
      s"need positive shingleWords/window: $shingleWords/$window")
    df.select(col(idCol), explode(graft.functions.Kernels.winnowSelectOf(
        col(textCol), shingleWords, window)).as("s"))
      .select(col(idCol), col("s.pos").as("pos"), col("s.fp").as("fp"))
  }

  /** Overlap pairs over WINNOWED fingerprint sets: the same
    * inverted-index pair verification as [[jaccardPairs]] /
    * [[containmentPairs]], but over the ~2/(window+1)-thinned
    * fingerprint sets [[winnow]] selects — the index (and every
    * shuffle) is a fraction of the full shingle index's size, at the
    * cost of winnowing's sampling guarantee instead of exactness.
    * Overlap = inter / min(|A|, |B|) over the DISTINCT fingerprint
    * hashes; threshold compared as the integer cross-multiplication.
    *
    * Output: (doc_a, doc_b, na, nb, inter, overlap).
    */
  def winnowOverlapPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleWords: Int = 3, window: Int = 4,
      thresholdNum: Long = 1, thresholdDen: Long = 2,
      maxDf: Int = 10000): DataFrame = {
    require(shingleWords >= 1 && window >= 1,
      s"need positive shingleWords/window: $shingleWords/$window")
    pairIntersectionsOfSets(
      df.select(col(idCol).cast("long").as(idCol),
        graft.functions.Kernels.winnowFpsOf(
          col(textCol), shingleWords, window).as("s")),
      idCol, maxDf)
      .filter(col("inter") * thresholdDen >= least(col("na"), col("nb")) * thresholdNum)
      .withColumn("overlap",
        col("inter").cast("double") / least(col("na"), col("nb")).cast("double"))
      .select(col("doc_a"), col("doc_b"), col("na").cast("long").as("na"),
        col("nb").cast("long").as("nb"), col("inter"), col("overlap"))
  }

  /** Sorted-neighborhood (merge/purge) candidate pairs — the
    * Hernández–Stolfo blocking strategy (SIGMOD'95; public algorithm):
    * sort the corpus by a blocking key and emit every pair within a
    * sliding window of `window` consecutive records. The complement to
    * LSH blocking: it catches near-dups that agree on an ORDERABLE
    * surrogate (length, normalized title, timestamp) even when their
    * shingle sets have drifted past MinHash's reach.
    *
    * Distributed shape — no single-partition sort anywhere:
    * the global rank over (key, id) decomposes into "rows with a
    * strictly smaller key" (a [[Sweep.runningSum]] prefix over the
    * key's VALUE DOMAIN — two small shuffles) plus a per-key
    * `row_number` window (distributed by key). Pairing then needs no
    * sliding window at all: ranks are dense and unique, so bucket
    * `⌊(rank−1)/window⌋` holds exactly `window` rows, and every
    * in-window pair lives in one bucket or two adjacent ones — a
    * bounded equi-join (each row meets ≤ 2·window candidates), never
    * a rank-range theta join.
    *
    * Output: (doc_a, doc_b, dist) — doc_a precedes doc_b in sort
    * order, dist = rank gap ∈ [1, window−1]. Null keys are dropped
    * (they have no position in the sort order).
    */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String, keyCol: String,
      window: Int = 5): DataFrame = {
    require(window >= 2, s"need window >= 2: $window")
    val rows = df.select(col(idCol).cast("long").as("__id"),
        col(keyCol).cast("long").as("__k"))
      .filter(col("__k").isNotNull)
    val counts = rows.groupBy(col("__k")).agg(count(lit(1)).as("__n"))
    val offsets = Sweep.runningSum(counts, "__k", "__n")
      .select(col("t").as("__k"), (col("running") - col("d")).as("__off"))
    val perKey = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__k")).orderBy(col("__id"))
    val ranked = rows
      .withColumn("__rn", row_number().over(perKey).cast("long"))
      .join(offsets, Seq("__k"))
      .select(col("__id"), (col("__off") + col("__rn")).as("__rank"))
    val r1 = ranked.select(col("__id").as("doc_a"), col("__rank").as("__ra"),
      expr(s"(__rank - 1) DIV $window").as("__b"))
    val r2 = ranked.select(col("__id").as("doc_b"), col("__rank").as("__rb"),
      explode(array(expr(s"(__rank - 1) DIV $window"),
        expr(s"(__rank - 1) DIV $window - 1"))).as("__jb"))
    r1.join(r2, col("__b") === col("__jb") &&
        col("__rb") > col("__ra") && col("__rb") - col("__ra") < window)
      .select(col("doc_a"), col("doc_b"), (col("__rb") - col("__ra")).as("dist"))
  }

  /** PREFIX-FILTERED exact Jaccard join (the PPJoin/AllPairs candidate
    * strategy — Xiao et al. WWW'08, Bayardo et al. WWW'07; public
    * algorithms): order every document's shingle set by ascending
    * global document frequency (rarest first, ties by hash — one total
    * order corpus-wide) and index ONLY each set's first
    * `n − ⌈t·n⌉ + 1` elements. Any pair with Jaccard ≥ t must share a
    * prefix element under that common order, so the candidate set is
    * complete — but the inverted index holds prefixes of the RAREST
    * shingles, so posting lists stay short by construction instead of
    * by a `maxDf` drop cap. The structurally different third strategy
    * next to [[jaccardPairs]] (full index, hot lists capped) and
    * [[minhashCandidatePairs]] (probabilistic banding): exact AND
    * small-index.
    *
    * Shape at scale: one corpus pass computes shingle sets; the df
    * aggregation and the doc-side re-sort are shuffles of the (doc,
    * shingle-hash) stream — 8-byte keys, bounded by corpus token
    * volume; candidates expand map-side from per-prefix-token sorted
    * posting lists (CappedCollect keeps degenerate-corpus buffers
    * bounded; sub-threshold size-ratio pairs are cut BEFORE
    * verification by the t·max ≤ min length filter). Verification
    * recomputes shingle sets only for candidate-TOUCHED docs (semi-
    * join first, kernel after), so the full corpus is never pinned.
    * Every threshold comparison is an integer cross-multiplication.
    *
    * Output: (doc_a, doc_b, jaccard) with jaccard ≥ num/den, doc_a <
    * doc_b.
    */
  def prefixFilterPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleWords: Int = 3, thresholdNum: Long = 1, thresholdDen: Long = 2,
      maxList: Int = 100000): DataFrame = {
    require(thresholdNum >= 1 && thresholdDen >= thresholdNum,
      s"need 0 < threshold <= 1: $thresholdNum/$thresholdDen")
    val ids = df.select(col(idCol).cast("long").as("__id"), col(textCol).as("__text"))
    val sets = ids.select(col("__id"),
      graft.functions.Kernels.shingleHashes60Of(col("__text"), shingleWords).as("s"))
      .filter(size(col("s")) > 0)
    // re-sort each doc's set rarest-first and keep the prefix; the
    // collect is the doc's own shingle set (bounded by doc length),
    // prefix length p = n - ceil(t*n) + 1 in exact integer math
    // positions ride the existing int payload packed as
    // min(n, 32767)·2¹⁶ + min(pos, 32767); position within the prefix
    // IS the position within the full rarest-first sorted set (the
    // prefix is its head). The saturation cap only loosens the prune
    // (smaller pos ⇒ larger upper bound; saturated sizes skip the
    // positional filter entirely) — never drops a J ≥ t pair.
    val Pk = 32767
    // global rarity statistic: df per shingle hash. Deliberately a
    // groupBy + join-back (NOT a window count over the exploded
    // stream): the join lets AQE broadcast the df table when it fits
    // and fall back to sort-merge when it does not, while the window
    // form forces the full posting-stream sort at every scale —
    // measured 0.5 s slower at sf0.1. The price is that the shingle
    // kernel runs over the corpus twice (the aggregate subtree and the
    // probe side project differently, so exchange reuse cannot dedupe
    // them); the kernel pass is ~0.3 s at sf0.1, cheaper than the sort.
    val freq = sets.select(explode(col("s")).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("df"))
    val prefixes = sets
      .select(col("__id"), size(col("s")).as("n"), explode(col("s")).as("g"))
      .join(freq, Seq("g"))
      .groupBy(col("__id"), col("n"))
      .agg(collect_list(struct(col("df"), col("g"))).as("toks"))
      .select(col("__id").as("i"), col("n"),
        posexplode(expr(
          s"""transform(slice(array_sort(toks), 1,
               cast(n - (($thresholdNum * n + ${thresholdDen - 1}) div $thresholdDen) + 1 as int)),
             x -> x.g)""")).as(Seq("pos", "g")))
    val lists = prefixes
      .groupBy(col("g"))
      .agg(graft.functions.CappedCollect.cappedPairList(
        col("i"),
        (least(col("n"), lit(Pk)) * 65536 + least(col("pos"), lit(Pk)))
          .cast("int"),
        maxList).as("cl"))
      .filter(col("cl.n").between(2, maxList))
    val alpha = // minimum overlap J >= t implies: ceil(t(na+nb)/(1+t))
      expr(s"($thresholdNum * (na + nb) + ${thresholdNum + thresholdDen - 1})" +
        s" div ${thresholdNum + thresholdDen}")
    val cands = lists
      .select(explode(graft.functions.Kernels.sortedPairsWithSizesOf(
        col("cl.ids"), col("cl.ns"))).as("p"))
      .select(col("p.a").as("doc_a"), expr("p.na div 65536").as("na"),
        expr("p.na % 65536").as("pa"),
        col("p.b").as("doc_b"), expr("p.nb div 65536").as("nb"),
        expr("p.nb % 65536").as("pb"))
      .groupBy(col("doc_a"), col("na"), col("doc_b"), col("nb"))
      .agg(count(lit(1)).as("__npref"),
        max(col("pa")).as("__mpa"), max(col("pb")).as("__mpb"))
      // J >= t forces min(|A|,|B|)/max(|A|,|B|) >= t
      .filter(least(col("na"), col("nb")).cast("long") * thresholdDen >=
        greatest(col("na"), col("nb")).cast("long") * thresholdNum)
      // PPJoin positional suffix bound: common elements ≤ the LAST
      // shared prefix token are exactly the shared prefix tokens
      // (suffixes hold each set's largest elements), so
      // overlap ≤ npref + min(remaining after that token on each side);
      // prune pairs that cannot reach the α overlap J ≥ t demands
      .filter(col("na") >= Pk || col("nb") >= Pk ||
        col("__npref") + least(col("na") - 1 - col("__mpa"),
          col("nb") - 1 - col("__mpb")) >= alpha)
    // exact verification for candidate-touched docs only. Deliberately
    // UNPINNED: the candidate pipeline's final exchange is reused by
    // all three consumers (the touched-doc set and both verification
    // joins), so the pipeline executes once as-is; pinning cands/feats
    // was measured 1.0 s SLOWER at sf0.1 (two eager checkpoint jobs
    // against work exchange reuse already deduplicates). The
    // touched-doc kernel pass does run once per join side — bounded by
    // candidate-touched docs, not the corpus.
    val touched = cands.select(col("doc_a").as("__id"))
      .unionByName(cands.select(col("doc_b").as("__id"))).distinct()
    // shingle sets sorted ONCE per touched document so the per-PAIR
    // verification below is a zero-allocation two-pointer count
    // (Kernels.sortedIntersectCount) instead of a hash-set build +
    // intersection-array materialization per candidate pair — the
    // verify stage is the query's profiled hot spot and pairs
    // outnumber touched docs
    val feats = ids.join(touched, Seq("__id"), "left_semi")
      .select(col("__id"),
        array_sort(graft.functions.Kernels.shingleHashes60Of(
          col("__text"), shingleWords)).as("sh"))
    cands
      .join(feats.select(col("__id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(feats.select(col("__id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        graft.functions.Kernels.sortedIntersectCountOf(
          col("sh_a"), col("sh_b")).as("inter"),
        (size(col("sh_a")) + size(col("sh_b"))).cast("long").as("sum_sizes"))
      .filter(col("inter") * thresholdDen >=
        (col("sum_sizes") - col("inter")) * thresholdNum)
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") /
          (col("sum_sizes") - col("inter")).cast("double")).as("jaccard"))
  }

  /** Dedup-aware effective dataset size per class: weight every
    * document 1/|its near-dup cluster| (soft dedup — keep duplicates
    * but down-weight them so a 1000-copy boilerplate page contributes
    * one document's worth of gradient) and report, per `classCol`:
    * document count, clusters touched, the summed weight in exact ppm
    * (`⌊10⁶/cluster size⌋` per doc), and the mean per-doc weight
    * (`effective_ppm` — 10⁶ means the class is duplicate-free). The
    * number a mixture owner compares against raw counts before
    * weighting sources.
    *
    * Cluster sizes are counted over the WHOLE corpus, so a cluster
    * straddling classes down-weights all of its members — the same
    * rule leakage-safe splitting applies: the cluster, not the row, is
    * the unit.
    *
    * Shape at scale: one aggregation per cluster key (two longs a
    * row), one join back keyed on that same cluster key (AQE
    * broadcasts the size table when small; co-partitioned otherwise),
    * then two STACKED hash aggregations — (class, cluster) pre-reduce,
    * class rollup — so the distinct-cluster count needs no
    * mixed-distinct Expand (which would double the map-side row
    * stream; the q48 rule) and never a second pass over text. All
    * weights integer ppm: sums are order-independent on every engine.
    *
    * @param tagged document rows already carrying a cluster key
    *   (e.g. [[nearDupSurvivors]]' keep_id joined on)
    */
  def effectiveSize(tagged: DataFrame, clusterCol: String,
      classCol: String): DataFrame = {
    val sizes = tagged.groupBy(col(clusterCol))
      .agg(count(lit(1)).as("__csize"))
    tagged.join(sizes, Seq(clusterCol))
      // (class, cluster) pre-reduce: __w_ppm is constant within the
      // group (it derives from the cluster's corpus-wide size), so
      // max() is a deterministic carry, not a choice
      .groupBy(col(classCol), col(clusterCol))
      .agg(count(lit(1)).as("__n"),
        max(expr("1000000L DIV __csize")).as("__w"))
      .groupBy(col(classCol))
      .agg(sum(col("__n")).cast("long").as("n_docs"),
        count(lit(1)).as("n_clusters"),
        sum(col("__n") * col("__w")).cast("long").as("sum_weight_ppm"))
      .withColumn("effective_ppm", expr("sum_weight_ppm DIV n_docs"))
  }
}
