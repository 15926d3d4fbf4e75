package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] n-gram language-model statistics and a BPE tokenizer-training
  * step — the counting passes a pretraining pipeline runs over the
  * corpus before any model sees it.
  *
  * Shape at scale: both operators are explode → count aggregations
  * whose shuffle keys are the n-grams/pairs themselves — uniform,
  * bounded-width keys; the expansion factor is ×(tokens per doc) resp.
  * ×(chars per word), linear in corpus size with no doc×doc term.
  * All outputs are exact integer counts.
  */
object NgramLm {

  /** Corpus trigram table with Kneser–Ney continuation counts:
    * for every trigram (w1, w2, w3), `c` = its occurrence count and
    * `cont` = the number of DISTINCT left contexts w1' such that
    * (w1', w2, w3) occurs — the N1+(·, w2, w3) statistic KN smoothing
    * divides by. Documents shorter than 3 tokens contribute nothing.
    *
    * Two aggregations: occurrence counts shuffle on the trigram, and
    * the continuation count is a window COUNT over (w2, w3) of the
    * already-aggregated (distinct-trigram) rows — it never revisits
    * the token stream, so its input is bounded by |vocab|³, not corpus
    * size.
    */
  def trigramLm(df: DataFrame, textCol: String): DataFrame = {
    val toks = graft.functions.TextKernels.tokens(col(textCol))
    val tri = df.select(toks.as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(explode(expr(
        """transform(sequence(1, size(toks) - 2),
             i -> struct(toks[i - 1] AS w1, toks[i] AS w2, toks[i + 1] AS w3))"""))
        .as("t"))
      .groupBy(col("t.w1").as("w1"), col("t.w2").as("w2"), col("t.w3").as("w3"))
      .agg(count(lit(1)).as("c"))
    tri.withColumn("cont",
      count(lit(1)).over(Window.partitionBy("w2", "w3")).cast("long"))
  }

  /** ADJACENT-bigram collocation strength — the phrase-detection pass
    * (word2vec-style "new_york" merging) run before tokenizer
    * training: for every bigram (w1, w2) with `c_ab ≥ minCount`,
    * `lift_ppm = ⌊10⁶ · c_ab · N / (c_a · c_b)⌋` where `c_a`/`c_b` are
    * the POSITIONAL marginals (w1 as a bigram's first word, w2 as a
    * second word) and N the corpus bigram count — so lift =
    * p(ab)/(p(a·)·p(·b)) over one consistent distribution, computed as
    * ONE exact integer division (no `log`, whose last-ulp rounding
    * differs across libm builds; lift ranks pairs identically to PMI).
    * Distinct from [[graft.ops.TfIdf.pmiPairs]], which scores
    * DOCUMENT-level co-occurrence: this is sequence adjacency.
    *
    * Shape at scale: explode → count keyed on the bigram; marginals
    * are window sums over the already-aggregated distinct-bigram rows
    * (bounded by |vocab|², never the token stream); N rides in on a
    * broadcast 1-row cross join. The decimal(38,0) widening keeps
    * 10⁶·c_ab·N exact to N ≈ 10¹⁶ bigrams (~400 PB of text).
    */
  def bigramLift(df: DataFrame, textCol: String,
      minCount: Long = 5L): DataFrame = {
    val toks = graft.functions.TextKernels.tokens(col(textCol))
    val bi = df.select(toks.as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(toks) - 1),
             i -> struct(toks[i - 1] AS w1, toks[i] AS w2))""")).as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("c_ab"))
    val tot = bi.agg(sum(col("c_ab")).as("n_bi"))
    bi.withColumn("c_a",
        sum(col("c_ab")).over(Window.partitionBy("w1")).cast("long"))
      .withColumn("c_b",
        sum(col("c_ab")).over(Window.partitionBy("w2")).cast("long"))
      .filter(col("c_ab") >= minCount)
      .crossJoin(broadcast(tot))
      .withColumn("lift_ppm", expr(
        """CAST((1000000 * CAST(c_ab AS DECIMAL(38,0)) * n_bi)
             DIV (CAST(c_a AS DECIMAL(38,0)) * c_b) AS BIGINT)"""))
      .select(col("w1"), col("w2"), col("c_ab"), col("c_a"), col("c_b"),
        col("lift_ppm"))
  }

  /** Vocabulary-growth curve (the Heaps'-law audit a corpus owner
    * reads before sizing a tokenizer): new distinct words per
    * `bucketSize`-doc ingest bucket and the running vocabulary size.
    * Computed from FIRST OCCURRENCES — each word contributes one row
    * at `min(doc id)` — so there is no running-distinct state: one
    * shuffle keyed on the word (the same key distinct vocabulary
    * needs), then a bucket aggregation bounded by #buckets and
    * [[Sweep.runningSum]]'s distributed prefix sum over those rows
    * (never a one-partition ORDER BY window — at fine bucket sizes
    * the bucket count approaches |vocab|). A naive cumulative
    * COUNT(DISTINCT) over doc prefixes would re-scan the token stream
    * per checkpoint.
    */
  def vocabGrowth(df: DataFrame, idCol: String, textCol: String,
      bucketSize: Long = 100L): DataFrame = {
    require(bucketSize > 0, s"bucketSize must be positive: $bucketSize")
    import graft.util.Pin.PinOps
    val toks = graft.functions.TextKernels.tokens(col(textCol))
    val firstSeen = df.select(col(idCol).as("__doc"), explode(toks).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(min(col("__doc")).as("first_doc"))
    // pin before the prefix sum: runningSum's internal bounds action
    // would otherwise execute the tokenize/explode lineage once for
    // min/max and the returned plan a second time — a double corpus
    // scan for a frame bounded by min(#buckets, |vocab|) rows
    val perBucket = firstSeen
      .groupBy(expr(s"first_doc DIV $bucketSize").as("bucket"))
      .agg(count(lit(1)).as("n_new_words"))
      .cutLineage
    // cumulative vocabulary via the distributed two-phase prefix sum:
    // the rows here are bounded by min(#buckets, |vocab|) — at
    // bucketSize = 1 that is |vocab|-ish, enough to make a bare
    // `sum over (order by bucket)` a one-partition funnel (the q72
    // discipline; q132 solves the same audit the same way)
    Sweep.runningSum(perBucket, "bucket", "n_new_words")
      .select(col("t").as("bucket"), col("d").as("n_new_words"),
        col("running").as("cum_vocab"))
  }

  /** Per-document LM score — the perplexity-filter analogue a
    * pretraining pipeline runs to rank documents by how "model-like"
    * their text is, with every statistic integer-exact so the score is
    * bit-identical on any engine (no `log`, whose last-ulp rounding
    * differs between libm implementations; a monotone transform of the
    * mean probability ranks documents identically).
    *
    * Train/score split: the LM is the trigram MLE estimated on
    * `trainFilter` documents only (e.g. `col("doc_id") % 2 === 0` for
    * a held-in half); ALL documents are scored, so held-out docs see
    * genuine OOV mass. Context counts are derived by re-aggregating
    * the trigram table itself (`c_ctx(w1,w2) = Σ_w3 c3`), so
    * p(w3|w1,w2) = c3/c_ctx normalizes exactly and the token stream is
    * walked once.
    *
    * Each scored trigram slot contributes the QUANTIZED probability
    * `q = ⌊c3·2³⁰ / c_ctx⌋` (integer floor-divide, widened through
    * decimal so corpus-scale counts cannot overflow the multiply);
    * unseen trigram in a seen context → q=0; unseen context → the slot
    * is excluded from the mean and counted in `n_noctx`. The doc score
    * `mean_q = Σq / (n_ctx·2³⁰)` is one division of exact longs.
    *
    * Shape at scale: explode → two shuffle joins keyed on the gram
    * (LM side is bounded by distinct trigrams, ≪ corpus; AQE
    * broadcasts it when small) → per-doc reduce with map-side partials.
    *
    * Output: (idCol, n_slots, n_ctx, n_hit, n_noctx, sum_q, mean_q).
    */
  /** Session-cached [[docLmScore]]: the per-doc LM scoring table
    * (one narrow row per document — bounded, unlike the corpus token
    * stream) is shared by the raw LM-score report and any composite
    * quality scorecard reading it. The caller's `key` must describe
    * BOTH the corpus and the `trainFilter` (a Column is not a cache
    * key), same purity contract as the other SessionCache users.
    */
  def docLmScoreCached(df: DataFrame, key: String, idCol: String,
      textCol: String, trainFilter: Column): DataFrame = {
    import graft.util.Pin.PinOps
    if (!graft.util.SessionCache.enabled(df.sparkSession))
      docLmScore(df, idCol, textCol, trainFilter)
    else graft.util.SessionCache.cached(df.sparkSession,
      s"lmscore:$key:$idCol:$textCol")(
      docLmScore(df, idCol, textCol, trainFilter).cutLineage)
  }

  def docLmScore(df: DataFrame, idCol: String, textCol: String,
      trainFilter: Column): DataFrame = {
    val lm = trigramLm(df.filter(trainFilter), textCol)
      .select(col("w1"), col("w2"), col("w3"), col("c").as("c3"))
    val ctx = lm.groupBy("w1", "w2").agg(sum(col("c3")).as("c_ctx"))
    val toks = graft.functions.TextKernels.tokens(col(textCol))
    val slots = df.select(col(idCol), toks.as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col(idCol), explode(expr(
        """transform(sequence(1, size(toks) - 2),
             i -> struct(toks[i - 1] AS w1, toks[i] AS w2, toks[i + 1] AS w3))"""))
        .as("t"))
      .select(col(idCol), col("t.w1").as("w1"), col("t.w2").as("w2"),
        col("t.w3").as("w3"))
    slots
      .join(lm, Seq("w1", "w2", "w3"), "left")
      .join(ctx, Seq("w1", "w2"), "left")
      .withColumn("q", when(col("c_ctx").isNull, lit(null))
        .otherwise(expr(
          "CAST(CAST(coalesce(c3, 0L) AS DECIMAL(38,0)) * 1073741824 div c_ctx AS BIGINT)")))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_slots"),
        count(col("c_ctx")).as("n_ctx"),
        count(col("c3")).as("n_hit"),
        (count(lit(1)) - count(col("c_ctx"))).as("n_noctx"),
        sum(col("q")).as("sum_q"))
      .withColumn("mean_q", when(col("n_ctx") > 0,
        col("sum_q").cast("double") /
          (col("n_ctx") * 1073741824L).cast("double")))
  }

  /** One BPE merge-iteration count: occurrences of each adjacent
    * character pair inside tokens, over ALL token occurrences (BPE
    * counts the corpus, not the vocabulary), top `k` pairs by
    * (count desc, pair asc) — the pair a tokenizer trainer would merge
    * next, with a total order so the result is engine-independent.
    *
    * Output: (pair, n_occ), `k` rows via TakeOrderedAndProject (no
    * global sort materializes).
    */
  def bpePairStep(df: DataFrame, textCol: String, k: Int = 20): DataFrame = {
    val toks = graft.functions.TextKernels.tokens(col(textCol))
    df.select(explode(toks).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("n_occ"))
      .orderBy(col("n_occ").desc, col("pair").asc)
      .limit(k)
  }

  /** Full multi-round BPE tokenizer TRAINING (Sennrich–Haddow–Birch,
    * "Neural Machine Translation of Rare Words with Subword Units",
    * ACL 2016 — the public algorithm): starting from per-character
    * symbols, each round merges the corpus-wide most frequent adjacent
    * symbol pair and re-symbolizes, producing the ordered merge table
    * a tokenizer ships. Where [[bpePairStep]] is one counting step,
    * this APPLIES the merges.
    *
    * Deterministic everywhere: the winning pair breaks ties
    * lexicographically (count desc, left asc, right asc), and merge
    * application is GREEDY LEFT-TO-RIGHT — inside a run of overlapping
    * matches (e.g. `aaa` under pair (a,a)) the 1st, 3rd, … occurrences
    * merge — expressed relationally as gaps-and-islands windows
    * (mark → island id = pos − row_number → keep odd ranks → drop the
    * consumed successor via lag), so an unrolled SQL oracle replays
    * the identical trajectory with the identical windows.
    *
    * Scale shape: the symbol table is built over DISTINCT words
    * weighted by occurrence count (the classic trainer trick — the
    * corpus is scanned once to count words; every round then touches
    * |vocab| × word-length rows, not the corpus). Per round: one
    * lead-window pair pass, one weighted count keyed on the pair, a
    * 1-row TakeOrdered argmax to the driver (the sanctioned scalar —
    * the k-means centroid rule), three per-word windows (bounded by
    * word length), and a [[graft.util.Pin]] lineage cut.
    *
    * Output: one row per round — (round, lsym, rsym, n_occ,
    * n_symbols_after), n_symbols_after the corpus-weighted symbol
    * total after that merge (the compression-progress diagnostic).
    * Stops early (fewer rows) if no pair remains.
    */
  def bpeTrain(df: DataFrame, textCol: String, merges: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    bpeCore(df, textCol, merges)._1
      .toDF("round", "lsym", "rsym", "n_occ", "n_symbols_after")
  }

  /** [[bpeTrain]] from the session-cached trainer run — the merge
    * table and the [[bpeVocabCached]] vocabulary come from ONE
    * training loop per (SparkContext, key) instead of two (a trainer
    * publishes both artifacts together; `df`'s content must be a pure
    * function of `key`).
    */
  def bpeTrainCached(df: DataFrame, key: String, textCol: String,
      merges: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    bpeCoreCached(df, key, textCol, merges)._1
      .toDF("round", "lsym", "rsym", "n_occ", "n_symbols_after")
  }

  /** Subword VOCABULARY after `merges` BPE rounds: the corpus-weighted
    * occurrence count of every surviving symbol — the artifact a
    * tokenizer build publishes next to the [[bpeTrain]] merge table
    * (merged subwords surface with their mass; untouched characters
    * keep theirs). Same loop, one extra (symbol)-keyed aggregation
    * over the distinct-word symbol table at the end.
    *
    * Output: (sym, n_occ) — n_occ = Σ word-count over symbol slots.
    */
  def bpeVocab(df: DataFrame, textCol: String, merges: Int): DataFrame =
    bpeCore(df, textCol, merges)._2
      .groupBy(col("sym")).agg(sum(col("wc")).as("n_occ"))

  /** [[bpeVocab]] from the session-cached trainer run (see
    * [[bpeTrainCached]]). */
  def bpeVocabCached(df: DataFrame, key: String, textCol: String,
      merges: Int): DataFrame =
    bpeCoreCached(df, key, textCol, merges)._2
      .groupBy(col("sym")).agg(sum(col("wc")).as("n_occ"))

  /** Tokenizer FERTILITY audit: apply the `merges`-round BPE
    * segmentation to the corpus and report, per `classCol`, the word
    * count, the subword-token count, and fertility — subword tokens
    * per word in exact integer ppm (10⁶ = every word is one token).
    * The number a tokenizer owner compares across sources/languages
    * before freezing a vocabulary: a high-fertility source pays more
    * context budget per word and trains on more fragmented units.
    *
    * Shape at scale: the trainer's final symbol table is already
    * per-distinct-word; segment counts reduce it to (word,
    * n_subwords) — bounded by |vocab|, AQE-broadcastable — and the
    * corpus side pre-reduces to (class, word, n_occ) before the one
    * word-keyed join, so no per-occurrence row ever crosses a
    * shuffle with text attached. Fertility divides exact longs
    * through decimal(38,0).
    */
  def bpeFertility(df: DataFrame, key: String, classCol: String,
      textCol: String, merges: Int): DataFrame = {
    val segs = bpeCoreCached(df, key, textCol, merges)._2
      .groupBy(col("w")).agg(max(col("pos")).cast("long").as("n_subwords"))
    val toks = graft.functions.TextKernels.tokens(col(textCol))
    df.select(col(classCol), explode(toks).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy(col(classCol), col("w")).agg(count(lit(1)).as("n_occ"))
      .join(segs, Seq("w"))
      .groupBy(col(classCol))
      .agg(sum(col("n_occ")).cast("long").as("n_words"),
        sum(col("n_occ") * col("n_subwords")).cast("long")
          .as("n_subword_tokens"))
      .withColumn("fertility_ppm", expr(
        """CAST((1000000 * CAST(n_subword_tokens AS DECIMAL(38,0)))
             DIV n_words AS BIGINT)"""))
  }

  /** One [[bpeCore]] run per (SparkContext, key) — the returned final
    * symbol table is already lineage-cut by the loop, and the merge
    * rows are a driver-side Seq, so the pair is safe to serve across
    * queries as-is.
    */
  private def bpeCoreCached(df: DataFrame, key: String, textCol: String,
      merges: Int): (Seq[(Long, String, String, Long, Long)], DataFrame) =
    if (!graft.util.SessionCache.enabled(df.sparkSession))
      bpeCore(df, textCol, merges)
    else graft.util.SessionCache.cached(df.sparkSession,
      s"bpe:$key:$textCol:$merges")(bpeCore(df, textCol, merges))

  /** Shared trainer loop: (merge rows, final symbol table). */
  private def bpeCore(df: DataFrame, textCol: String, merges: Int)
      : (Seq[(Long, String, String, Long, Long)], DataFrame) = {
    require(merges >= 1 && merges <= 1000, s"need 1 <= merges <= 1000: $merges")
    import graft.util.Pin.PinOps
    val toks = graft.functions.TextKernels.tokens(col(textCol))
    val words = df.select(explode(toks).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
    var syms = words.select(col("w"), col("wc"),
        posexplode(expr(
          "transform(sequence(1, length(w)), i -> substring(w, i, 1))"))
          .as(Seq("i", "sym")))
      .select(col("w"), col("wc"), (col("i") + 1).cast("long").as("pos"),
        col("sym"))
      .cutLineage
    val wWin = Window.partitionBy(col("w")).orderBy(col("pos"))
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, Long, Long)]
    var round = 1
    var exhausted = false
    while (round <= merges && !exhausted) {
      val paired = syms.withColumn("nxt", lead(col("sym"), 1).over(wWin))
      val best = paired.filter(col("nxt").isNotNull)
        .groupBy(col("sym"), col("nxt")).agg(sum(col("wc")).as("cnt"))
        .orderBy(col("cnt").desc, col("sym").asc, col("nxt").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        val marked = paired.withColumn("mark",
          when(col("sym") === l && col("nxt") === r, 1L).otherwise(0L))
        val islands = marked.withColumn("grp",
          when(col("mark") === 1, col("pos") - row_number().over(
            Window.partitionBy(col("w"), col("mark")).orderBy(col("pos")))))
        val kept = islands.withColumn("keep",
          when(col("mark") === 1 && row_number().over(
              Window.partitionBy(col("w"), col("grp")).orderBy(col("pos")))
            % 2 === 1, 1L).otherwise(0L))
        val merged = kept
          .withColumn("__pk", lag(col("keep"), 1).over(wWin))
          .filter(coalesce(col("__pk"), lit(0L)) === 0L)
          .select(col("w"), col("wc"), col("pos"),
            when(col("keep") === 1, concat(col("sym"), col("nxt")))
              .otherwise(col("sym")).as("sym"))
        syms = merged.select(col("w"), col("wc"),
            row_number().over(wWin).cast("long").as("pos"), col("sym"))
          .cutLineageReplacing(syms)
        val nSyms = syms.agg(coalesce(sum(col("wc")), lit(0L))).head().getLong(0)
        out += ((round.toLong, l, r, cnt, nSyms))
        round += 1
      }
    }
    (out.toSeq, syms)
  }

  /** Unigram-LM tokenizer trainer — the SentencePiece-family
    * alternative to [[bpeTrain]] (Kudo 2018's unigram model, hard-EM
    * form): trained subword vocabulary as (piece, n_occ) where n_occ
    * is the piece's corpus-weighted usage under the final
    * segmentation.
    *
    * Algorithm (all counting integer-exact — no log-probabilities, so
    * every engine derives the identical vocabulary, the same
    * discipline as the quantized LM scorer):
    *
    *   1. SEED: every ≤ `maxPiece`-char substring of the distinct-word
    *      table, counted corpus-weighted (overlapping occurrences each
    *      count);
    *   2. E-step: Viterbi-segment each distinct word under the current
    *      counts ([[graft.functions.Kernels.unigramDp]] — fewest
    *      pieces, then greatest total count, then lexicographically
    *      least sequence);
    *   3. M-step: re-estimate counts as corpus-weighted piece USAGE in
    *      that segmentation;
    *   4. PRUNE: keep the `vocabSize` most-used pieces
    *      (usage desc, piece asc) plus every single character
    *      (coverage — a word can always be spelled out);
    *   5. final E-step under the pruned vocabulary.
    *
    * Shape at scale: the whole trainer runs on the DISTINCT-WORD table
    * (one corpus pass builds it, the q187 discipline). Each E-step is
    * one piece-keyed shuffle join (substring candidates ⋈ counts) plus
    * one word-keyed aggregation whose per-word edge list is bounded by
    * len × maxPiece — the Viterbi DP itself is a compiled map-side
    * kernel per distinct word, never a per-position driver loop. The
    * prune is a TakeOrderedAndProject top-V (bounded by `vocabSize`),
    * not a global sort.
    */
  def unigramTrain(df: DataFrame, key: String, textCol: String,
      vocabSize: Int, maxPiece: Int = 4): DataFrame =
    unigramCoreCached(df, key, textCol, vocabSize, maxPiece)
      .select(col("wc"), explode(col("pieces")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("wc")).cast("long").as("n_occ"))

  /** Per-class fertility of the [[unigramTrain]] segmentation —
    * subword tokens per word in exact ppm, the [[bpeFertility]] audit
    * under the unigram vocabulary (same pre-reduced (class, word)
    * occurrence join, same decimal-exact division).
    */
  def unigramFertility(df: DataFrame, key: String, classCol: String,
      textCol: String, vocabSize: Int, maxPiece: Int = 4): DataFrame = {
    val segs = unigramCoreCached(df, key, textCol, vocabSize, maxPiece)
      .select(col("w"), size(col("pieces")).cast("long").as("n_subwords"))
    val toks = graft.functions.TextKernels.tokens(col(textCol))
    df.select(col(classCol), explode(toks).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy(col(classCol), col("w")).agg(count(lit(1)).as("n_occ"))
      .join(segs, Seq("w"))
      .groupBy(col(classCol))
      .agg(sum(col("n_occ")).cast("long").as("n_words"),
        sum(col("n_occ") * col("n_subwords")).cast("long")
          .as("n_subword_tokens"))
      .withColumn("fertility_ppm", expr(
        """CAST((1000000 * CAST(n_subword_tokens AS DECIMAL(38,0)))
             DIV n_words AS BIGINT)"""))
  }

  /** BPE vs unigram fertility, side by side per class — the
    * tokenizer-selection report: which trainer fragments each source
    * less at the same budget. Joins [[bpeFertility]] and
    * [[unigramFertility]] on the class key; `delta_ppm` > 0 means BPE
    * fragments more (unigram wins that source).
    */
  def tokenizerFertilityCompare(df: DataFrame, key: String,
      classCol: String, textCol: String, merges: Int, vocabSize: Int,
      maxPiece: Int = 4): DataFrame = {
    val b = bpeFertility(df, key, classCol, textCol, merges)
      .select(col(classCol), col("n_words"),
        col("n_subword_tokens").as("bpe_tokens"),
        col("fertility_ppm").as("bpe_fertility_ppm"))
    val u = unigramFertility(df, key, classCol, textCol, vocabSize, maxPiece)
      .select(col(classCol),
        col("n_subword_tokens").as("uni_tokens"),
        col("fertility_ppm").as("uni_fertility_ppm"))
    b.join(u, Seq(classCol))
      .withColumn("delta_ppm",
        (col("bpe_fertility_ppm") - col("uni_fertility_ppm")).cast("long"))
  }

  /** Single-character-fallback coverage of the [[unigramTrain]]
    * segmentation, per class — the OOV-pressure audit a tokenizer
    * owner reads next after fertility: of all subword tokens the
    * segmentation emits for a class, what fraction (exact ppm) are
    * single characters. A high fallback share means the trained
    * multi-char pieces don't cover that source and its text trains as
    * near-character-level — the signal to grow `vocabSize` or re-seed
    * before freezing. Same pre-reduced (class, word) occurrence join
    * as [[bpeFertility]]; the per-word char-token count is a bounded
    * array filter on the cached segmentation.
    */
  def unigramCoverage(df: DataFrame, key: String, classCol: String,
      textCol: String, vocabSize: Int, maxPiece: Int = 4): DataFrame = {
    val segs = unigramCoreCached(df, key, textCol, vocabSize, maxPiece)
      .select(col("w"), size(col("pieces")).cast("long").as("n_subwords"),
        size(filter(col("pieces"), p => length(p) === 1)).cast("long")
          .as("n_char_subwords"))
    val toks = graft.functions.TextKernels.tokens(col(textCol))
    df.select(col(classCol), explode(toks).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy(col(classCol), col("w")).agg(count(lit(1)).as("n_occ"))
      .join(segs, Seq("w"))
      .groupBy(col(classCol))
      .agg(sum(col("n_occ") * col("n_subwords")).cast("long")
          .as("n_subword_tokens"),
        sum(col("n_occ") * col("n_char_subwords")).cast("long")
          .as("n_char_tokens"))
      .withColumn("char_fallback_ppm", expr(
        """CAST((1000000 * CAST(n_char_tokens AS DECIMAL(38,0)))
             DIV n_subword_tokens AS BIGINT)"""))
  }

  /** 1-row loud-fail guard for an unrolled oracle twin's `maxLen`
    * precondition (the q228–q230 dpLen rule): returns a single int
    * column `__glz` that is 0 when every distinct corpus word is at
    * most `maxLen` chars and RAISES (with the offending length in the
    * message) otherwise — the Spark-side mirror of the DuckDB
    * `error(...)` CTE, so a corpus that violates the unroll bound
    * fails BOTH engines loudly instead of surfacing as an opaque hash
    * mismatch. Derived from the same cached segmentation frame the
    * unigram queries read (every corpus word is a row there), so it
    * adds no corpus scan; callers cross-join the 1-row frame and fold
    * `__glz` into an integer output column so column pruning cannot
    * silently drop the check.
    */
  def unigramLenGuard(df: DataFrame, key: String, textCol: String,
      vocabSize: Int, maxLen: Int, maxPiece: Int = 4): DataFrame =
    unigramCoreCached(df, key, textCol, vocabSize, maxPiece)
      .agg(max(length(col("w"))).as("__maxw"))
      .select(when(col("__maxw") > maxLen, raise_error(concat(
          lit("unigram oracle precondition violated: max word length "),
          col("__maxw").cast("string"),
          lit(s" > unrolled dpLen $maxLen"))))
        .otherwise(lit(0)).as("__glz"))

  /** One [[unigramCore]] run per (SparkContext, key+params) — the
    * final segmentation is lineage-cut, safe to serve across queries.
    */
  private def unigramCoreCached(df: DataFrame, key: String,
      textCol: String, vocabSize: Int, maxPiece: Int): DataFrame =
    if (!graft.util.SessionCache.enabled(df.sparkSession))
      unigramCore(df, textCol, vocabSize, maxPiece)
    else graft.util.SessionCache.cached(df.sparkSession,
      s"unigram:$key:$textCol:$vocabSize:$maxPiece")(
      unigramCore(df, textCol, vocabSize, maxPiece))

  /** Shared trainer body: the final segmentation (w, wc, pieces). */
  private def unigramCore(df: DataFrame, textCol: String, vocabSize: Int,
      maxPiece: Int): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be positive: $vocabSize")
    require(maxPiece >= 1 && maxPiece <= 7,
      s"need 1 <= maxPiece <= 7 (the DP packs length in 3 bits): $maxPiece")
    import graft.util.Pin.PinOps
    val toks = graft.functions.TextKernels.tokens(col(textCol))
    val words = df.select(explode(toks).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
    // every (start, plen<=maxPiece) substring of every distinct word —
    // bounded by |vocab| x len x maxPiece rows; pinned: reused by the
    // seed count, both E-step joins, and the single-char universe
    val subs = words
      .withColumn("start", explode(sequence(lit(1), length(col("w")))))
      .withColumn("plen", explode(sequence(lit(1),
        least(lit(maxPiece), length(col("w")) - col("start") + 1))))
      .withColumn("piece", expr("substring(w, start, plen)"))
      .cutLineage
    val seed = subs.groupBy(col("piece")).agg(sum(col("wc")).as("cnt"))
    val seg1 = dpSegment(subs.join(seed, Seq("piece")))
    val usage = seg1.select(col("wc"), explode(col("pieces")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("wc")).as("cnt"))
    // prune: top-V by usage — TakeOrderedAndProject, per-partition
    // top-V then a V-bounded driver merge, never a global sort
    val topV = usage.orderBy(col("cnt").desc, col("piece").asc)
      .limit(vocabSize)
    val chars = subs.filter(col("plen") === 1).select(col("piece")).distinct()
      .join(usage, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("cnt"), lit(0L)).as("cnt"))
    val kept = topV.unionByName(chars).distinct()
    dpSegment(subs.join(kept, Seq("piece"))).cutLineage
  }

  /** One E-step: per distinct word, fold its candidate edges into the
    * (≤ len × maxPiece)-element arrays the compiled Viterbi kernel
    * takes, map-side. `edges` = (w, wc, start, plen, piece, cnt).
    */
  private def dpSegment(edges: DataFrame): DataFrame =
    edges.groupBy(col("w"), col("wc"))
      .agg(collect_list(struct(col("start"), col("plen"), col("cnt")))
        .as("es"))
      .select(col("w"), col("wc"),
        graft.functions.Kernels.unigramDpOf(col("w"),
          transform(col("es"),
            e => e("start").cast("long") * 8 + e("plen").cast("long")),
          transform(col("es"), e => e("cnt").cast("long"))).as("pieces"))
}
