package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** [EXT] PII scrubbing and sequence chunking — the text-cleaning and
  * packing steps of a training-data pipeline (SURVEY.md §7.1 step 6).
  * Both are pure Column transforms: map-side, codegen'd, no shuffle;
  * at 100 TB they pipeline inside the scan stage.
  */
object TextClean {

  /** Conservative patterns restricted to constructs with identical
    * semantics in Java regex (Spark) and RE2 (DuckDB oracle):
    * character classes, bounded repetition, alternation — no
    * lookaround, no backreferences.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^ ]+"
  val LongDigitsRe = "[0-9]{9,}"

  /** Redact emails, then URLs, then long digit runs (account/phone
    * ids). Order matters and is part of the contract: an email's
    * digits or a URL's path must not be half-redacted by the later
    * passes, so each pass runs on the previous pass's output.
    */
  def scrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        UrlRe, "<URL>"),
      LongDigitsRe, "<ID>")

  /** Per-category redaction counts, evaluated on the same
    * progressively-scrubbed text states as [[scrub]].
    */
  def redactionCounts(text: Column): (Column, Column, Column) = {
    val afterEmail = regexp_replace(text, EmailRe, "<EMAIL>")
    val afterUrl = regexp_replace(afterEmail, UrlRe, "<URL>")
    (size(regexp_extract_all(text, lit(EmailRe), lit(0))).cast("long"),
      size(regexp_extract_all(afterEmail, lit(UrlRe), lit(0))).cast("long"),
      size(regexp_extract_all(afterUrl, lit(LongDigitsRe), lit(0))).cast("long"))
  }

  /** Fixed-window token chunking with stride (sequence packing for
    * training): chunks start every `stride` tokens and carry up to
    * `window` tokens, so consecutive chunks overlap by
    * `window - stride`. Every doc yields ≥1 chunk; the tail chunk may
    * be short. Output: (idCol, chunk_idx, n_tokens, chunk_text).
    *
    * Shape: the token array materializes ONCE per doc in the
    * generator's child projection; the per-chunk work after the
    * explode is a slice of that attribute — no re-tokenization per
    * window (the interpreted-HOF re-evaluation trap).
    */
  def tokenChunks(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, window: Int, stride: Int): org.apache.spark.sql.DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    df.select(col(idCol), graft.functions.TextKernels.tokens(col(textCol)).as("toks"))
      .select(col(idCol), col("toks"),
        explode(sequence(lit(0),
          greatest(ceil(size(col("toks")).cast("double") / stride).cast("int") - 1,
            lit(0)))).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        slice(col("toks"), col("chunk_idx").cast("int") * stride + 1, lit(window))
          .as("chunk_toks"))
      .select(col(idCol), col("chunk_idx"),
        size(col("chunk_toks")).cast("long").as("n_tokens"),
        concat_ws(" ", col("chunk_toks")).as("chunk_text"))
  }

  /** CONTENT-DEFINED chunking (CDC) over the token stream: chunk
    * boundaries fall where the rolling `gramTokens`-gram hash is
    * ≡ 0 (mod mask) — see [[graft.functions.Kernels.cdcChunks]] —
    * so an edit re-chunks only its local neighborhood instead of
    * shifting every downstream chunk the way [[tokenChunks]]'s fixed
    * stride does. This is the sub-document dedup granularity: chunk
    * hashes from near-identical docs agree outside the edited region,
    * which whole-doc hashing misses entirely.
    *
    * Map-side (one compiled pass + explode), no shuffle. Expected
    * chunk ≈ `mask` tokens. Output: (idCol, chunk_idx, start_tok,
    * n_tok, chunk_hash) — all longs, chunk_idx 1-based.
    */
  def cdcChunks(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, gramTokens: Int = 4, mask: Int = 16): org.apache.spark.sql.DataFrame = {
    require(gramTokens >= 1 && mask >= 1,
      s"need positive gramTokens/mask: $gramTokens/$mask")
    df.select(col(idCol), posexplode(graft.functions.Kernels.cdcChunksOf(
        col(textCol), gramTokens, mask)).as(Seq("p", "c")))
      .select(col(idCol), (col("p") + 1).cast("long").as("chunk_idx"),
        col("c.start").as("start_tok"), col("c.ntok").as("n_tok"),
        col("c.h").as("chunk_hash"))
  }

  /** Chunk-level dedup savings per source — the storage/corpus answer
    * to "how much of this source is repeated content?": CDC-chunk the
    * docs, then per source compare total chunk volume against the
    * distinct-chunk volume. Two aggregations — (source, chunk_hash)
    * then source — over the map-side chunk stream; all counts exact
    * longs (per-hash token length is min()'d, collision-safe for the
    * report's purpose).
    *
    * Output: (source, n_chunks, n_distinct_chunks, total_tokens,
    * distinct_tokens, saved_tokens).
    */
  def cdcDedupSavings(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, srcCol: String, gramTokens: Int = 4,
      mask: Int = 16): org.apache.spark.sql.DataFrame = {
    val chunks = df.select(col(srcCol).as("source"),
        explode(graft.functions.Kernels.cdcChunksOf(
          col(textCol), gramTokens, mask)).as("c"))
      .select(col("source"), col("c.ntok").as("n_tok"), col("c.h").as("h"))
    chunks
      .groupBy(col("source"), col("h"))
      .agg(count(lit(1)).as("c"), sum(col("n_tok")).as("sum_tok"),
        min(col("n_tok")).as("min_tok"))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_chunks"),
        count(lit(1)).as("n_distinct_chunks"),
        sum(col("sum_tok")).as("total_tokens"),
        sum(col("min_tok")).as("distinct_tokens"))
      .withColumn("saved_tokens", col("total_tokens") - col("distinct_tokens"))
  }

  /** Concat-and-chunk packing offsets — the pretraining batch-prep
    * step: documents are laid end-to-end in `idCol` order and the
    * token stream is cut into fixed `budget`-token training windows;
    * each document learns its global token offset and which windows it
    * lands in (documents straddle window boundaries by design — the
    * standard pack-then-chunk scheme, no padding waste).
    *
    * The global offset is a prefix sum over token counts, computed
    * DISTRIBUTED via [[Sweep.runningSum]] — no single-partition sort —
    * and everything is integer, so shard assignment is reproducible on
    * any engine or partitioning. Zero-token documents are dropped
    * (they occupy no window).
    *
    * Output: (id, n_tok, offset, first_chunk, last_chunk, n_chunks).
    */
  def packIntoChunks(df: org.apache.spark.sql.DataFrame, idCol: String,
      nTokCol: String, budget: Long): org.apache.spark.sql.DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    // bucket bounds from the raw id column — token counts (regex over
    // every document) must not run twice just to size the sweep cells
    val b = df.agg(min(col(idCol).cast("long")), max(col(idCol).cast("long"))).head()
    val bounds = if (b.isNullAt(0)) None else Some((b.getLong(0), b.getLong(1)))
    Sweep.runningSum(
        df.filter(col(nTokCol) > 0)
          .select(col(idCol).cast("long"), col(nTokCol).cast("long")),
        idCol, nTokCol, bounds = bounds)
      .select(col("t").as(idCol), col("d").as("n_tok"),
        (col("running") - col("d")).as("offset"),
        expr(s"(running - d) div ${budget}L").as("first_chunk"),
        expr(s"(running - 1) div ${budget}L").as("last_chunk"))
      .withColumn("n_chunks", col("last_chunk") - col("first_chunk") + 1L)
  }

  /** Exact repeated-span removal — the substring-level dedup pass
    * (the C4-style "drop text that occurs verbatim elsewhere" rule,
    * at token-window granularity): every `k`-token window whose
    * content appears in at least `minDocs` DISTINCT documents marks
    * its positions, and marked tokens are dropped; the document is
    * rebuilt from the survivors in order.
    *
    * Scale shape — all shuffles key on uniform values:
    *  1. window stream (doc, pos, window-text), a ×1 explode (one row
    *     per position);
    *  2. duplicated-window set via two-level distinct-doc count keyed
    *     on the window content's full 128-bit md5 (16-byte fixed-width
    *     shuffle keys; the [[Dedup.exact]] content-hash contract —
    *     collision-safe at any corpus size, unlike a 60-bit prefix,
    *     which matters because span removal is destructive and never
    *     re-verified);
    *  3. coverage = dup-window hits × `k` positions (bounded ×k
    *     fan-out), distinct on (doc, pos);
    *  4. anti-join of the token stream against coverage, then one
    *     per-doc rebuild whose buffer is bounded by document length —
    *     the same per-doc bound as any reassembly.
    * Documents shorter than `k` tokens have no windows and pass
    * through intact; a fully-duplicated document comes back as the
    * empty string with `n_removed = n_tok` (drop or keep is the
    * caller's policy).
    */
  def dropRepeatedSpans(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int = 3, minDocs: Int = 2): org.apache.spark.sql.DataFrame = {
    require(k > 0, s"window size must be positive: $k")
    require(minDocs >= 2, s"minDocs below 2 would mark every window: $minDocs")
    val base = tokenized(df, idCol, textCol)
    rebuildWithout(base,
      dupCoveredPositions(windowHashes(base, idCol, k), idCol, k, minDocs), idCol)
  }

  /** [EXT] VARIABLE-LENGTH exact-substring dedup report — the
    * relational re-expression of Lee et al.'s suffix-array ExactSubstr
    * pass ("Deduplicating Training Data Makes Language Models Better",
    * ACL 2022; PAPERS.md): every MAXIMAL token span repeated across
    * ≥ `minDocs` documents, reported at its TRUE length. The suffix
    * array dissolves into windows + islands: a substring of length
    * L ≥ k repeats iff each of its k-token windows repeats, so the
    * maximal repeated spans are exactly the maximal runs of
    * duplicated k-windows — window-hash → dup filter → covered
    * positions → per-doc gaps-and-islands merge (island id =
    * pos − row_number over pos). This is what [[dropRepeatedSpans]]'s
    * fixed-k marking cannot say: WHERE the boilerplate is and HOW LONG
    * it really is — a 60-token licence header comes back as one
    * 60-token span, not an anonymous pile of k-window marks — and
    * with k at the Lee-style minimum match length it catches
    * boilerplate both far longer than k (full length reported) and as
    * short as k itself.
    *
    * Scale shape, unchanged from [[dropRepeatedSpans]]: window
    * CONTENT shuffles only as its fixed-width 128-bit md5; covered
    * positions are (doc, pos) longs; the islands window partitions by
    * document (no global sort); span text is rebuilt by one
    * doc-bounded slice from the token array, joined back by doc id.
    *
    * Output: (idCol, span_start, span_len, span_text), one row per
    * maximal repeated span; documents with none emit nothing. Per-doc
    * LRS = `max(span_len) GROUP BY idCol`.
    */
  def repeatedSpanIntervals(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int = 5, minDocs: Int = 2): org.apache.spark.sql.DataFrame = {
    require(k > 0, s"window size must be positive: $k")
    require(minDocs >= 2, s"minDocs below 2 would mark every window: $minDocs")
    val base = tokenized(df, idCol, textCol)
    spanIslands(base,
      dupCoveredPositions(windowHashes(base, idCol, k), idCol, k, minDocs), idCol)
  }

  /** Session-cached [[repeatedSpanIntervals]] — the maximal-repeated-
    * span table is the shared substrate of the span reports (the
    * per-span report and the boilerplate catalog rollup); one
    * windows+islands pass per (SparkContext, key) serves all of them,
    * pinned and output-bounded (spans over duplicated content only).
    * Same purity contract as [[graft.ops.Dedup.pairIntersectionsCached]];
    * honors the `spark.graft.sessionCache=off` sweep switch.
    */
  def repeatedSpanIntervalsCached(df: org.apache.spark.sql.DataFrame,
      key: String, idCol: String, textCol: String, k: Int = 5,
      minDocs: Int = 2): org.apache.spark.sql.DataFrame =
    if (!graft.util.SessionCache.enabled(df.sparkSession))
      repeatedSpanIntervals(df, idCol, textCol, k, minDocs)
    else graft.util.SessionCache.cached(df.sparkSession,
      s"spans-intervals:$key:$idCol:$textCol:$k:$minDocs")(
      graft.util.Pin.cut(repeatedSpanIntervals(df, idCol, textCol, k, minDocs)))

  /** Merge covered (doc, pos) marks into maximal intervals with the
    * span text — the gaps-and-islands closer shared by
    * [[repeatedSpanIntervals]] and [[incrementalRepeatedSpans]].
    *
    * Span text is rebuilt from the (doc, pos, token) projection, NOT
    * by joining the aggregated spans back to `base`'s full `toks`
    * arrays: that join shipped every span-bearing document's ENTIRE
    * token array once per span, where the only tokens a span needs
    * are its own. Here the token stream is probed map-side against
    * the covered marks (AQE broadcasts the mark side when it is
    * small; the marks are output-bounded — duplicated positions
    * only), and the reassembly exchange then carries exactly the
    * COVERED tokens — the same per-doc-bounded shape as
    * [[rebuildWithout]]'s anti-join.
    */
  private def spanIslands(base: org.apache.spark.sql.DataFrame,
      covered: org.apache.spark.sql.DataFrame, idCol: String) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
    val marks = covered.withColumn("grp", col("pos") - row_number().over(w))
    val tokpos = base
      .select(col(idCol), posexplode(col("toks")).as(Seq("p0", "token")))
      .select(col(idCol), (col("p0") + 1).as("pos"), col("token"))
    tokpos.join(marks, Seq(idCol, "pos"))
      .groupBy(col(idCol), col("grp"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        count(lit(1)).as("span_len"),
        expr("array_join(transform(array_sort(collect_list(struct(pos, token))), " +
          "x -> x.token), ' ')").as("span_text"))
      .select(col(idCol), col("span_start"), col("span_len"), col("span_text"))
  }

  /** The persisted WINDOW-HASH INDEX of a corpus: (wh, n_docs) —
    * distinct documents containing each k-token window. This is the
    * incremental-maintenance state for exact-substring dedup at
    * streaming-corpus scale: the corpus text never re-scans; each
    * batch touches only its own windows plus this fixed-width digest
    * table. Index size is bounded by distinct window content, rows are
    * 24 bytes, and merge is additive ([[spanIndexMerge]]).
    */
  def spanIndex(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int = 5): org.apache.spark.sql.DataFrame = {
    require(k > 0, s"window size must be positive: $k")
    windowHashes(tokenized(df, idCol, textCol), idCol, k)
      .groupBy(col("wh"))
      .agg(countDistinct(col(idCol)).as("n_docs"))
  }

  /** Fold per-batch indexes into the union's index. PRECONDITION:
    * batches carry DISJOINT document ids (the streaming-ingest
    * contract — each doc arrives once), so distinct-doc counts add.
    */
  def spanIndexMerge(indexes: Seq[org.apache.spark.sql.DataFrame]): org.apache.spark.sql.DataFrame = {
    require(indexes.nonEmpty, "need at least one index")
    indexes.reduce(_ unionByName _)
      .groupBy(col("wh")).agg(sum(col("n_docs")).as("n_docs"))
  }

  /** AGE-AWARE [[spanIndex]]: (wh, n_docs, last_batch) — each window
    * digest remembers the newest ingest batch that contained it, the
    * state [[spanIndexCompact]] needs. Without compaction the index
    * grows monotonically: ~50–80% of window content is singleton junk
    * (URLs, ids, numbers) that never repeats, so at streaming-corpus
    * scale the index would be dominated by rows that will never
    * contribute a span.
    */
  def spanIndexAged(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, batchId: Long, k: Int = 5): org.apache.spark.sql.DataFrame =
    spanIndex(df, idCol, textCol, k).withColumn("last_batch", lit(batchId))

  /** Fold aged per-batch indexes: counts add (disjoint-doc contract),
    * recency keeps the max. */
  def spanIndexMergeAged(indexes: Seq[org.apache.spark.sql.DataFrame]): org.apache.spark.sql.DataFrame = {
    require(indexes.nonEmpty, "need at least one index")
    indexes.reduce(_ unionByName _)
      .groupBy(col("wh"))
      .agg(sum(col("n_docs")).as("n_docs"), max(col("last_batch")).as("last_batch"))
  }

  /** Compact an aged index: drop SINGLETON windows (`n_docs` = 1) last
    * seen at or before `watermarkBatch`. The dedup REPORT is exactly
    * preserved for every window the pruned index retains — all
    * `n_docs >= minDocs` rows survive any watermark, so every span the
    * full index would report from repeated content is reported
    * identically (SpanIndexSpec pins the equivalence). What is given
    * up, deliberately and boundedly: a pruned singleton can no longer
    * PAIR with a future batch's first repetition of it — the same
    * accepted loss as any watermarked state eviction in streaming
    * (late-arriving matches beyond the watermark are dropped), and
    * the caller sets the watermark to the re-pairing horizon they
    * care about. Mirrors the AggView maintenance discipline: an
    * explicit, loud staleness contract instead of unbounded state.
    */
  def spanIndexCompact(index: org.apache.spark.sql.DataFrame,
      watermarkBatch: Long): org.apache.spark.sql.DataFrame =
    index.filter(spanIndexKeepCond(watermarkBatch))

  /** The retention predicate [[spanIndexCompact]] applies, as a
    * Column — exposed so a report PRICING a compaction (q199's
    * n_retained) uses the same expression as the real prune instead
    * of a hand-copied inline duplicate that could silently
    * desynchronize.
    */
  def spanIndexKeepCond(watermarkBatch: Long): org.apache.spark.sql.Column =
    col("n_docs") >= 2 || col("last_batch") > lit(watermarkBatch)

  /** [EXT] INCREMENTAL exact-substring dedup: the maximal repeated
    * spans OF A NEW BATCH against (corpus ∪ batch), given only the
    * corpus's [[spanIndex]] — the arriving slice of what
    * [[repeatedSpanIntervals]] would report over the full union,
    * without rescanning the corpus (q54's incremental-dedup shape at
    * the span level). A batch window is duplicated when the union's
    * distinct-doc count reaches `minDocs`: corpus index count + the
    * batch's own distinct-doc count. Equivalence with the batch-doc
    * slice of the full-union run is property-pinned
    * (PipelineSpec); shuffles stay on the 128-bit window digests and
    * (doc, pos) longs.
    *
    * Output: ((idCol, span_start, span_len, span_text) over batch
    * docs, the UPDATED index) — persist the index for the next batch.
    */
  def incrementalRepeatedSpans(batch: org.apache.spark.sql.DataFrame,
      corpusIndex: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int = 5, minDocs: Int = 2):
      (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    require(k > 0, s"window size must be positive: $k")
    require(minDocs >= 2, s"minDocs below 2 would mark every window: $minDocs")
    val base = tokenized(batch, idCol, textCol)
    val wins = windowHashes(base, idCol, k)
    val batchIdx = wins.groupBy(col("wh"))
      .agg(countDistinct(col(idCol)).as("n_docs"))
    val merged = spanIndexMerge(Seq(corpusIndex, batchIdx))
    val dup = merged.filter(col("n_docs") >= minDocs).select(col("wh"))
    (spanIslands(base, coveredPositions(wins, dup, idCol, k), idCol), merged)
  }

  /** AGE-AWARE [[incrementalRepeatedSpans]] — the compacting form the
    * streaming feed ([[graft.streaming.StreamingLift.spanDedupStream]])
    * maintains its state with. The corpus index carries
    * (wh, n_docs, last_batch); the batch's windows stamp `batchId` as
    * their recency, counts fold via [[spanIndexMergeAged]], and the
    * RETURNED index is [[spanIndexCompact]]ed at `watermarkBatch` —
    * singleton windows not seen since the watermark are dropped
    * BEFORE the publish, so the persisted state stays bounded by
    * in-horizon singletons + all repeated content instead of growing
    * with every URL/id/number the stream has ever seen. Span output
    * is computed from the UN-compacted merge, so the current batch
    * always pairs against everything the index still knows —
    * compaction only affects which singletons survive INTO the next
    * batch (the watermarked re-pairing horizon, SpanIndexSpec's
    * report-equivalence contract).
    */
  def incrementalRepeatedSpansAged(batch: org.apache.spark.sql.DataFrame,
      corpusIndex: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, batchId: Long, watermarkBatch: Long,
      k: Int = 5, minDocs: Int = 2):
      (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    require(k > 0, s"window size must be positive: $k")
    require(minDocs >= 2, s"minDocs below 2 would mark every window: $minDocs")
    val base = tokenized(batch, idCol, textCol)
    val wins = windowHashes(base, idCol, k)
    val batchIdx = wins.groupBy(col("wh"))
      .agg(countDistinct(col(idCol)).as("n_docs"))
      .withColumn("last_batch", lit(batchId))
    val merged = spanIndexMergeAged(Seq(corpusIndex, batchIdx))
    val dup = merged.filter(col("n_docs") >= minDocs).select(col("wh"))
    (spanIslands(base, coveredPositions(wins, dup, idCol, k), idCol),
      spanIndexCompact(merged, watermarkBatch))
  }

  /** Callback-fed [[incrementalRepeatedSpansAged]] — the form the
    * PARTITION-SCOPED streaming index path needs: the corpus index is
    * not handed in whole but PROVIDED by `corpusFor`, which receives
    * the batch's own aged index (wh, n_docs, last_batch — pinned, so
    * the tokenize/hash lineage runs once) and returns the corpus rows
    * relevant to it — e.g. a bucket-pruned, read-consolidated slice of
    * a persisted index, which is sufficient because a window can only
    * pair with corpus rows that share its digest, and those live in
    * its digest's hash bucket. Returns (spans, batchIdx); merging,
    * compaction, and the publish are the caller's (the split that lets
    * [[graft.streaming.StreamingLift.spanDedupStream]] publish O(batch)
    * deltas instead of rewriting the whole index).
    */
  def incrementalRepeatedSpansVia(batch: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, batchId: Long,
      k: Int = 5, minDocs: Int = 2)(
      corpusFor: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame):
      (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    require(k > 0, s"window size must be positive: $k")
    require(minDocs >= 2, s"minDocs below 2 would mark every window: $minDocs")
    val base = tokenized(batch, idCol, textCol)
    val wins = windowHashes(base, idCol, k)
    val batchIdx = wins.groupBy(col("wh"))
      .agg(countDistinct(col(idCol)).as("n_docs"))
      .withColumn("last_batch", lit(batchId))
      .localCheckpoint(true)
    val merged = spanIndexMergeAged(Seq(corpusFor(batchIdx), batchIdx))
    val dup = merged.filter(col("n_docs") >= minDocs).select(col("wh"))
    (spanIslands(base, coveredPositions(wins, dup, idCol, k), idCol), batchIdx)
  }

  /** Surgical benchmark decontamination — the counterpart of
    * [[dropRepeatedSpans]] against a REFERENCE corpus: every `k`-token
    * window of `df` whose content appears verbatim anywhere in `ref`
    * (the eval/benchmark set) marks its positions, and the document is
    * rebuilt without them. Whole-document contamination FLAGGING is
    * q57's job; this removes just the leaked spans, keeping the rest
    * of the document trainable — the n-gram-level decontamination
    * pass eval-hygiene pipelines run before training.
    *
    * Scale shape: identical to [[dropRepeatedSpans]] except the
    * dup-window set is the DISTINCT window-hash set of the reference
    * corpus — benchmark-sized, not corpus-sized — which broadcasts
    * (`broadcastRef`) so contamination detection adds NO shuffle of
    * the training corpus's window stream: the mark join is a map-side
    * probe. Set `broadcastRef=false` if the reference is itself huge.
    */
  def dropSpansMatching(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, ref: org.apache.spark.sql.DataFrame, refIdCol: String,
      refTextCol: String, k: Int = 3,
      broadcastRef: Boolean = true): org.apache.spark.sql.DataFrame = {
    require(k > 0, s"window size must be positive: $k")
    val base = tokenized(df, idCol, textCol)
    val wins = windowHashes(base, idCol, k)
    val refWh0 = windowHashes(tokenized(ref, refIdCol, refTextCol), refIdCol, k)
      .select(col("wh")).distinct()
    val refWh = if (broadcastRef) broadcast(refWh0) else refWh0
    rebuildWithout(base, coveredPositions(wins, refWh, idCol, k), idCol)
  }

  private def tokenized(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String) =
    df.select(col(idCol),
      graft.functions.TextKernels.tokens(col(textCol)).as("toks"))

  /** One row per k-token window start: (idCol, pos, wh), pos 1-based.
    *
    * The window CONTENT leaves the map side as its FULL 128-bit md5
    * (16-byte binary): dup-detection groupBys and coverage joins
    * shuffle fixed-width uniform keys instead of k-token strings.
    * 128 bits — not the 60-bit band-key prefix — because span-removal
    * decisions are FINAL and destructive (a colliding window would
    * have its span deleted with no later exact verification); at
    * 128 bits the collision odds are the same content-hash contract
    * [[Dedup.exact]] already rests on. The digests come from ONE
    * compiled pass over the token array ([[graft.functions.Kernels
    * .windowMd5s]]) — this is the corpus-wide inner loop (a digest
    * per token position), and the equivalent Catalyst
    * slice/array_join/md5/unhex chain pays four allocations per
    * window for the same bytes.
    */
  private def windowHashes(base: org.apache.spark.sql.DataFrame, idCol: String,
      k: Int) =
    base.select(col(idCol),
        posexplode(graft.functions.Kernels.windowMd5sOf(col("toks"), k))
          .as(Seq("p0", "wh")))
      .select(col(idCol), (col("p0") + 1).as("pos"), col("wh"))

  /** Marked token positions: the windows in `wins` whose hash is in
    * `marks` (a 1-column `wh` set), expanded to their `k` covered
    * positions — a bounded ×k fan-out, then distinct on (doc, pos).
    */
  private def coveredPositions(wins: org.apache.spark.sql.DataFrame,
      marks: org.apache.spark.sql.DataFrame, idCol: String, k: Int) =
    wins.join(marks, Seq("wh"))
      .select(col(idCol), explode(expr(s"sequence(pos, pos + ${k - 1})")).as("pos"))
      .distinct()

  /** Covered positions of the windows duplicated across >= `minDocs`
    * documents, in ONE pass over the window stream: the distinct-doc
    * count per window content is computed as a WINDOW function
    * (max(dense_rank) over wh — the standard windowed
    * count-distinct), so the window stream is neither aggregated-
    * then-joined-back nor computed twice (a DataFrame subtree
    * referenced by both an aggregation and a join re-executes its
    * whole explode+digest lineage). One exchange on the 128-bit `wh`,
    * per-key sort bounded by each window content's occurrence count.
    */
  private def dupCoveredPositions(wins: org.apache.spark.sql.DataFrame,
      idCol: String, k: Int, minDocs: Int) = {
    val byWh = org.apache.spark.sql.expressions.Window.partitionBy(col("wh"))
    wins
      .withColumn("nd", max(dense_rank().over(byWh.orderBy(col(idCol)))).over(byWh))
      .filter(col("nd") >= minDocs)
      .select(col(idCol), explode(expr(s"sequence(pos, pos + ${k - 1})")).as("pos"))
      .distinct()
  }

  /** Multi-phrase blocklist matcher: per-document occurrence counts of
    * a curated phrase list (banned terms, contamination markers, PII
    * trigger phrases), matched as exact token n-grams so "fast key"
    * never fires inside "breakfast keyboard". One corpus pass, zero
    * shuffle: the token array materializes once per doc, windows are
    * generated only for the PHRASE LENGTHS PRESENT in the list (a
    * 2-and-3-word blocklist never builds 4-grams), and the list rides
    * into the scan stage as an array literal — the Aho-Corasick use
    * case where the pattern set is driver-sized (curated lists run
    * tens to a few thousand entries; beyond that, switch to a
    * broadcast join of the exploded window stream against a phrase
    * table — same windows, one broadcast, still no corpus shuffle).
    *
    * Output = input columns + `hits` (every matching window start,
    * overlaps counted), `phrases_hit` (distinct list entries present),
    * `flagged`. NULL text ⇒ 0 / 0 / false.
    */
  def phraseHits(df: org.apache.spark.sql.DataFrame, textCol: String,
      phrases: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(phrases.nonEmpty, "empty blocklist")
    require(phrases.forall(_.trim.nonEmpty), "blank blocklist phrase")
    val litAll = lit(phrases.toArray)
    val lens = phrases.map(_.split(" ").length).distinct.sorted
    val toks = graft.functions.TextKernels.tokens(col(textCol))
    val winsPerLen = lens.map { l =>
      when(size(col("_pb_toks")) >= l,
        transform(sequence(lit(1), size(col("_pb_toks")) - (l - 1)),
          i => concat_ws(" ", slice(col("_pb_toks"), i, lit(l)))))
        .otherwise(array().cast("array<string>"))
    }
    val wins =
      if (winsPerLen.size == 1) winsPerLen.head else concat(winsPerLen: _*)
    df.withColumn("_pb_toks", toks)
      .withColumn("_pb_wins", wins)
      .withColumn("hits",
        size(filter(col("_pb_wins"), w => array_contains(litAll, w)))
          .cast("long"))
      .withColumn("phrases_hit",
        size(array_intersect(array_distinct(col("_pb_wins")), litAll))
          .cast("long"))
      .withColumn("flagged", col("hits") > 0L)
      .drop("_pb_toks", "_pb_wins")
  }

  /** [[phraseHits]] through the compiled token-level Aho–Corasick
    * kernel ([[graft.functions.Kernels.phraseScan]]): same output
    * columns, bit-identical counts (PipelineSpec pins the parity; the
    * q207 DuckDB oracle verifies the kernel end-to-end), but one
    * O(tokens + matches) pass per document REGARDLESS of list size —
    * the form to use when the blocklist grows past a few dozen
    * entries, where the window-membership form's
    * O(windows × list) literal scan starts to bite. The automaton
    * compiles once per distinct list per JVM and is shared by every
    * task on the executor.
    */
  def phraseHitsCompiled(df: org.apache.spark.sql.DataFrame, textCol: String,
      phrases: Seq[String]): org.apache.spark.sql.DataFrame =
    df.withColumn("_pb_s",
        graft.functions.Kernels.phraseScanOf(col(textCol), phrases))
      .withColumn("hits", coalesce(col("_pb_s").getItem(0), lit(0L)))
      .withColumn("phrases_hit", coalesce(col("_pb_s").getItem(1), lit(0L)))
      .withColumn("flagged", col("hits") > 0L)
      .drop("_pb_s")

  /** Per-phrase totals over the corpus: (phrase, n_docs, n_hits),
    * zero rows included for list entries that never match. The corpus
    * pass is the compiled token-level Aho–Corasick kernel
    * ([[graft.functions.Kernels.phraseScanPer]]) — O(tokens + matches)
    * per document regardless of list size, where the former
    * window-membership form materialized every token window of every
    * phrase length and membership-tested each against the list
    * (O(windows × list) plus a window-string allocation per token).
    * Match semantics are identical (exact token n-grams, overlaps
    * counted); only per-doc matched entries explode, so at 100 TB the
    * shuffle stays bounded by actual blocklist traffic, and the
    * zero-fill join touches #phrases rows.
    */
  def phraseCounts(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, phrases: Seq[String]): org.apache.spark.sql.DataFrame = {
    val matched = df
      .select(col(idCol),
        graft.functions.Kernels.phraseScanPerOf(col(textCol), phrases).as("_pc"))
      .select(col(idCol), posexplode(col("_pc")).as(Seq("_idx", "_cnt")))
      .filter(col("_cnt") > 0)
      .groupBy(col("_idx"))
      .agg(countDistinct(col(idCol)).as("n_docs"),
        sum(col("_cnt")).as("n_hits"))
    import df.sparkSession.implicits._
    phrases.zipWithIndex.toDF("phrase", "_idx")
      .join(matched, Seq("_idx"), "left")
      .select(col("phrase"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
  }

  /** Rebuild each document from the tokens NOT in `covered`: ONE pass
    * over the token stream — an OUTER posexplode (so zero-token
    * documents keep their row), a left join against the covered marks,
    * and a single per-doc aggregation producing the total, the kept
    * count and the reassembly together. The former shape paid a second
    * tokenize scan for n_tok = size(toks) plus a re-alignment join of
    * it against the anti-joined rebuild — corpus-sized work both, for
    * numbers the one aggregation already holds (the covered side and
    * the reassembly shuffle are unchanged). Documents losing every
    * token come back as the empty string with n_removed = n_tok; the
    * per-doc reassembly buffer stays bounded by document length.
    */
  private def rebuildWithout(base: org.apache.spark.sql.DataFrame,
      covered: org.apache.spark.sql.DataFrame, idCol: String) = {
    base
      .select(col(idCol), col("toks").isNull.as("__nt"),
        posexplode_outer(col("toks")).as(Seq("p0", "token")))
      .select(col(idCol), col("__nt"), (col("p0") + 1).as("pos"), col("token"))
      .join(covered.withColumn("__cov", lit(1)), Seq(idCol, "pos"), "left")
      .groupBy(col(idCol))
      // NULL toks (null text) reproduce the former size(toks) = NULL
      // exactly: n_tok and n_removed come back NULL, clean_text ""
      .agg(when(max(col("__nt")), lit(null).cast("long"))
          .otherwise(count(col("token"))).as("n_tok"),
        count(when(col("__cov").isNull, col("token"))).as("n_kept"),
        expr("array_join(transform(array_sort(collect_list(" +
          "CASE WHEN __cov IS NULL THEN struct(pos, token) END)), " +
          "x -> x.token), ' ')").as("clean_text"))
      .select(col(idCol), col("n_tok"),
        (col("n_tok") - col("n_kept")).as("n_removed"), col("clean_text"))
  }
}
