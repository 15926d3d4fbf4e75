package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.ops.TableOps
import graft.sources.{ParquetTable, TableLease}

/** [EXT] Structured Streaming lift of the batch-incremental protocol
  * (SURVEY.md §2.8): the reference's watermark → filtered scan →
  * upsert loop (books/etl/chapters/extract+load/extract.js:14-39)
  * becomes `readStream` + event-time watermark + `foreachBatch` into
  * the SAME upsert core batch mode uses — one code path for both
  * execution modes.
  *
  * Scale notes: file-stream sources track processed files in the
  * checkpoint (exactly-once per file); dedup state is bounded by the
  * watermark delay (`dropDuplicatesWithinWatermark` evicts keys older
  * than the watermark); each micro-batch upsert rewrites only affected
  * buckets when `dest` is bucketed.
  */
object StreamingLift {

  /** Incremental upsert stream: watch `srcPath` for new files, merge
    * each micro-batch into `dest` keyed on `key` (within-batch
    * keep-latest by `tsCol`, then src-wins merge — the q8/A4
    * semantics). Re-delivery of a key is an UPDATE here, so no
    * cross-batch key dedup: that belongs to [[dedupStream]], whose
    * state would drop later updates as duplicates.
    */
  def upsertStream(spark: SparkSession, srcPath: String, schema: StructType,
      dest: ParquetTable, key: String, tsCol: String,
      checkpoint: String, availableNow: Boolean = true): StreamingQuery = {
    leasedStart("upsertStream", Seq(dest)) { _ =>
    val stream = spark.readStream.schema(schema).parquet(srcPath)
    val writer = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        TableOps.insertData(dest, batch, key, mergeOnDuplicates = true,
          orderBy = Seq(tsCol))
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
    }
  }

  /** Exactly-once-per-key event stream (streaming A4): emit the FIRST
    * arrival of each key, drop re-deliveries while the key is within
    * the watermark; state evicts as the watermark passes. This is the
    * dropDuplicatesWithinWatermark lift of the batch dedup — use it
    * for at-least-once sources, not for update streams.
    */
  def dedupStream(spark: SparkSession, srcPath: String, schema: StructType,
      key: String, tsCol: String, watermarkDelay: String = "1 hour"): DataFrame =
    spark.readStream.schema(schema).parquet(srcPath)
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(key)

  /** Tumbling-window aggregation over an event stream — the streaming
    * form of q16 (same logical plan shape per micro-batch); watermark
    * bounds window state.
    */
  def tumblingCounts(stream: DataFrame, tsCol: String, keyCol: String,
      valueCol: String, width: String = "1 hour",
      watermarkDelay: String = "1 hour"): DataFrame =
    stream.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), width), col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("total_value"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("n_events"), col("total_value"))

  /** Per-key custom state across micro-batches
    * (`KeyValueGroupedDataset.mapGroupsWithState`): running event
    * count + latest event time per key, surviving restarts through
    * the checkpoint. The idiom for state no built-in aggregation
    * expresses; state size is bounded by the key cardinality (pair
    * with a timeout for unbounded key spaces).
    */
  def runningCounts(stream: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(col(keyCol).cast("string"), col(tsCol).cast("timestamp"))
      .as[(String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Long), (String, Long, java.sql.Timestamp)](
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        case (key, events, state) =>
          var (cnt, lastMs) = state.getOption.getOrElse((0L, 0L))
          events.foreach { e =>
            cnt += 1
            if (e._2.getTime > lastMs) lastMs = e._2.getTime
          }
          state.update((cnt, lastMs))
          (key, cnt, new java.sql.Timestamp(lastMs))
      }
      .toDF(keyCol, "n_events", "last_ts")
  }

  /** Session windows (gap-based) per key — new capability beyond the
    * reference, built on the session_window builtin; state eviction by
    * watermark.
    */
  def sessionCounts(stream: DataFrame, tsCol: String, keyCol: String,
      gap: String = "30 minutes", watermarkDelay: String = "1 hour"): DataFrame =
    stream.withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col(keyCol), col("n_events"))

  /** Closed-session stream (`flatMapGroupsWithState` + event-time
    * timeout): the streaming form of q39's gap sessionize, emitting
    * each session EXACTLY ONCE, at close. Per key the state is one
    * open session (start, end, n) — three longs. An event more than
    * `gapMs` after the open session's end closes it inline (emitted in
    * that micro-batch); the event-time timeout closes a session when
    * the WATERMARK passes its end + gap, so the last session a key
    * ever produces still closes without waiting for another event.
    *
    * This is the idiom for custom state the `session_window` builtin
    * can't express (emit-on-close-only with incremental accumulation);
    * state evicts at close, so resident state is one tuple per
    * currently-active key.
    */
  def closedSessions(stream: DataFrame, keyCol: String, tsCol: String,
      gapMs: Long = 1800000L, watermarkDelay: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = stream.sparkSession
    import spark.implicits._
    def fn(key: Long, events: Iterator[(Long, java.sql.Timestamp)],
        state: GroupState[(Long, Long, Long)]): Iterator[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)] =
      if (state.hasTimedOut) {
        val (s0, e0, n0) = state.get
        state.remove()
        Iterator((key, new java.sql.Timestamp(s0), new java.sql.Timestamp(e0), n0))
      } else {
        val closed = scala.collection.mutable.ArrayBuffer
          .empty[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)]
        var st = state.getOption.getOrElse((0L, 0L, 0L))
        for (t <- events.map(_._2.getTime).toArray.sorted) {
          val (s0, e0, n0) = st
          if (n0 == 0L) st = (t, t, 1L)
          else if (t >= s0 - gapMs && t - e0 <= gapMs)
            // in-gap arrival, possibly LATE (cross-batch out-of-order):
            // extend the session on whichever side it lands
            st = (math.min(s0, t), math.max(e0, t), n0 + 1)
          else if (t > e0 + gapMs) {
            closed += ((key, new java.sql.Timestamp(s0), new java.sql.Timestamp(e0), n0))
            st = (t, t, 1L)
          } else
            // a late event more than gapMs BEFORE the open session:
            // batch sessionize would put it in an earlier session. That
            // session's window has passed, so emit it as its own closed
            // singleton; late peers arriving in LATER batches can no
            // longer coalesce with it (documented divergence from the
            // batch form, bounded by the watermark delay).
            closed += ((key, new java.sql.Timestamp(t), new java.sql.Timestamp(t), 1L))
        }
        state.update(st)
        // the timeout must sit strictly ahead of the current watermark
        state.setTimeoutTimestamp(
          math.max(st._2 + gapMs, state.getCurrentWatermarkMs() + 1))
        closed.iterator
      }
    stream
      .select(col(keyCol).cast("long").as(keyCol), col(tsCol).cast("timestamp").as(tsCol))
      .withWatermark(tsCol, watermarkDelay)
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), (Long, java.sql.Timestamp, java.sql.Timestamp, Long)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fn)
      .toDF(keyCol, "session_start", "session_end", "n_events")
  }

  /** Stream-stream interval join: each left event pairs with right
    * events of the same key whose time falls in
    * `[left.ts, left.ts + horizon]` — attribution (impression→click),
    * request→response stitching. BOTH inputs carry watermarks and the
    * join condition carries the time bound, which is what lets the
    * state store evict: a buffered right row can only match left rows
    * within the horizon, so rows older than `watermark - horizon` drop.
    * Without the range condition Spark must buffer both sides forever —
    * the unbounded-state trap this wrapper exists to make unreachable.
    *
    * Inner join by default; `leftOuter = true` additionally emits
    * unmatched left rows (with nulls) once the watermark proves no
    * match can arrive.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, horizon: String = "10 minutes",
      watermarkDelay: String = "1 hour", leftOuter: Boolean = false): DataFrame = {
    val l = left.withWatermark(leftTs, watermarkDelay).alias("l")
    val r = right.withWatermark(rightTs, watermarkDelay).alias("r")
    val cond = col(s"l.$keyCol") === col(s"r.$keyCol") &&
      col(s"r.$rightTs") >= col(s"l.$leftTs") &&
      col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $horizon")
    l.join(r, cond, if (leftOuter) "leftOuter" else "inner")
  }

  /** Temporal (as-of validity) stream enrichment: each stream element
    * joins the SCD2 dimension row that was valid AT ITS EVENT TIME —
    * `key matches ∧ valid_from ≤ ts < valid_to` — the streaming lift
    * of the q36/q67 batch pattern (late events still meet the version
    * that governed them, not today's).
    *
    * The dimension is STATIC (a stream-static join): Spark re-plans
    * the static side per micro-batch, so republishing the SCD2 table
    * between batches is picked up without restarting the query, and a
    * compact dimension broadcasts (the non-equi residual rides a hash
    * join on the key — never a nested loop over the stream). An open
    * current version (null valid_to) matches everything after its
    * valid_from.
    */
  def enrichAsOf(stream: DataFrame, dim: DataFrame, keyCol: String,
      tsCol: String, validFrom: String, validTo: String): DataFrame = {
    val s = stream.alias("s")
    val d = dim.alias("d")
    val cond = col(s"s.$keyCol") === col(s"d.$keyCol") &&
      col(s"d.$validFrom") <= col(s"s.$tsCol") &&
      (col(s"d.$validTo").isNull || col(s"d.$validTo") > col(s"s.$tsCol"))
    val dimCols = dim.columns.filterNot(c => c == keyCol ||
      c == validFrom || c == validTo)
    s.join(d, cond, "left")
      .select(stream.columns.map(c => col(s"s.$c")) ++
        dimCols.map(c => col(s"d.$c")): _*)
  }

  /** The version-pinned metadata key [[maintainAggStream]] records the
    * last-applied micro-batch id under.
    */
  val AppliedBatchKey = "graft.stream.applied.batch"

  /** Exact-integer arithmetic wide enough for count cross-products. */
  private val Dec38 = org.apache.spark.sql.types.DecimalType(38, 0)

  /** Name of the lineage-id file persisted INSIDE a stream's
    * checkpoint directory (see [[lineageOf]]).
    */
  val LineageFile = "_GRAFT_LINEAGE"

  /** The checkpoint-lineage identity stamped onto batch-keyed side
    * outputs (pairs, spans, alerts, curation ledger rows). Batch ids
    * are only comparable WITHIN one checkpoint lineage: a side-output
    * table fed by two checkpoints holds two independent batch-id
    * sequences, and grouping on batch_id alone would silently merge
    * unrelated batches ([[ledgerView]] would fold two different
    * streams' batch 0 into one row). The id lives in a small file
    * inside the checkpoint dir itself — generated once at the first
    * stream start, read ever after — so the identity follows the
    * checkpoint (any spelling of the same dir resolves to the same
    * id; a fresh checkpoint, which IS a new lineage because it
    * replays the feed from zero, gets a fresh id).
    */
  def lineageOf(spark: SparkSession, checkpoint: String): String = {
    val p = new org.apache.hadoop.fs.Path(checkpoint, LineageFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def readId(): Option[String] =
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
        if (s.nonEmpty) Some(s) else None
      }
    readId().getOrElse {
      val id = java.util.UUID.randomUUID().toString.replace("-", "").take(16)
      try {
        val out = fs.create(p, false) // create-if-absent: one winner
        try out.write(id.getBytes("UTF-8")) finally out.close()
      } catch { case _: java.io.IOException => () } // racing creator won
      readId().getOrElse(id)
    }
  }

  /** Acquire single-writer leases on every table the stream mutates,
    * run `start` (lazily, so pre-start healing happens under the
    * lease), and bind each lease's aliveness to the started query —
    * the next acquirer then distinguishes "live stream → refuse"
    * from "terminated → reclaim" deterministically, with no listener
    * races. Leases deliberately outlive the query (like
    * [[graft.engine.PidLock]]'s inert pid file): reclamation is the
    * next acquirer's job.
    */
  private def leasedStart(owner: String, tables: Seq[ParquetTable])(
      start: Seq[TableLease] => StreamingQuery): StreamingQuery = {
    val acquired = scala.collection.mutable.ArrayBuffer.empty[TableLease]
    try {
      tables.foreach(t => acquired += TableLease.acquire(t, owner))
      val q = start(acquired.toSeq)
      acquired.foreach(l => TableLease.bind(l, () => q.isActive))
      q
    } catch {
      case e: Throwable => acquired.foreach(_.release()); throw e
    }
  }

  /** Run a maintenance op's critical section: under the caller's
    * already-held lease when one is passed (the in-stream call sites —
    * a second same-process acquire is a refusal, not re-entrancy), or
    * self-leased for standalone use.
    */
  private def maintained[A](table: ParquetTable, owner: String,
      lease: Option[TableLease])(f: => A): A = lease match {
    case Some(l) =>
      require(l.covers(table),
        s"caller-held lease does not cover ${table.path}")
      f
    case None => TableLease.withLease(table, owner)(f)
  }

  /** Pre-lineage side-output tables carry no `lineage` column; heal
    * once with the empty lineage (their true identity: one unnamed
    * checkpoint) before appending rows that carry one — plain parquet
    * appends must not mix schemas in one un-merged directory.
    */
  private def healLineage(out: ParquetTable): Unit =
    if (out.exists && !out.read.columns.contains("lineage"))
      out.overwrite(out.read.withColumn("lineage", lit("")))

  /** The micro-batch admit rule every versioned maintain fold passes
    * to [[graft.sources.AggView.guardedPublish]]: a marker at or past
    * `batchId` means this batch already published (foreachBatch
    * replay) — refuse.
    */
  private def admitBatch(batchId: Long): Option[String] => Boolean =
    m => !m.map(_.toLong).exists(_ >= batchId)

  /** Streaming IVM: watch `srcPath` for CDC change files (the
    * [[graft.ops.Cdc.changeSet]] shape — key, change, before, after)
    * and fold each micro-batch into a materialized per-key COUNT/SUM
    * aggregate table via [[graft.ops.Cdc.applyDelta]] — the SAME
    * delta-merge the batch path (q107) uses, lifted to a stream.
    *
    * Exactly-once despite foreachBatch's at-least-once replay: a
    * delta-merge is NOT idempotent (re-applying a batch double-counts
    * its signed deltas), so each publish records its batch id as
    * version-pinned metadata — atomically with the data it describes —
    * and a replayed batch (crash after publish, before the checkpoint
    * commit) is recognized and skipped. The checkpoint provides
    * at-least-once file delivery; the snapshot's own metadata turns it
    * into exactly-once application. Batch ids are monotone PER
    * CHECKPOINT, so a snapshot is bound to one checkpoint lineage —
    * pointing a fresh checkpoint at an already-maintained snapshot
    * would replay the feed from zero and must start from a fresh
    * snapshot too.
    *
    * Per micro-batch the work is O(|aggregate| + |delta|) — the
    * snapshot re-writes (it is the per-key SUMMARY, orders of
    * magnitude smaller than the base table) but the BASE table is
    * never read: that is the IVM contract.
    */
  def maintainAggStream(spark: SparkSession, srcPath: String,
      changeSchema: StructType, snapshot: ParquetTable, groupKey: String,
      sumCols: Seq[String], checkpoint: String,
      availableNow: Boolean = true): StreamingQuery = {
    leasedStart("maintainAggStream", Seq(snapshot)) { _ =>
    val stream = spark.readStream.schema(changeSchema).parquet(srcPath)
    val writer = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.sources.AggView.guardedPublish(snapshot, AppliedBatchKey,
          batchId.toString, admitBatch(batchId))(
          graft.ops.Cdc.applyDelta(snapshot.read, batch, groupKey, sumCols))
        (): Unit
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
    }
  }

  /** Incremental per-group DISTINCT-COUNT maintenance via mergeable
    * KMV sketch states ([[graft.functions.SketchAgg.KmvSketchAgg]] /
    * [[graft.functions.SketchAgg.KmvMergeAgg]]): each micro-batch
    * sketches its new rows (one bottom-k state per group, one pass)
    * and folds them into the persisted `states` table with the merge
    * aggregate — so "distinct keys per source, ever seen" stays
    * queryable forever while each trigger touches only the batch and
    * a #groups × k-longs table, never the corpus. This is the
    * streaming answer a 100 TB feed needs: an exact streaming
    * distinct would carry every key as state; the KMV fold carries
    * ≤ k hashes per group and the merged state is BIT-IDENTICAL to a
    * one-pass batch sketch over the full history (union + re-trim —
    * the q203 shard-union property, lifted to time slices), so
    * [[graft.functions.SketchAgg.kmvReportOf]] over `states` reads
    * the same estimate a batch rebuild would.
    *
    * Exactly-once: the publish carries the batch id as version-pinned
    * metadata and a replayed batch whose id the live table already
    * covers is skipped (the maintainAggStream contract). The fold is
    * ALSO idempotent by algebra — set union ∘ re-trim absorbs
    * replays — so the guard only saves the wasted rewrite; no replay
    * can corrupt the state either way.
    */
  def sketchMaintainStream(spark: SparkSession, srcPath: String,
      schema: StructType, states: ParquetTable, groupCol: String,
      keyCol: String, checkpoint: String, k: Int = 64,
      availableNow: Boolean = true): StreamingQuery = {
    import graft.functions.SketchAgg
    mergeMaintainStream(spark, srcPath, schema, states, groupCol,
      SketchAgg.kmvSketch(col(keyCol), k),
      SketchAgg.kmvMerge(col("st"), k), checkpoint, availableNow)
  }

  /** Per-group MOMENTS maintenance over a streaming feed: the same
    * fold as [[sketchMaintainStream]] with the exact power-sum state
    * ([[graft.functions.SketchAgg.MomentsSketchAgg]]) — length/score
    * profiles (mean, variance, skew/kurtosis, the Cantelli tail bound
    * via [[graft.functions.SketchAgg.momentsReportOf]]) over
    * everything ever ingested, maintained from 5 integers per group.
    * Integer addition commutes and is replay-idempotent only through
    * the applied-batch guard (unlike the KMV union, re-adding WOULD
    * double-count — the guard is load-bearing here, exactly like
    * maintainAggStream's delta merge).
    */
  def momentsMaintainStream(spark: SparkSession, srcPath: String,
      schema: StructType, states: ParquetTable, groupCol: String,
      valueCol: String, checkpoint: String,
      availableNow: Boolean = true): StreamingQuery = {
    import graft.functions.SketchAgg
    mergeMaintainStream(spark, srcPath, schema, states, groupCol,
      SketchAgg.momentsSketch(col(valueCol)),
      SketchAgg.momentsMerge(col("st")), checkpoint, availableNow)
  }

  /** Per-group QUANTILE maintenance over a streaming feed: the same
    * fold with the log-histogram state ([[graft.functions.SketchAgg
    * .LogHistSketchAgg]]) — p50/p90/p99 brackets (guaranteed ≤ 6.25%
    * wide, via [[graft.functions.SketchAgg.logHistReportOf]]) over
    * everything ever ingested, maintained from 1008 counters per
    * group. Counter addition is not replay-idempotent; the
    * applied-batch guard is load-bearing (momentsMaintainStream's
    * contract).
    */
  def logHistMaintainStream(spark: SparkSession, srcPath: String,
      schema: StructType, states: ParquetTable, groupCol: String,
      valueCol: String, checkpoint: String,
      availableNow: Boolean = true): StreamingQuery = {
    import graft.functions.SketchAgg
    mergeMaintainStream(spark, srcPath, schema, states, groupCol,
      SketchAgg.logHistSketch(col(valueCol)),
      SketchAgg.logHistMerge(col("st")), checkpoint, availableNow)
  }

  /** Ingest-time DRIFT MONITOR: per micro-batch and group, the total
    * variation distance between the batch's value distribution and
    * the maintained historical one, computed entirely from two
    * 1008-bucket log-histogram states — `tvd_ppm = 10⁶ ·
    * Σ_b |c_B(b)·n_H − c_H(b)·n_B| / (2·n_B·n_H)`, exact integer
    * cross-multiplication in decimal(38,0) (sound while
    * 2·n_B·n_H·10⁶ < 10³⁸, i.e. ~10¹⁶ rows per side — and the
    * log-histogram state itself fails loudly at 2⁶³ total mass long
    * before that), so the alert threshold compares deterministically. After scoring, the batch folds into
    * the baseline (the [[logHistMaintainStream]] fold, same
    * exactly-once applied-batch guard). Alert rows append BEFORE the
    * publish: at-least-once, keyed by batch_id, bit-identical on
    * replay — the ledger convention; read through [[pairsView]] (or
    * [[graft.engine.AuditSink.recordDrift]]'s table overload) for the
    * exactly-once set. A group first seen this batch
    * has no baseline: its row carries NULL n_hist/tvd_ppm and
    * alerted = false (new groups are an inventory event, not drift).
    */
  def histDriftStream(spark: SparkSession, srcPath: String,
      schema: StructType, states: ParquetTable, alerts: ParquetTable,
      groupCol: String, valueCol: String, checkpoint: String,
      tvdAlertPpm: Long = 200000L,
      availableNow: Boolean = true): StreamingQuery = {
    import graft.functions.SketchAgg
    val lineage = lineageOf(spark, checkpoint)
    leasedStart("histDriftStream", Seq(states, alerts)) { _ =>
    healLineage(alerts)
    val stream = spark.readStream.schema(schema).parquet(srcPath)
    val writer = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.sources.AggView.guardedPublish(states, AppliedBatchKey,
          batchId.toString, admitBatch(batchId)) {
          val batchStates = batch.groupBy(col(groupCol))
            .agg(SketchAgg.logHistSketch(col(valueCol)).as("st"))
            .localCheckpoint(true)
          // total mass across the 1008 buckets. The sketch's addExact
          // bounds each PER-BUCKET counter at 2⁶³, not their sum — a
          // plain long fold here would wrap silently (wrong tvd_ppm,
          // missed alerts). Fold in decimal(38,0) (cannot overflow:
          // 1008·2⁶³ < 10²⁵) and fail LOUDLY if the total itself no
          // longer fits the ledger's bigint column.
          def massOf(c: org.apache.spark.sql.Column) = {
            def dec = aggregate(c, lit(0L).cast(Dec38), (acc, x) => acc + x)
            when(assert_true(dec <= lit(Long.MaxValue).cast(Dec38),
              lit("histDriftStream: cross-bucket total mass exceeds " +
                "Long.MaxValue — the drift ledger's bigint mass columns " +
                "cannot represent this baseline; re-shard the group")).isNull,
              dec.cast("long"))
          }
          if (states.exists) {
            val scored = batchStates.as("b")
              .join(states.read.as("s").withColumnRenamed("st", "hst"),
                Seq(groupCol), "left")
              .withColumn("n_batch", massOf(col("st")))
              .withColumn("n_hist",
                when(col("hst").isNotNull, massOf(col("hst"))))
              // decimal(38,0) cross-multiplication: the long form
              // wraps silently at n_batch·n_hist ≥ 2⁶³ (~3e9 rows per
              // side) in non-ANSI mode — wrong tvd_ppm, missed alerts
              .withColumn("__num", when(col("hst").isNotNull,
                aggregate(
                  zip_with(col("st"), col("hst"), (a, b) =>
                    abs(a.cast(Dec38) * col("n_hist").cast(Dec38)
                      - b.cast(Dec38) * col("n_batch").cast(Dec38))),
                  lit(0L).cast(Dec38), (acc, x) => acc + x)))
              // guard the division: a group whose batch (or baseline)
              // carries only NULL values has zero mass — no verdict,
              // not a divide-by-zero stream crash (ANSI mode throws)
              .withColumn("tvd_ppm",
                when(col("n_batch") > 0L && col("n_hist") > 0L,
                  expr("CAST(__num * 1000000 DIV " +
                    "(2 * CAST(n_batch AS DECIMAL(38,0)) " +
                    "* CAST(n_hist AS DECIMAL(38,0))) AS BIGINT)")))
              .withColumn("alerted",
                coalesce(col("tvd_ppm") >= tvdAlertPpm, lit(false)))
              .select(lit(batchId).as("batch_id"), col(groupCol),
                col("n_batch"), col("n_hist"), col("tvd_ppm"),
                col("alerted"), lit(lineage).as("lineage"))
            // ledger lands BEFORE the publish (at-least-once, keyed by
            // batch_id) — inside the guarded fold so a refused replay
            // never re-appends either
            alerts.append(scored)
            states.read.unionByName(batchStates)
              .groupBy(col(groupCol))
              .agg(SketchAgg.logHistMerge(col("st")).as("st"))
          } else {
            alerts.append(batchStates
              .select(lit(batchId).as("batch_id"), col(groupCol),
                massOf(col("st")).as("n_batch"),
                lit(null).cast("long").as("n_hist"),
                lit(null).cast("long").as("tvd_ppm"),
                lit(false).as("alerted"), lit(lineage).as("lineage")))
            batchStates
          }
        }
        (): Unit
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
    }
  }

  /** The shared mergeable-state fold: per micro-batch, build one
    * state per group from the new rows (`buildAgg`), union with the
    * persisted table, and fold colliding groups (`foldAgg`) — both
    * aggregates must read/produce a `st` column. Publish is
    * exactly-once via the version-pinned applied-batch metadata.
    */
  private def mergeMaintainStream(spark: SparkSession, srcPath: String,
      schema: StructType, states: ParquetTable, groupCol: String,
      buildAgg: org.apache.spark.sql.Column, foldAgg: org.apache.spark.sql.Column, checkpoint: String,
      availableNow: Boolean): StreamingQuery = {
    leasedStart("mergeMaintainStream", Seq(states)) { _ =>
    val stream = spark.readStream.schema(schema).parquet(srcPath)
    val writer = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.sources.AggView.guardedPublish(states, AppliedBatchKey,
          batchId.toString, admitBatch(batchId)) {
          val batchStates = batch.groupBy(col(groupCol))
            .agg(buildAgg.as("st"))
          if (states.exists)
            states.read.unionByName(batchStates)
              .groupBy(col(groupCol)).agg(foldAgg.as("st"))
          else batchStates
        }
        (): Unit
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
    }
  }

  /** Streaming CURATION ingest — the [EXT] pipeline (quality gate →
    * exact dedup → corpus append) as a continuous feed: watch
    * `srcPath` for new document files and, per micro-batch,
    *
    *  1. gate on [[graft.ops.QualityRules.gopherRules]] pass == 1;
    *  2. within-batch exact dedup (min id per content — Dedup.exact);
    *  3. CROSS-BATCH content dedup: anti-join the batch against the
    *     destination's stored content-hash column, so re-fed or
    *     re-crawled text never lands twice (the q54
    *     batch-vs-corpus shape, lifted);
    *  4. keyed upsert of the survivors into `dest` (so a re-delivered
    *     doc id is an update, and replays are idempotent).
    *
    * The content hash is PERSISTED as a `__content_hash` column on
    * write: the cross-batch probe then scans one thin column of the
    * corpus (column pruning reaches the parquet footers), not the
    * text. At cluster scale, bucket `dest` by the hash so the probe
    * prunes to the batch's buckets; the probe side of the anti-join is
    * always the SMALL batch.
    *
    * Rejected rows are not silenced: per batch, the counts
    * (input, low_quality, blocklisted, dup_in_batch, dup_in_corpus,
    * loaded) are appended to `audit` — the curation ledger a feed
    * owner reads. The blocklist gate (optional `blocklist` phrases,
    * matched by the compiled Aho–Corasick kernel
    * [[graft.functions.Kernels.phraseScan]]) sits between the quality
    * gate and dedup and is a no-op when the list is empty.
    * The DATA path is exactly-once under replay (id upsert + content
    * anti-join are both idempotent); the ledger is at-least-once (a
    * replayed batch re-appends its row with the same batch_id and a
    * zero loaded count) — read it through [[ledgerView]] for the
    * exactly-once row per batch.
    */
  def curationStream(spark: SparkSession, srcPath: String,
      schema: StructType, dest: ParquetTable, audit: ParquetTable,
      idCol: String, textCol: String, stopwords: Seq[String],
      checkpoint: String, availableNow: Boolean = true,
      blocklist: Seq[String] = Nil): StreamingQuery = {
    import graft.ops.{Dedup, QualityRules}
    val lineage = lineageOf(spark, checkpoint)
    leasedStart("curationStream", Seq(dest, audit)) { _ =>
    // heal a pre-widening ledger (6 columns, no n_blocklisted) BEFORE
    // the first append: plain parquet appends must not mix schemas in
    // one un-merged directory — non-bucketed reads would resolve a
    // mixed ledger to whichever file's footer schema inference picks.
    // The blocklist gate did not exist when those rows were written,
    // so n_blocklisted = 0 is their true count, not a fabrication.
    if (audit.exists && !audit.read.columns.contains("n_blocklisted"))
      audit.overwrite(audit.read
        .withColumn("n_blocklisted", lit(0L))
        .select("batch_id", "n_input", "n_low_quality", "n_blocklisted",
          "n_dup_in_batch", "n_dup_in_corpus", "n_loaded"))
    healLineage(audit)
    val stream = spark.readStream.schema(schema).parquet(srcPath)
    val writer = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        // pin the micro-batch ONCE: the quality kernels, the ledger
        // count, and both sides of the gate semi-join otherwise
        // re-read the batch files ~4x per trigger
        val batch = batch0.localCheckpoint(true)
        val nIn = batch.count()
        val keep = QualityRules.gopherRules(batch, idCol, textCol, stopwords)
          .filter(col("pass") === 1).select(col(idCol))
        val gated = batch.join(keep, Seq(idCol), "left_semi")
          .localCheckpoint(true)
        val nGated = gated.count()
        // optional blocklist gate (compiled Aho–Corasick pass over the
        // already-pinned batch — a no-op when the list is empty): docs
        // containing ANY banned phrase never reach dedup or the corpus
        val cleared =
          if (blocklist.isEmpty) gated
          else graft.ops.TextClean.phraseHitsCompiled(gated, textCol, blocklist)
            .filter(!col("flagged"))
            .drop("hits", "phrases_hit", "flagged")
        val nCleared = if (blocklist.isEmpty) nGated else cleared.count()
        val survivors = Dedup.exact(cleared, idCol, textCol)
          .select(col("keep_id").as(idCol))
        val batchDeduped = cleared.join(survivors, Seq(idCol), "left_semi")
          .withColumn("__content_hash", md5(col(textCol)))
        val nBatchDeduped = batchDeduped.count()
        val fresh = (if (dest.exists)
          batchDeduped.join(
            dest.read.select(col("__content_hash")).distinct(),
            Seq("__content_hash"), "left_anti")
        else batchDeduped).localCheckpoint(true)
        val nFresh = fresh.count()
        if (nFresh > 0)
          TableOps.insertData(dest, fresh, idCol, mergeOnDuplicates = true)
        import spark.implicits._
        audit.append(Seq((batchId, nIn, nIn - nGated, nGated - nCleared,
            nCleared - nBatchDeduped, nBatchDeduped - nFresh, nFresh))
          .toDF("batch_id", "n_input", "n_low_quality", "n_blocklisted",
            "n_dup_in_batch", "n_dup_in_corpus", "n_loaded")
          .withColumn("lineage", lit(lineage)))
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
    }
  }

  /** Table-meta key prefix recording, per checkpoint lineage, the
    * highest batch id whose side-output rows have been consolidated
    * (deduped once and rewritten) by [[consolidateSideOutput]] — the
    * stamp [[pairsView]] reads to skip re-distincting settled history.
    */
  val SideDedupedPrefix = "graft.stream.sideout.deduped."

  /** Exactly-once reading of a BIT-IDENTICAL at-least-once side output
    * ([[nearDupStream]] pairs, [[spanDedupStream]] spans,
    * [[histDriftStream]] alerts): those rows append BEFORE each
    * stream's index/state publish, so a crash in the window replays
    * the batch and re-appends its rows — but bit-identically by
    * construction (each row is a deterministic function of the batch
    * against the unchanged pre-publish state), keyed by
    * (lineage, batch_id). `distinct` is therefore the exactly-once
    * view; consumers read through this instead of each reimplementing
    * the dedup.
    *
    * A naive full-table `distinct` is O(history) per read — every
    * consumer call re-shuffles the entire accumulated output to
    * absorb a crash window that can only affect the TAIL (batches at
    * or below a lineage's applied watermark are final: a replay of a
    * stamped batch is refused by the index guard and never re-appends
    * — see the [[consolidateSideOutput]] invariant). So when the
    * table carries consolidation stamps, rows at or below their
    * lineage's stamp pass through VERBATIM (already deduped on disk —
    * a scan, no exchange) and only the unstamped tail pays the
    * distinct.
    */
  def pairsView(out: ParquetTable): DataFrame = {
    val stamps: Map[String, Long] = out.tableMeta.collect {
      case (k, v) if k.startsWith(SideDedupedPrefix) =>
        k.stripPrefix(SideDedupedPrefix) -> v.toLong
    }
    val df = out.read
    if (stamps.isEmpty) df.distinct()
    else {
      val lin =
        if (df.columns.contains("lineage")) col("lineage") else lit("")
      val stampOf = stamps.foldLeft(lit(-1L)) { case (acc, (l, w)) =>
        when(lin === lit(l), lit(w)).otherwise(acc)
      }
      df.filter(col("batch_id") <= stampOf)
        .unionByName(df.filter(col("batch_id") > stampOf).distinct())
    }
  }

  /** Dedup a side output's SETTLED history once, on disk, so
    * [[pairsView]] stops paying a full-table shuffle per read: rows of
    * lineage `lineage` with batch_id ≤ `appliedBatch` (the owning
    * index's applied watermark — batches at or below it can never
    * re-append, their replays are refused) are `distinct`ed and
    * rewritten; everything else — other lineages, the already-stamped
    * prefix, and crash-window rows ABOVE the watermark (their batch
    * may still replay and re-append) — is carried verbatim. The stamp
    * lands AFTER the versioned overwrite: a crash between them leaves
    * deduped rows the view harmlessly re-distincts.
    *
    * Runs in-stream on the `consolidatePairsEvery` cadence (under the
    * stream's own lease, serial with its appends) or standalone
    * between runs (self-leased — a live stream's lease refuses it).
    * NOTE [[ParquetTable.rollback]] on a side output invalidates its
    * stamps (the rolled-back data predates the consolidation the
    * stamp describes): clear `graft.stream.sideout.deduped.*` keys
    * after a rollback.
    */
  def consolidateSideOutput(out: ParquetTable, lineage: String,
      appliedBatch: Long, lease: Option[TableLease] = None): Unit =
    maintained(out, "consolidateSideOutput", lease) {
      val key = SideDedupedPrefix + lineage
      val already = out.tableMeta.get(key).map(_.toLong).getOrElse(-1L)
      if (out.exists && appliedBatch > already) {
        val df = out.read
        val lin =
          if (df.columns.contains("lineage")) col("lineage") else lit("")
        val mine = lin === lit(lineage) &&
          col("batch_id") > lit(already) &&
          col("batch_id") <= lit(appliedBatch)
        out.overwrite(df.filter(!mine).unionByName(df.filter(mine).distinct()))
        out.putTableMeta(key -> appliedBatch.toString)
      }
    }

  /** Exactly-once view of a [[curationStream]] audit ledger — the
    * consumer-side half of its at-least-once contract. A replayed
    * batch re-appends its batch_id row NOT bit-identically: the data
    * path already landed, so the replay observes the batch's own docs
    * as corpus duplicates (n_loaded = 0, n_dup_in_corpus absorbing
    * what the original row counted as loaded). The gate counts
    * (n_input, n_low_quality, n_blocklisted, n_dup_in_batch) are
    * deterministic functions of the batch and identical across
    * replays, so per batch_id the FIRST (truthful) row is
    * reconstructed exactly: min(n_dup_in_corpus) / max(n_loaded),
    * the replay-invariant value for the rest. Batch ids are only
    * comparable within a checkpoint lineage, so the ledger groups on
    * (lineage, batch_id) — a table fed by two checkpoints keeps the
    * two batch-id sequences structurally apart instead of silently
    * merging unrelated batches (pre-lineage ledgers, no `lineage`
    * column, group on batch_id alone as before). A crash between the
    * data publish and the ledger append leaves only the replay's
    * zero-loaded row: the truthful account of what that append
    * observed.
    */
  def ledgerView(audit: ParquetTable): DataFrame = {
    val df = audit.read
    val keys =
      if (df.columns.contains("lineage")) Seq(col("lineage"), col("batch_id"))
      else Seq(col("batch_id"))
    df.groupBy(keys: _*).agg(
      max(col("n_input")).as("n_input"),
      max(col("n_low_quality")).as("n_low_quality"),
      max(col("n_blocklisted")).as("n_blocklisted"),
      max(col("n_dup_in_batch")).as("n_dup_in_batch"),
      min(col("n_dup_in_corpus")).as("n_dup_in_corpus"),
      max(col("n_loaded")).as("n_loaded"))
  }

  /** NEAR-dup detection as a continuous feed — the MinHash/LSH
    * companion of [[spanDedupStream]]: per micro-batch,
    *
    *  1. within-batch candidate pairs via the batch-local banded
    *     build ([[graft.ops.Dedup.minhashCandidatePairs]]);
    *  2. batch-vs-CORPUS candidates by probing the batch's band keys
    *     ([[graft.ops.Dedup.bandKeyRows]]) against the persisted
    *     `index` of every band key ever seen — the corpus is never
    *     re-signed; the probe joins the SMALL batch against the index
    *     on (band_idx, band_key);
    *  3. append both kinds to `pairsOut` tagged (batch_id,
    *     pair_kind ∈ in_batch|vs_corpus), then fold the batch's keys
    *     into the index.
    *
    * Degenerate bands (near-constant content) obey the maxBucket
    * contract on BOTH paths: the in-batch build drops oversized
    * buckets via its capped collect, and the corpus probe drops index
    * keys whose bucket has grown past `maxBucket` (such a key would
    * emit O(bucket) pairs per arriving doc and is never what dedup
    * wants).
    *
    * Crash semantics follow the spanDedupStream convention: pairs
    * append BEFORE the index publish and replay identically (keyed by
    * batch_id — at-least-once; read through [[pairsView]] for the
    * exactly-once set); the index publish
    * carries the batch id as metadata and a replayed batch is
    * skipped, so the index is exactly-once. Batches must bring ids
    * not already in the index (the ingest contract).
    *
    * TWO index layouts: a FLAT index is simple (full union +
    * versioned overwrite per trigger) but O(index) per batch — fine
    * for bounded corpora, a scale-killer on a continuous feed. Pass a
    * hash-BUCKETED index (`ParquetTable(…, buckets = n,
    * bucketKey = "band_key")`) for the O(batch) path: the probe scans
    * only the buckets the batch's keys hash to, the publish is a
    * file-additive append of the batch's keys (no existing file is
    * ever rewritten), consolidation is amortized per touched bucket
    * past `compactFileThreshold` files, and a band group that grows
    * past `maxBucket` collapses to a tombstone at compaction — same
    * reports as the flat path (spec-pinned), bounded state. A
    * bucketed index is either managed by this stream from birth or
    * born from a flat one via [[migrateIndex]]; `maxBucket`/layout
    * must stay constant across invocations.
    */
  def nearDupStream(spark: SparkSession, srcPath: String,
      schema: StructType, index: ParquetTable, pairsOut: ParquetTable,
      idCol: String, textCol: String, checkpoint: String,
      shingleWords: Int = 3, bands: Int = 4, rowsPerBand: Int = 4,
      maxBucket: Int = 10000,
      availableNow: Boolean = true,
      compactFileThreshold: Int = 12,
      consolidatePairsEvery: Int = 0): StreamingQuery = {
    import graft.ops.Dedup
    if (index.isBucketed) require(index.bucketKey == "band_key",
      s"a bucketed nearDup index must bucket on band_key (all rows of " +
        s"a band group must share a bucket for the probe and the " +
        s"overflow accounting to be complete): got '${index.bucketKey}'")
    val lineage = lineageOf(spark, checkpoint)
    leasedStart("nearDupStream", Seq(index, pairsOut)) { leases =>
    val (indexLease, pairsLease) = (leases.head, leases(1))
    healLineage(pairsOut)
    val stream = spark.readStream.schema(schema).parquet(srcPath)
    val writer = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        def prep(): (DataFrame, DataFrame) = {
          val batch = batch0.localCheckpoint(true)
          val keys = Dedup.bandKeyRows(batch, idCol, textCol,
            shingleWords, bands, rowsPerBand).localCheckpoint(true)
          val internal = Dedup.minhashCandidatePairs(batch, idCol,
              textCol, shingleWords, bands, rowsPerBand, maxBucket)
            .withColumn("pair_kind", lit("in_batch"))
          (keys, internal)
        }
        if (index.isBucketed) {
          val applied = index.tableMeta.get(AppliedBatchKey).map(_.toLong)
          if (!applied.exists(_ >= batchId)) {
            val (keys, internal) = prep()
            // PARTITION-SCOPED path (the 100 TB shape): the index is
            // hash-bucketed on band_key, so
            //  - the probe reads ONLY the buckets the batch's keys
            //    hash to (partition-pruned scan) and consolidates on
            //    read: distinct absorbs replayed appends, rows of the
            //    batch's own crashed publish (src_batch == batchId)
            //    are excluded so a replay probes the exact pre-batch
            //    state, and a NULL doc id is an overflow TOMBSTONE —
            //    the group is poisoned and never pairs again (the
            //    same report the flat path's probe-time count filter
            //    gives, with the storage reclaimed);
            //  - the publish APPENDS the batch's keys into their
            //    buckets — file-additive, O(batch): no existing file
            //    is ever rewritten by a batch (a per-batch bucket
            //    REWRITE would still be O(index): uniformly-hashed
            //    keys touch nearly every bucket);
            //  - consolidation is amortized: after the applied-batch
            //    stamp (so a replayed batch can never see its own
            //    rows consolidated), touched buckets past the file
            //    threshold compact via [[compactNearDupIndex]].
            val touched = keys.select(index.bucketExpr.cast("int").as("b"))
              .distinct().collect().map(_.getInt(0)).toSeq.sorted
            val cross =
              if (index.exists) {
                val live = index.readBuckets(touched)
                  .filter(col("src_batch") =!= lit(batchId))
                  .drop("src_batch").distinct()
                Dedup.bandIndexProbe(live, keys, idCol, maxBucket)
                  .withColumn("pair_kind", lit("vs_corpus"))
              } else internal.limit(0)
            pairsOut.append(internal.unionByName(cross)
              .withColumn("batch_id", lit(batchId))
              .withColumn("lineage", lit(lineage)))
            // ONE file per touched bucket per batch: without the
            // delta-sized repartition, every batch partition writes its
            // own file into every bucket it touches (partitions ×
            // buckets files), and the probe's planning cost is
            // O(files) — an O(batch) shuffle of the delta buys a flat
            // file count
            index.append(keys.withColumn("src_batch", lit(batchId))
              .repartition(index.buckets, index.bucketExpr))
            index.putTableMeta(AppliedBatchKey -> batchId.toString)
            compactNearDupIndex(index, idCol, maxBucket,
              touched.filter(index.bucketFileCount(_) > compactFileThreshold),
              lease = Some(indexLease))
            if (consolidatePairsEvery > 0 &&
                (batchId + 1) % consolidatePairsEvery == 0)
              consolidateSideOutput(pairsOut, lineage, batchId,
                lease = Some(pairsLease))
          }
        } else {
          // flat path (small/medium indexes): full union + versioned
          // overwrite through the ONE guarded fold-publish
          // (AggView.guardedPublish) — simple and exactly-once, but
          // O(index) per trigger; bucket the index for streaming at
          // scale
          val outcome = graft.sources.AggView.guardedPublish(index,
            AppliedBatchKey, batchId.toString, admitBatch(batchId)) {
            val (keys, internal) = prep()
            val cross =
              if (index.exists)
                Dedup.bandIndexProbe(index.read, keys, idCol, maxBucket)
                  .withColumn("pair_kind", lit("vs_corpus"))
              else internal.limit(0)
            // pairs land BEFORE the publish (at-least-once, keyed by
            // batch_id) — inside the guarded fold so a refused replay
            // never re-appends either
            pairsOut.append(internal.unionByName(cross)
              .withColumn("batch_id", lit(batchId))
              .withColumn("lineage", lit(lineage)))
            if (index.exists) index.read.unionByName(keys).distinct()
            else keys.distinct()
          }
          if (outcome.published && consolidatePairsEvery > 0 &&
              (batchId + 1) % consolidatePairsEvery == 0)
            consolidateSideOutput(pairsOut, lineage, batchId,
              lease = Some(pairsLease))
          (): Unit
        }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
    }
  }

  /** Consolidate the named buckets of a bucketed [[nearDupStream]]
    * band-key index PARTITION-SCOPED: exact-duplicate delta rows
    * (crashed-publish replays) fold via distinct, surviving rows
    * re-stamp as consolidated (src_batch = -1), and any
    * (band_idx, band_key) group past `maxBucket` docs — or already
    * tombstoned — collapses to ONE tombstone row (NULL doc id). Such
    * a group would emit O(bucket) pairs per arriving doc and is never
    * what dedup wants: the flat path filters it at probe time forever
    * while its rows keep accumulating; the tombstone gives the SAME
    * report with the storage reclaimed and bounded. Runs inside the
    * stream after the applied-batch stamp, or standalone between runs
    * (single-writer, like every table mutation here).
    *
    * CRASH-WINDOW guard: rows whose `src_batch` exceeds the
    * applied-batch watermark in the table meta were appended by a
    * publish that crashed before its stamp — the replay's
    * `src_batch =!= batchId` exclusion depends on that stamp
    * SURVIVING, so consolidating them to src_batch = -1 would fold
    * the crashed batch's keys into the corpus the replay probes
    * (spurious vs_corpus pairs for in-batch duplicates). Such rows
    * are carried through verbatim (distinct only — bit-identical
    * multi-crash re-appends collapse) and consolidate at the first
    * compaction after their batch's stamp lands.
    */
  def compactNearDupIndex(index: ParquetTable, idCol: String,
      maxBucket: Int, bucketIds: Seq[Int],
      lease: Option[TableLease] = None): Unit = {
    if (bucketIds.isEmpty) return
    maintained(index, "compactNearDupIndex", lease) {
    val applied = index.tableMeta.get(AppliedBatchKey)
      .map(_.toLong).getOrElse(-1L)
    val raw = index.readBuckets(bucketIds)
    val pending = raw.filter(col("src_batch") > applied).distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band_idx"), col("band_key"))
    val marked = raw.filter(col("src_batch") <= applied)
      .drop("src_batch").distinct()
      .withColumn("__tomb", max(when(col(idCol).isNull, 1).otherwise(0)).over(w))
      .withColumn("__bn", count(lit(1)).over(w))
    val healthy = marked
      .filter(col("__tomb") === 0 && col("__bn") <= maxBucket)
      .drop("__tomb", "__bn")
    val tombs = marked.filter(col("__tomb") === 1 || col("__bn") > maxBucket)
      .select(col("band_idx"), col("band_key")).distinct()
      .withColumn(idCol, lit(null).cast("long"))
      .select(healthy.columns.map(col): _*)
    index.overwriteBuckets(
      healthy.unionByName(tombs).withColumn("src_batch", lit(-1L))
        .unionByName(pending)
        .repartition(index.buckets, index.bucketExpr)) // 1 file/bucket
    }
  }

  /** Logical (id, band_idx, band_key) content of a [[nearDupStream]]
    * index regardless of layout: flat indexes read as-is; bucketed
    * ones consolidate on read (distinct folds replayed appends) and
    * exclude overflow tombstones.
    */
  def nearDupIndexView(index: ParquetTable, idCol: String): DataFrame =
    if (!index.isBucketed) index.read
    else index.read.drop("src_batch").distinct().filter(col(idCol).isNotNull)

  /** Migrate a FLAT [[nearDupStream]], [[spanDedupStream]] or
    * [[vocabTrackStream]] index into a fresh hash-BUCKETED one — the
    * escape hatch for a feed whose flat index outgrew the small-index
    * mode (O(index) rewrite per trigger): without it the only path to
    * the O(batch) layout was rebuilding the index from raw text.
    *
    * The watermark to carry is dispatched on which applied-batch meta
    * key the FLAT index itself holds — NOT inferred from the target's
    * bucket key, because the bucket key alone is ambiguous: span and
    * vocab indexes both bucket on `wh` while stamping different keys
    * ([[SpanBatchKey]] vs [[AppliedBatchKey]]). The target's bucket
    * key only constrains which keys are admissible (`band_key` →
    * nearDup's [[AppliedBatchKey]]; `wh` → span's [[SpanBatchKey]] or
    * vocab's [[AppliedBatchKey]]), and the schema check below rejects
    * a kind mismatch the keys cannot see. Every row
    * lands pre-consolidated (src_batch = -1, one file per bucket),
    * and the flat index's version-pinned applied-batch watermark is
    * carried into the target's TABLE-scoped metadata — so resuming
    * the stream on the SAME checkpoint against the bucketed table is
    * exactly-once: a replayed batch at or below the watermark is
    * refused, the next batch probes the identical logical state the
    * flat index held, and pair/span reports continue bit-identically
    * (spec-pinned).
    *
    * Ordering: the watermark lands BEFORE the data, and the target
    * must not exist — a crash mid-append leaves a target that
    * [[ParquetTable.exists]] reports, which this require rejects;
    * `drop()` the partial target and re-run (the flat source is never
    * mutated). Single-writer, stream stopped — like every maintenance
    * op here. Returns the migrated watermark.
    */
  def migrateIndex(flat: ParquetTable, bucketed: ParquetTable): Long =
    // both ends leased: the flat source must not be fed by a live
    // stream mid-copy, and the bucketed target must not be born twice
    TableLease.withLease(flat, "migrateIndex") {
    TableLease.withLease(bucketed, "migrateIndex") {
    require(!flat.isBucketed, s"source index ${flat.path} must be flat")
    require(bucketed.isBucketed,
      s"target index ${bucketed.path} must be bucketed")
    require(flat.exists, s"source index ${flat.path} has no published data")
    require(!bucketed.exists,
      s"target index ${bucketed.path} already has data — migration " +
        "births the bucketed index; after a crashed attempt, drop() the " +
        "target and re-run")
    val admissible = bucketed.bucketKey match {
      case "band_key" => Seq(AppliedBatchKey)              // nearDup
      case "wh"       => Seq(SpanBatchKey, AppliedBatchKey) // span | vocab
      case other => throw new IllegalArgumentException(
        s"unrecognized index bucket key '$other': nearDup indexes " +
          "bucket on band_key, span and vocab indexes on wh")
    }
    val carried = admissible.filter(flat.currentMeta.contains)
    val metaKey = carried match {
      case Seq(k) => k
      case Seq() => throw new IllegalStateException(
        s"source index ${flat.path} carries none of " +
          s"${admissible.mkString("'", "'/'", "'")} applied-batch " +
          "metadata — not a stream-managed flat index")
      case _ => throw new IllegalStateException(
        s"source index ${flat.path} carries MORE than one applied-batch " +
          s"key (${carried.mkString(", ")}) — ambiguous index kind; a " +
          "stream-managed flat index stamps exactly one")
    }
    val applied = flat.currentMeta(metaKey)
    val rows = flat.read
    require(rows.columns.contains(bucketed.bucketKey),
      s"source index schema (${rows.columns.mkString(", ")}) has no " +
        s"'${bucketed.bucketKey}' column — wrong index kind for this target")
    bucketed.putTableMeta(metaKey -> applied)
    bucketed.append(rows.withColumn("src_batch", lit(-1L))
      .repartition(bucketed.buckets, bucketed.bucketExpr)) // 1 file/bucket
    applied.toLong
    } }

  /** The metadata key [[spanDedupStream]] records its applied batch
    * under (version-pinned for flat indexes, table-scoped for
    * bucketed ones).
    */
  val SpanBatchKey = "span_batch_id"

  /** Span-level exact-substring dedup as a CONTINUOUS feed: each
    * micro-batch reports its maximal repeated spans against
    * (everything seen so far ∪ the batch) via
    * [[graft.ops.TextClean.incrementalRepeatedSpans]], appending the
    * spans to `spansOut` and folding the batch's window counts into
    * the persisted `index` table (fixed-width 128-bit digests, never
    * the corpus text — the only state the stream carries). Batches
    * must bring disjoint doc ids (the ingest contract the index-merge
    * precondition needs), and `checkpoint` is REQUIRED and must stay
    * with the index for the stream's lifetime: the checkpoint dir is
    * the authoritative record of ingested files (a fresh dir would
    * replay them).
    *
    * Crash semantics: the index publish carries the batch id as
    * version-pinned metadata, and a replayed batch whose id the live
    * index already covers is SKIPPED — the index is exactly-once even
    * when the driver dies between the publish and the streaming
    * checkpoint commit (re-merging a batch's counts would permanently
    * inflate n_docs and fabricate duplicate spans). Span rows append
    * BEFORE the index publish and replay identically (the index they
    * derive from is unchanged until the publish), so spansOut is
    * at-least-once with bit-identical duplicates, keyed by batch_id —
    * read through [[pairsView]] for the exactly-once set (the
    * curationStream ledger convention).
    *
    * State growth: the index is AGED ((wh, n_docs, last_batch)) and,
    * when `compactAfterBatches` is finite, compacted per micro-batch
    * ([[graft.ops.TextClean.spanIndexCompact]]) — singleton windows
    * last seen that many OR MORE batches ago are pruned BEFORE the
    * publish, bounding the persisted state by in-horizon singletons
    * plus all repeated content (~50–80% of window content is
    * never-repeating junk that would otherwise accumulate forever).
    * Spans are computed from the un-compacted merge, so the current
    * batch always pairs against everything the index still knows; the
    * only accepted loss is a pruned singleton re-pairing with content
    * that arrives beyond the horizon — the standard watermarked-state
    * eviction contract, and reports for all retained windows are
    * bit-identical to the uncompacted stream's
    * (StreamingLiftSpec pins this across a compaction boundary).
    *
    * TWO index layouts, exactly as [[nearDupStream]]: flat (full
    * merge + versioned overwrite — O(index) per trigger, for bounded
    * corpora) or hash-bucketed on the window digest
    * (`ParquetTable(…, buckets = n, bucketKey = "wh")`) for the
    * O(batch) path — partition-pruned probe, file-additive delta
    * append, amortized partition-scoped consolidation; see
    * [[spanDedupStreamBucketed]]'s doc for the delta-row protocol.
    * Reports are bit-identical between the layouts (spec-pinned).
    */
  def spanDedupStream(spark: SparkSession, srcPath: String,
      schema: StructType, index: ParquetTable, spansOut: ParquetTable,
      idCol: String, textCol: String, checkpoint: String,
      k: Int = 5, minDocs: Int = 2,
      availableNow: Boolean = true,
      compactAfterBatches: Long = Long.MaxValue,
      compactFileThreshold: Int = 12,
      consolidateSpansEvery: Int = 0): StreamingQuery = {
    import graft.ops.TextClean
    require(checkpoint != null && checkpoint.nonEmpty,
      "spanDedupStream needs a durable checkpoint dir — a fresh one " +
        "replays every file and double-merges window counts into the index")
    require(compactAfterBatches >= 1,
      s"compactAfterBatches below 1 would prune the current batch's own " +
        s"singletons before they can ever pair: $compactAfterBatches")
    if (index.isBucketed) require(index.bucketKey == "wh",
      s"a bucketed span index must bucket on wh (a window can only pair " +
        s"with corpus rows sharing its digest, so all rows of a digest " +
        s"must share a bucket): got '${index.bucketKey}'")
    if (index.isBucketed)
      return spanDedupStreamBucketed(spark, srcPath, schema, index,
        spansOut, idCol, textCol, checkpoint, k, minDocs, availableNow,
        compactAfterBatches, compactFileThreshold, consolidateSpansEvery)
    val lineage = lineageOf(spark, checkpoint)
    leasedStart("spanDedupStream", Seq(index, spansOut)) { leases =>
    val spansLease = leases(1)
    healLineage(spansOut)
    val stream = spark.readStream.schema(schema).parquet(srcPath)
    val writer = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        // the ONE guarded fold-publish (AggView.guardedPublish): a
        // replayed batch whose id the live index already covers is
        // refused before anything is computed or appended
        val outcome = graft.sources.AggView.guardedPublish(index,
          SpanBatchKey, batchId.toString, admitBatch(batchId)) {
          val batch = batch0.localCheckpoint(true)
          val corpusIdx0 =
            if (index.exists) index.read
            else spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField("wh",
                  org.apache.spark.sql.types.BinaryType),
                org.apache.spark.sql.types.StructField("n_docs",
                  org.apache.spark.sql.types.LongType),
                org.apache.spark.sql.types.StructField("last_batch",
                  org.apache.spark.sql.types.LongType))))
          // an index persisted before the aged schema carries no
          // recency — stamp it -1 (older than every real batch id) so
          // a finite horizon prunes legacy singletons like any other
          // stale window, while the off-switch below keeps them
          val corpusIdx =
            if (corpusIdx0.columns.contains("last_batch")) corpusIdx0
            else corpusIdx0.withColumn("last_batch",
              org.apache.spark.sql.functions.lit(-1L))
          // default Long.MaxValue ⇒ watermark pinned below every
          // possible last_batch ⇒ spanIndexCompact keeps everything
          // (no behavior change for existing callers); a finite
          // horizon prunes singletons last seen compactAfterBatches
          // OR MORE batches ago (age >= N, the spec-pinned boundary:
          // a batch-1 singleton is pruned at batch 2's publish when
          // compactAfterBatches = 1)
          val watermark =
            if (compactAfterBatches == Long.MaxValue) Long.MinValue
            else batchId - compactAfterBatches
          val (spans, merged) = TextClean.incrementalRepeatedSpansAged(
            batch, corpusIdx, idCol, textCol, batchId,
            watermarkBatch = watermark, k, minDocs)
          // materialize BOTH outputs before replacing the index the
          // spans were computed from (the read-modify-write hazard)
          val pinnedSpans = spans
            .withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))
            .withColumn("lineage", org.apache.spark.sql.functions.lit(lineage))
            .localCheckpoint(true)
          val pinnedIdx = merged.localCheckpoint(true)
          // spans land BEFORE the publish (at-least-once, keyed by
          // batch_id) — inside the guarded fold so a refused replay
          // never re-appends either
          if (!pinnedSpans.isEmpty) spansOut.append(pinnedSpans)
          pinnedIdx
        }
        if (outcome.published && consolidateSpansEvery > 0 &&
            (batchId + 1) % consolidateSpansEvery == 0)
          consolidateSideOutput(spansOut, lineage, batchId,
            lease = Some(spansLease))
        (): Unit
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
    }
  }

  /** The PARTITION-SCOPED [[spanDedupStream]] body (bucketed index —
    * the 100 TB shape). The persisted index is hash-bucketed on the
    * window digest and holds DELTA rows
    * (wh, n_docs, last_batch, src_batch):
    *
    *  - the probe reads ONLY the buckets the batch's digests hash to
    *    (partition-pruned — sufficient, because a window can only
    *    pair with corpus rows sharing its digest) and consolidates on
    *    read: distinct absorbs replayed appends, rows of this batch's
    *    own crashed publish (src_batch == batchId) are excluded so a
    *    replay probes the exact pre-batch state, counts fold per
    *    digest, and the EAGER stream's previous-batch eviction
    *    horizon is applied on read — so lazily-compacted buckets
    *    report bit-identically to the flat stream's eagerly-compacted
    *    index;
    *  - the publish APPENDS the batch's delta rows — file-additive,
    *    O(batch): no existing file is ever rewritten by a batch (a
    *    per-batch bucket rewrite would still be O(index), since
    *    uniformly-hashed digests touch nearly every bucket);
    *  - replay is absorbed by ALGEBRA, not just the guard: a crashed
    *    publish's re-append lands bit-identical rows (the delta is a
    *    deterministic function of the batch) that every read path
    *    distincts away, so exactly-once application holds even in the
    *    crash window between the append and the meta stamp;
    *  - consolidation is amortized: after the applied-batch stamp
    *    (so a replayed batch can never see its own rows
    *    consolidated), touched buckets past the file threshold fold
    *    + evict via [[compactSpanIndex]]. Untouched buckets compact
    *    lazily at their next touch — run [[compactSpanIndex]] over
    *    [[ParquetTable.bucketIds]] as standalone maintenance to
    *    reclaim them eagerly.
    */
  private def spanDedupStreamBucketed(spark: SparkSession, srcPath: String,
      schema: StructType, index: ParquetTable, spansOut: ParquetTable,
      idCol: String, textCol: String, checkpoint: String,
      k: Int, minDocs: Int, availableNow: Boolean,
      compactAfterBatches: Long, compactFileThreshold: Int,
      consolidateSpansEvery: Int): StreamingQuery = {
    import graft.ops.TextClean
    def watermarkOf(b: Long): Long =
      if (compactAfterBatches == Long.MaxValue) Long.MinValue
      else b - compactAfterBatches
    val lineage = lineageOf(spark, checkpoint)
    leasedStart("spanDedupStream", Seq(index, spansOut)) { leases =>
    val (indexLease, spansLease) = (leases.head, leases(1))
    healLineage(spansOut)
    val stream = spark.readStream.schema(schema).parquet(srcPath)
    val writer = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        val applied = index.tableMeta.get(SpanBatchKey).map(_.toLong)
        if (!applied.exists(_ >= batchId)) {
          val batch = batch0.localCheckpoint(true)
          val prevWatermark = applied.map(watermarkOf).getOrElse(Long.MinValue)
          var touched: Seq[Int] = Nil
          val (spans, batchIdx) = TextClean.incrementalRepeatedSpansVia(
              batch, idCol, textCol, batchId, k, minDocs) { bIdx =>
            touched = bIdx.select(index.bucketExpr.cast("int").as("b"))
              .distinct().collect().map(_.getInt(0)).toSeq.sorted
            if (!index.exists)
              spark.createDataFrame(
                spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                org.apache.spark.sql.types.StructType(Seq(
                  org.apache.spark.sql.types.StructField("wh",
                    org.apache.spark.sql.types.BinaryType),
                  org.apache.spark.sql.types.StructField("n_docs",
                    org.apache.spark.sql.types.LongType),
                  org.apache.spark.sql.types.StructField("last_batch",
                    org.apache.spark.sql.types.LongType))))
            else
              TextClean.spanIndexCompact(
                index.readBuckets(touched)
                  .filter(col("src_batch") =!= lit(batchId))
                  .distinct()
                  .groupBy(col("wh"))
                  .agg(sum(col("n_docs")).as("n_docs"),
                    max(col("last_batch")).as("last_batch")),
                prevWatermark)
          }
          // spans pin BEFORE the publish (the read-modify-write hazard:
          // they are computed against the pre-batch index state)
          val pinnedSpans = spans.withColumn("batch_id", lit(batchId))
            .withColumn("lineage", lit(lineage))
            .localCheckpoint(true)
          if (!pinnedSpans.isEmpty) spansOut.append(pinnedSpans)
          // one file per touched bucket per batch (see nearDupStream)
          index.append(batchIdx.withColumn("src_batch", lit(batchId))
            .repartition(index.buckets, index.bucketExpr))
          index.putTableMeta(SpanBatchKey -> batchId.toString)
          compactSpanIndex(index, watermarkOf(batchId),
            touched.filter(index.bucketFileCount(_) > compactFileThreshold),
            lease = Some(indexLease))
          if (consolidateSpansEvery > 0 &&
              (batchId + 1) % consolidateSpansEvery == 0)
            consolidateSideOutput(spansOut, lineage, batchId,
              lease = Some(spansLease))
        }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
    }
  }

  /** Consolidate the named buckets of a bucketed [[spanDedupStream]]
    * window index PARTITION-SCOPED: delta rows fold per digest
    * (distinct first — replayed appends are bit-identical and must
    * count once), fold results re-stamp as consolidated
    * (src_batch = -1), and singleton windows last seen at or before
    * `watermarkBatch` evict ([[graft.ops.TextClean.spanIndexCompact]]).
    * A bucket whose every row evicts is dropped outright (dynamic
    * partition overwrite cannot express an emptied partition). Runs
    * inside the stream after the applied-batch stamp, or standalone
    * over [[ParquetTable.bucketIds]] as maintenance.
    *
    * CRASH-WINDOW guard (same as [[compactNearDupIndex]]): rows whose
    * `src_batch` exceeds the applied watermark in the table meta
    * belong to a publish that crashed before its stamp. Folding them
    * to src_batch = -1 would defeat the replay's
    * `src_batch =!= batchId` exclusion — the probe would fold the
    * batch's own windows into the corpus and the re-append would
    * double-count n_docs. They are carried through verbatim (distinct
    * only) and consolidate once their batch's stamp lands.
    */
  def compactSpanIndex(index: ParquetTable, watermarkBatch: Long,
      bucketIds: Seq[Int], lease: Option[TableLease] = None): Unit = {
    if (bucketIds.isEmpty) return
    maintained(index, "compactSpanIndex", lease) {
    import graft.ops.TextClean
    val applied = index.tableMeta.get(SpanBatchKey)
      .map(_.toLong).getOrElse(-1L)
    val raw = index.readBuckets(bucketIds)
    val pending = raw.filter(col("src_batch") > applied).distinct()
    val folded = TextClean.spanIndexCompact(
        raw.filter(col("src_batch") <= applied).distinct()
          .groupBy(col("wh"))
          .agg(sum(col("n_docs")).as("n_docs"),
            max(col("last_batch")).as("last_batch")),
        watermarkBatch)
      .withColumn("src_batch", lit(-1L))
      .unionByName(pending)
      .localCheckpoint(true)
    val liveBuckets = folded
      .select(index.bucketExpr.cast("int").as("b")).distinct()
      .collect().map(_.getInt(0)).toSet
    index.dropBuckets(bucketIds.filterNot(liveBuckets))
    if (liveBuckets.nonEmpty)
      index.overwriteBuckets(
        folded.repartition(index.buckets, index.bucketExpr)) // 1 file/bucket
    }
  }

  /** Logical (wh, n_docs, last_batch) content of a [[spanDedupStream]]
    * index regardless of layout (bucketed: consolidated on read).
    * Lazily-compacted buckets may still HOLD out-of-horizon singletons
    * the eager flat stream already pruned — they never affect reports
    * (the probe applies the horizon on read); apply
    * [[graft.ops.TextClean.spanIndexCompact]] to this view for the
    * eager-equivalent state.
    */
  def spanIndexView(index: ParquetTable): DataFrame =
    if (!index.isBucketed) index.read
    else index.read.distinct()
      .groupBy(col("wh"))
      .agg(sum(col("n_docs")).as("n_docs"),
        max(col("last_batch")).as("last_batch"))

  // ---- streaming vocabulary tracker ---------------------------------

  /** Streaming vocabulary tracker — the streaming lift of the q222
    * vocabulary-growth audit: maintain a first-occurrence word index
    * across an ingest feed and append ONE ledger row per micro-batch —
    * (batch_id, n_docs, n_tokens, n_distinct_words, n_new_words,
    * lineage) — the new-word (OOV) rate a tokenizer owner watches on a
    * live feed: a rising rate means the frozen vocabulary is drifting
    * away from what the corpus now contains, and the batch ledger is
    * the same curve q222 computes over ingest history, emitted as the
    * history happens instead of recomputed from it.
    *
    * The [[nearDupStream]] contract family, one table lighter (the
    * ledger rides the index's admission stamp):
    *  - FLAT index (small/medium vocabularies): full union + versioned
    *    overwrite through the one guarded fold-publish
    *    ([[graft.sources.AggView.guardedPublish]]) — exactly-once, but
    *    O(|vocab|) per trigger;
    *  - BUCKETED index (bucket on `wh`): the probe reads ONLY the
    *    buckets the batch's word hashes land in (partition-pruned, and
    *    a natural-language batch touches ~every bucket only when it is
    *    itself vocabulary-sized); the publish APPENDS the batch's new
    *    words — file-additive, O(batch); touched buckets past
    *    `compactFileThreshold` files compact via
    *    [[compactVocabIndex]]. A replayed batch is refused by the
    *    applied-batch stamp; a CRASHED publish's replay probes the
    *    exact pre-batch state (its own `src_batch` rows are excluded
    *    on read), so the re-appended ledger row is BIT-IDENTICAL —
    *    at-least-once keyed on (lineage, batch_id), exactly-once
    *    through [[vocabLedgerView]].
    *
    * A word is a non-empty whitespace token (the q222 rule); n_tokens
    * counts ALL whitespace tokens including empties (the raw
    * tokenizer-input volume). Index rows are (wh = hex60(word) — the
    * bucket key, word, src_batch); novelty joins on the word STRING,
    * so a 60-bit hash collision can never lose a word.
    */
  def vocabTrackStream(spark: SparkSession, srcPath: String,
      schema: StructType, index: ParquetTable, ledgerOut: ParquetTable,
      textCol: String, checkpoint: String,
      availableNow: Boolean = true,
      compactFileThreshold: Int = 12): StreamingQuery = {
    import graft.functions.TextKernels
    if (index.isBucketed) require(index.bucketKey == "wh",
      s"a bucketed vocab index must bucket on wh (the word hash — the " +
        s"probe prunes to the batch's hash buckets): got '${index.bucketKey}'")
    val lineage = lineageOf(spark, checkpoint)
    leasedStart("vocabTrackStream", Seq(index, ledgerOut)) { leases =>
    val indexLease = leases.head
    healLineage(ledgerOut)
    val stream = spark.readStream.schema(schema).parquet(srcPath)
    val writer = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        // pin the batch once: volume stats and the word set otherwise
        // re-read the batch files per consumer
        def prep(): (DataFrame, Long, Long) = {
          val batch = batch0.localCheckpoint(true)
          val toks = TextKernels.tokens(col(textCol))
          val vol = batch.agg(count(lit(1)).as("n"),
            coalesce(sum(size(toks).cast("long")), lit(0L)).as("t")).head
          val words = batch.select(explode(toks).as("word"))
            .filter(col("word") =!= "").distinct()
            .select(TextKernels.hex60(col("word")).as("wh"), col("word"))
            .localCheckpoint(true)
          (words, vol.getLong(0), vol.getLong(1))
        }
        def ledgerRow(nDocs: Long, nToks: Long, nWords: Long,
            nNew: Long): DataFrame = {
          import spark.implicits._
          Seq((batchId, nDocs, nToks, nWords, nNew))
            .toDF("batch_id", "n_docs", "n_tokens", "n_distinct_words",
              "n_new_words")
            .withColumn("lineage", lit(lineage))
        }
        if (index.isBucketed) {
          val applied = index.tableMeta.get(AppliedBatchKey).map(_.toLong)
          if (!applied.exists(_ >= batchId)) {
            val (words, nDocs, nToks) = prep()
            val nWords = words.count()
            val touched = words.select(index.bucketExpr.cast("int").as("b"))
              .distinct().collect().map(_.getInt(0)).toSeq.sorted
            val novel = (if (index.exists)
              words.join(index.readBuckets(touched)
                  .filter(col("src_batch") =!= lit(batchId))
                  .select(col("word")).distinct(),
                Seq("word"), "left_anti")
            else words).localCheckpoint(true)
            // ledger lands BEFORE the publish (at-least-once, keyed by
            // (lineage, batch_id); bit-identical on a crash replay —
            // the probe above excluded this batch's own crashed rows)
            ledgerOut.append(ledgerRow(nDocs, nToks, nWords, novel.count()))
            // one file per touched bucket per batch (see nearDupStream)
            index.append(novel.select(col("wh"), col("word"))
              .withColumn("src_batch", lit(batchId))
              .repartition(index.buckets, index.bucketExpr))
            index.putTableMeta(AppliedBatchKey -> batchId.toString)
            compactVocabIndex(index,
              touched.filter(index.bucketFileCount(_) > compactFileThreshold),
              lease = Some(indexLease))
          }
        } else {
          graft.sources.AggView.guardedPublish(index, AppliedBatchKey,
            batchId.toString, admitBatch(batchId)) {
            val (words, nDocs, nToks) = prep()
            val novel = (if (index.exists)
              words.join(index.read.select(col("word")).distinct(),
                Seq("word"), "left_anti")
            else words).localCheckpoint(true)
            ledgerOut.append(ledgerRow(nDocs, nToks, words.count(),
              novel.count()))
            if (index.exists) index.read.unionByName(novel).distinct()
            else novel.distinct()
          }
          (): Unit
        }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
    }
  }

  /** Consolidate the named buckets of a bucketed [[vocabTrackStream]]
    * word index PARTITION-SCOPED: settled rows (src_batch at or below
    * the applied watermark) fold to one row per word re-stamped
    * src_batch = -1; crash-window rows (src_batch ABOVE the watermark
    * — appended by a publish that crashed before its stamp) carry
    * through verbatim apart from the bit-identical-replay distinct,
    * exactly the [[compactNearDupIndex]] guard: folding them would
    * defeat the replay's `src_batch =!= batchId` exclusion and the
    * replay would see its own crashed words as corpus (n_new_words
    * would drop — a WRONG ledger row, not just a storage artifact).
    * Runs inside the stream after the stamp, or standalone between
    * runs under the table lease.
    */
  def compactVocabIndex(index: ParquetTable, bucketIds: Seq[Int],
      lease: Option[TableLease] = None): Unit = {
    if (bucketIds.isEmpty) return
    maintained(index, "compactVocabIndex", lease) {
      val applied = index.tableMeta.get(AppliedBatchKey)
        .map(_.toLong).getOrElse(-1L)
      val raw = index.readBuckets(bucketIds)
      val folded = raw.filter(col("src_batch") <= applied)
        .select(col("wh"), col("word")).distinct()
        .withColumn("src_batch", lit(-1L))
        .unionByName(raw.filter(col("src_batch") > applied).distinct())
        .localCheckpoint(true)
      index.overwriteBuckets(
        folded.repartition(index.buckets, index.bucketExpr)) // 1 file/bucket
    }
  }

  /** The distinct words of a [[vocabTrackStream]] index regardless of
    * layout: (wh, word) — bucketed appends consolidate on read
    * (crashed-publish replays re-append bit-identically).
    */
  def vocabIndexView(index: ParquetTable): DataFrame =
    index.read.select(col("wh"), col("word")).distinct()

  /** Exactly-once reading of the [[vocabTrackStream]] ledger: rows
    * append BEFORE the index publish and re-append bit-identically on
    * a crash replay (the probe excludes the crashed batch's own rows),
    * keyed by (lineage, batch_id) — `distinct` is the exactly-once
    * view. The running vocabulary size is the per-lineage prefix sum
    * of n_new_words, computed here over the ledger's few rows rather
    * than stored (a vocab_after column would need an O(index) count
    * per trigger — the one thing an O(batch) trigger must not do).
    */
  def vocabLedgerView(ledger: ParquetTable): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    ledger.read.distinct()
      .withColumn("cum_vocab", sum(col("n_new_words")).over(
        Window.partitionBy(col("lineage")).orderBy(col("batch_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
