package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Cdc

/** An incrementally-maintained materialized aggregate: a versioned
  * [[ParquetTable]] holding `groupBy(groupKey).agg(count, sum(cols))`
  * of a versioned base table, refreshed by DELTA — each refresh
  * derives (or, with [[refreshWith]], is handed) the CDC change set
  * between the base version the view last applied and the live one
  * ([[ParquetTable.diffVersions]] → [[Cdc.applyDelta]]), and only
  * that delta reaches the aggregate merge.
  *
  * Consistency: the applied base version is recorded as
  * version-pinned metadata INSIDE the view snapshot it describes
  * (`overwrite(meta = …)`), published by the same atomic pointer PUT
  * as the data — so a crash at ANY point leaves the view either fully
  * at the old (data, applied) pair or fully at the new one; a re-run
  * re-derives the same delta. No refresh step depends on a second
  * out-of-band write.
  *
  * Retention: the base's GC keeps one prior snapshot, so delta
  * refresh works when the view is at most one base publish behind. A
  * view further behind, whose metadata is missing (e.g. a view table
  * compacted by maintenance), or whose applied version is not
  * STRICTLY OLDER than live (the base rolled back under it) falls
  * back to a FULL rebuild, loudly in the result, never silently
  * wrong. Version names are publish-unique within retention
  * ([[VersionedLayout.freshVersion]]); IN-PLACE mutations of a live
  * version (`append`, the bucketed partition-scoped upsert) are
  * caught by the base's [[ParquetTable.mutationCount]], recorded
  * alongside the applied version — a name+count pair can never denote
  * different data than it did when recorded, and a mutated base
  * degrades to the same loud full rebuild.
  *
  * Cost honesty at 100 TB: [[ParquetTable.diffVersions]] DERIVES the
  * change set by scanning both retained base snapshots and joining on
  * the row key — its OUTPUT is delta-sized, its input is two base
  * reads. [[refresh]] therefore trades base I/O for never
  * re-aggregating and never re-shuffling base rows (scans pipeline
  * into the map-side struct-pack; only diff output reaches the merge).
  * When the pipeline already HAS a stored change feed (the upsert
  * path can emit one), [[refreshWith]] applies it directly and the
  * refresh touches no base data at all.
  */
final case class AggView(
    view: ParquetTable,
    groupKey: String,
    sumCols: Seq[String]) {

  import AggView._

  private def aggregate(rows: DataFrame): DataFrame =
    rows.groupBy(col(groupKey)).agg(
      count(lit(1)).as("n_rows"),
      sumCols.map(c => sum(col(c)).as(c)): _*)

  /** Full (re)build from the base's live snapshot, recording the
    * applied base version AND its in-place mutation count (appends /
    * bucketed upserts mutate a live version without renaming it — the
    * count is what lets refresh notice).
    */
  def build(base: ParquetTable): RefreshResult = {
    val cur = baseVersion(base)
    val muts = base.mutationCount
    view.overwrite(aggregate(base.read),
      meta = Map(AppliedKey -> cur, AppliedMutsKey -> muts.toString))
    RefreshResult("full", to = cur)
  }

  /** Refresh to the base's live version: no-op if already there,
    * delta-merge if the applied version is still retained, full
    * rebuild otherwise.
    *
    * `rowKey` is the base table's CDC row key (unique per snapshot —
    * the upsert invariant), NOT the aggregation key.
    */
  def refresh(base: ParquetTable, rowKey: String): RefreshResult = {
    val cur = baseVersion(base)
    val meta = view.currentMeta
    def appliedMuts = meta.get(AppliedMutsKey).map(_.toLong).getOrElse(0L)
    meta.get(AppliedKey) match {
      // same version AND same in-place mutation count — only then is
      // "same name" actually "same data" (append/overwriteBuckets
      // mutate the live version dir without renaming it)
      case Some(applied) if applied == cur && base.mutationCount == appliedMuts =>
        RefreshResult("noop", from = Some(applied), to = cur)
      // `applied < cur` guards the rolled-back base: an applied
      // version NEWER than live cannot be delta-diffed (and the view
      // may hold data live never had) — rebuild, don't throw. The
      // retained old version must ALSO still carry the mutation count
      // the view applied — if it was appended to after the view read
      // it, the diff would be against data the view never saw.
      case Some(applied) if applied < cur && base.versions.contains(applied) &&
          base.mutationCountOf(applied) == appliedMuts =>
        val merged = Cdc.applyDelta(view.read,
          base.diffVersions(applied, cur, rowKey), groupKey, sumCols)
        view.overwrite(merged, meta = Map(AppliedKey -> cur,
          AppliedMutsKey -> base.mutationCount.toString))
        RefreshResult("delta", from = Some(applied), to = cur)
      case stale => // never built, metadata lost, rolled back, out of
        val r = build(base) // retention, or base mutated in place
        r.copy(from = stale)
    }
  }

  /** Apply a STORED change feed (the [[Cdc.changeSet]] shape) that
    * advances the view from exactly its applied base version `from`
    * to `to` — the zero-base-read refresh for pipelines that persist
    * their CDC deltas. Refuses (returns a "stale" no-write result)
    * unless `from` matches the view's applied version, so a replayed
    * or skipped feed segment can never double-apply or gap the view.
    */
  def refreshWith(changes: DataFrame, from: String, to: String): RefreshResult = {
    // `to` is a freshly published base version: mutation count 0 at
    // publish; later in-place appends are caught by refresh()
    val outcome = guardedPublish(view, AppliedKey, to,
      admit = m => m.contains(from) && from < to,
      extraMeta = Map(AppliedMutsKey -> "0"))(
      Cdc.applyDelta(view.read, changes, groupKey, sumCols))
    if (outcome.published) RefreshResult("delta", from = Some(from), to = to)
    // sawMarker IS the applied version the guard read — no second
    // pointer round-trip (which could also disagree with the branch
    // taken)
    else RefreshResult("stale", from = outcome.sawMarker,
      to = outcome.sawMarker.getOrElse(""))
  }
}

/** The non-distributive sibling of [[AggView]]: the snapshot is
  * `aggFn(base rows)` for an arbitrary per-`groupKey` aggregation
  * (MIN/MAX, exact distincts — anything a delta cannot patch), and
  * refresh re-aggregates ONLY the groups the CDC diff touches
  * ([[Cdc.refreshGroups]]): untouched snapshot rows carry over
  * unread; touched groups recompute from the base via a broadcast
  * semi-join probe. Same applied-version bookkeeping, rollback
  * guard, and loud full-rebuild degradation as [[AggView]].
  *
  * `aggFn` must aggregate by `groupKey` and produce the view's full
  * schema — the same function serves build and refresh, so the two
  * can never drift.
  */
final case class RefreshView(view: ParquetTable, groupKey: String)(
    aggFn: DataFrame => DataFrame) {

  import AggView._

  def build(base: ParquetTable): RefreshResult = {
    val cur = baseVersion(base)
    val muts = base.mutationCount
    view.overwrite(aggFn(base.read),
      meta = Map(AppliedKey -> cur, AppliedMutsKey -> muts.toString))
    RefreshResult("full", to = cur)
  }

  def refresh(base: ParquetTable, rowKey: String): RefreshResult = {
    val cur = baseVersion(base)
    val meta = view.currentMeta
    def appliedMuts = meta.get(AppliedMutsKey).map(_.toLong).getOrElse(0L)
    meta.get(AppliedKey) match {
      case Some(applied) if applied == cur && base.mutationCount == appliedMuts =>
        RefreshResult("noop", from = Some(applied), to = cur)
      case Some(applied) if applied < cur && base.versions.contains(applied) &&
          base.mutationCountOf(applied) == appliedMuts =>
        val patched = Cdc.refreshGroups(view.read, base.read,
          base.diffVersions(applied, cur, rowKey), groupKey)(aggFn)
        view.overwrite(patched, meta = Map(AppliedKey -> cur,
          AppliedMutsKey -> base.mutationCount.toString))
        RefreshResult("delta", from = Some(applied), to = cur)
      case stale =>
        val r = build(base)
        r.copy(from = stale)
    }
  }
}

object AggView {
  val AppliedKey = "graft.aggview.applied"
  val AppliedMutsKey = "graft.aggview.applied_muts"

  /** What [[guardedPublish]] did: whether the fold was published, and
    * the applied marker the guard READ (one read — callers must not
    * re-read the pointer to report, it could disagree with the branch
    * taken).
    */
  final case class PublishOutcome(published: Boolean, sawMarker: Option[String])

  /** The ONE exactly-once guarded fold-publish that every maintained
    * snapshot goes through — [[AggView.refreshWith]] (batch CDC view,
    * version-name markers) and the streaming maintain folds
    * ([[graft.streaming.StreamingLift]]'s maintainAggStream /
    * sketch-state maintain streams / drift baseline, batch-id
    * markers): read the snapshot's applied marker under `markerKey`;
    * if `admit(marker)` rejects it the publish is REFUSED — the fold
    * is never evaluated, nothing is written; otherwise `next`
    * evaluates and publishes with the marker (and `extraMeta`)
    * recorded version-pinned, atomically with the data it describes.
    * Replay and refusal semantics live HERE, once.
    *
    * `next` is by-name deliberately: side effects that must precede
    * the publish but follow the admit decision (e.g. a drift stream's
    * alert-ledger append) run inside it. The bucketed streaming
    * indexes (nearDup/span) are the one maintained surface NOT routed
    * here: their publish is a file-additive in-place append guarded
    * by table-scoped metadata and absorbed by read-side algebra, not
    * a versioned overwrite — see their docs.
    */
  def guardedPublish(snapshot: ParquetTable, markerKey: String,
      marker: String, admit: Option[String] => Boolean,
      extraMeta: Map[String, String] = Map.empty)(
      next: => DataFrame): PublishOutcome = {
    val applied = snapshot.currentMeta.get(markerKey)
    if (!admit(applied)) PublishOutcome(published = false, applied)
    else {
      snapshot.overwrite(next, meta = extraMeta + (markerKey -> marker))
      PublishOutcome(published = true, applied)
    }
  }

  private[sources] def baseVersion(base: ParquetTable): String =
    base.liveVersion.getOrElse(throw new IllegalStateException(
      s"AggView requires a VERSIONED base table (overwritten at least " +
        s"once): ${base.path} has no published version"))

  /** What a refresh did: `mode` ∈ full|delta|noop, `from` = previously
    * applied base version (None on first build / lost metadata),
    * `to` = the base version now applied.
    */
  final case class RefreshResult(mode: String, from: Option[String] = None,
      to: String)
}
