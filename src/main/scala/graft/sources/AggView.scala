package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Cdc

/** An incrementally-maintained materialized aggregate: a versioned
  * [[ParquetTable]] holding `groupBy(groupKey).agg(count, sum(cols))`
  * of a versioned base table, refreshed by DELTA — each refresh reads
  * only the CDC change set between the base version the view last
  * applied and the live one ([[ParquetTable.diffVersions]] →
  * [[Cdc.applyDelta]]), never the base rows themselves.
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
  * view further behind (or whose metadata is missing — e.g. a view
  * table compacted by maintenance) falls back to a FULL rebuild,
  * loudly in the result, never silently wrong.
  *
  * At 100 TB: a delta refresh costs the diff join (delta-sized by the
  * upsert contract) + the view-sized merge — the base table is never
  * re-aggregated. The refresh-every-publish cadence is what keeps the
  * view inside the retention window.
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
    * applied base version.
    */
  def build(base: ParquetTable): RefreshResult = {
    val cur = baseVersion(base)
    view.overwrite(aggregate(base.read), meta = Map(AppliedKey -> cur))
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
    view.currentMeta.get(AppliedKey) match {
      case Some(applied) if applied == cur =>
        RefreshResult("noop", from = Some(applied), to = cur)
      case Some(applied) if base.versions.contains(applied) =>
        val merged = Cdc.applyDelta(view.read,
          base.diffVersions(applied, cur, rowKey), groupKey, sumCols)
        view.overwrite(merged, meta = Map(AppliedKey -> cur))
        RefreshResult("delta", from = Some(applied), to = cur)
      case stale => // never built, metadata lost, or out of retention
        val r = build(base)
        r.copy(from = stale)
    }
  }
}

object AggView {
  val AppliedKey = "graft.aggview.applied"

  private def baseVersion(base: ParquetTable): String =
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
