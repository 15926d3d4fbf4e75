package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Re-identification risk auditing — the release-side companion
  * of [[TextClean.scrub]]'s ingestion-side PII redaction: before a
  * dataset (or the quasi-identifier columns of a training corpus's
  * metadata) ships, measure how identifying its attribute
  * combinations are.
  *
  * k-anonymity: a row is k-anonymous if at least k rows share its
  * quasi-identifier (QI) combination; combinations below k — and
  * especially singletons — are re-identification risks.
  *
  * Shape at scale: one hash aggregation on the QI combination (partial
  * map-side), then a second over the tiny bucket domain — group-size
  * auditing never sorts and never joins the base table.
  */
object Privacy {

  /** Per-risk-bucket audit: QI combinations and rows that are
    * `unique` (size 1), `small` (2..k-1), or `anonymous` (≥ k).
    * `df` should be pre-projected to the QI columns (derive/bin them
    * in the projection — banded continuous attributes, truncated
    * dates — since raw high-cardinality attributes make everything
    * unique and the audit vacuous).
    */
  def kAnonymityReport(df: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"k below 2 makes every row anonymous: $k")
    val groups = df.groupBy(df.columns.map(col): _*)
      .agg(count(lit(1)).as("__n"))
    groups.groupBy(
        when(col("__n") === 1, lit("unique"))
          .when(col("__n") < k, lit("small"))
          .otherwise(lit("anonymous")).as("bucket"))
      .agg(count(lit(1)).as("n_combos"), sum(col("__n")).as("n_rows"))
  }

  /** The failing combinations themselves (group size < k) with their
    * sizes — what a release gate inspects or suppresses. Output is the
    * QI columns + `group_size`.
    */
  def riskyCombos(df: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"k below 2 flags nothing: $k")
    df.groupBy(df.columns.map(col): _*)
      .agg(count(lit(1)).as("group_size"))
      .filter(col("group_size") < k)
  }

  /** l-diversity audit (Machanavajjhala et al., ICDE 2006 — public
    * definition): k-anonymity is defeated when everyone in a large QI
    * bucket SHARES the sensitive value, so the stronger gate requires
    * every QI combination to contain at least `l` DISTINCT sensitive
    * values. `qiCols` are the quasi-identifiers (pre-binned, as in
    * [[kAnonymityReport]]); `sensitiveCol` the attribute being
    * protected.
    *
    * Shape: one exact two-level distinct — groupBy (QI, sensitive)
    * pre-reduces map-side, then the QI rollup counts rows and distinct
    * values without an Expand (the q97 FD-check aggregation shape) —
    * then a bucket rollup over the combo domain. Never joins the base
    * table.
    *
    * Output: one row per risk bucket — `diverse` (≥ l values),
    * `homogeneous` (exactly 1), `low` (2..l-1) — with combo/row counts
    * and the bucket's minimum diversity.
    */
  def lDiversityReport(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, l: Int): DataFrame = {
    require(l >= 2, s"l below 2 makes every combo diverse: $l")
    val qi = qiCols.map(col)
    val combos = df
      .groupBy(qi :+ col(sensitiveCol): _*)
      .agg(count(lit(1)).as("__n"))
      .groupBy(qi: _*)
      .agg(sum(col("__n")).as("__rows"), count(lit(1)).as("__l"))
    combos.groupBy(
        when(col("__l") === 1, lit("homogeneous"))
          .when(col("__l") < l, lit("low"))
          .otherwise(lit("diverse")).as("bucket"))
      .agg(count(lit(1)).as("n_combos"), sum(col("__rows")).as("n_rows"),
        min(col("__l")).as("min_diversity"))
  }
}
