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
}
