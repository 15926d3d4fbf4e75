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

  /** t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007): per
    * quasi-identifier combo, the ordered-domain earth-mover's distance
    * between the combo's sensitive-value distribution and the GLOBAL
    * one, in EXACT integer arithmetic — a release is t-close when
    * every combo's EMD stays under t. The sensitive column must be
    * ordinal (an integer; bucket continuous values first).
    *
    * EMD over an ordered domain with unit steps is
    * `Σᵢ |CumG(i)/nG − Cum(i)/n| / (|D| − 1)` over all but the last
    * domain point; cross-multiplying by `nG·n` keeps every term an
    * exact integer, and the report scales to ppm with one integer
    * division at the end — both engines agree bit-for-bit with no
    * float anywhere (the q134 integer-mass rule).
    *
    * Shape: one (combo, value) aggregation, a combo × domain GRID
    * (distinct combos ⨯ distinct sensitive values — privacy audits
    * run on low-cardinality quasi/ordinal columns, so the grid is
    * combos·|D| rows, never corpus-sized), two prefix-sum windows, one
    * final aggregation. Output: (qiCols..., n_rows, emd_ppm).
    */
  def tClosenessReport(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String): DataFrame = {
    val qi = qiCols.map(col)
    val rows = df.select(qi :+ col(sensitiveCol).cast("long").as("__v"): _*)
      .filter(col("__v").isNotNull)
    val cell = rows.groupBy(qi :+ col("__v"): _*)
      .agg(count(lit(1)).as("__c"))
    // combo × domain grid, so between-value flats of the group's
    // cumulative distribution are evaluated at every global domain
    // point (EMD sums over the DOMAIN, not the combo's support)
    val domain = cell.select(col("__v")).distinct()
    val combos = cell.groupBy(qi: _*).agg(sum(col("__c")).as("__ng"))
    val grid = combos.crossJoin(broadcast(domain))
      .join(cell, qiCols :+ "__v", "left")
      .withColumn("__c", coalesce(col("__c"), lit(0L)))
    val byCombo = org.apache.spark.sql.expressions.Window
      .partitionBy(qi: _*).orderBy(col("__v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    // the global cumulative at each domain point is combo-independent:
    // compute it ONCE on the (broadcast-sized) per-value table
    val domCum = cell.groupBy(col("__v")).agg(sum(col("__c")).as("__cv"))
      .withColumn("__cum", sum(col("__cv")).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("__v"))
          .rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)))
      .select(col("__v"), col("__cum"))
    val total = rows.count()
    val nDomain = domain.count()
    require(nDomain >= 2, s"t-closeness needs >= 2 domain values: $nDomain")
    val stepped = grid.join(broadcast(domCum), Seq("__v"))
      .withColumn("__cumg", sum(col("__c")).over(byCombo))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(qi: _*).orderBy(col("__v"))))
      // all but the LAST domain point contribute a step
      .filter(col("__rn") < nDomain)
      // decimal(38,0) keeps the cross-multiplied masses exact at any
      // corpus scale (cumg·n reaches n² — far past a long at 100 TB)
      .withColumn("__term",
        abs(col("__cumg").cast("decimal(38,0)") * lit(total) -
          col("__cum").cast("decimal(38,0)") * col("__ng")))
    stepped.groupBy(qi: _*)
      .agg(min(col("__ng")).as("n_rows"),
        expr(s"CAST(sum(__term) * 1000000 DIV " +
          s"(CAST(min(__ng) AS DECIMAL(38,0)) * ${total}L * " +
          s"${nDomain - 1}L) AS BIGINT)").as("emd_ppm"))
  }
}
