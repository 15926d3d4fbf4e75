package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] Data-quality expectations: a declarative rule battery
  * evaluated as ONE aggregation pass per table (plus one anti-join per
  * referential rule) — the dbt-test / Great-Expectations surface an
  * ETL engine runs before publishing a load, re-expressed Spark-first.
  *
  * Scale shape: every row-local rule (not-null, range, set membership,
  * regex) is a `sum(violates)` column in a SINGLE wide aggregation —
  * one scan however many rules are declared, map-side partials, a
  * 1-row result melted to the report. `unique` rules add one
  * count-distinct each (pre-reduced on the key); `foreignKey` rules
  * anti-join against the referenced key's DISTINCT values (broadcast
  * when small, else a co-partitioned hash join — never row×row).
  * Violation counts are exact longs.
  *
  * Output: (rule, column, violations, total, pass) — one row per rule.
  */
object Expectations {

  sealed trait Rule { def name: String; def column: String }
  /** Column must never be null. */
  final case class NotNull(column: String) extends Rule { val name = "not_null" }
  /** Column values must be unique (nulls don't count as duplicates). */
  final case class Unique(column: String) extends Rule { val name = "unique" }
  /** lo ≤ value ≤ hi (violations count non-null out-of-range rows). */
  final case class InRange(column: String, lo: Double, hi: Double) extends Rule {
    val name = "in_range"
  }
  /** Value ∈ accepted set (violations count non-null strays). */
  final case class InSet(column: String, accepted: Seq[String]) extends Rule {
    val name = "in_set"
  }
  /** Every non-null value must exist in `ref`'s `refColumn`. */
  final case class ForeignKey(column: String, ref: DataFrame, refColumn: String)
    extends Rule { val name = "foreign_key" }

  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val total = count(lit(1)).as("__total")
    // row-local rules: one violation-sum column each, single pass
    val rowLocal = rules.collect {
      case NotNull(c) =>
        (s"not_null|$c", sum(when(col(c).isNull, 1L).otherwise(0L)))
      case InRange(c, lo, hi) =>
        (s"in_range|$c", sum(when(col(c).isNotNull &&
          (col(c) < lo || col(c) > hi), 1L).otherwise(0L)))
      case InSet(c, acc) =>
        (s"in_set|$c", sum(when(col(c).isNotNull &&
          !col(c).isInCollection(acc), 1L).otherwise(0L)))
      case Unique(c) =>
        // duplicates = non-null rows minus distinct non-null values
        (s"unique|$c", sum(when(col(c).isNotNull, 1L).otherwise(0L)) -
          count_distinct(col(c)))
    }
    val aggs: Seq[Column] =
      total +: rowLocal.map { case (key, c) => c.as(s"__v|$key") }
    val base = df.agg(aggs.head, aggs.tail: _*)
    val melted = base.select(col("__total"),
      explode(array(rowLocal.map { case (key, _) =>
        struct(lit(key).as("k"), col(s"`__v|$key`").as("v"))
      }: _*)).as("r"))
      .select(split(col("r.k"), "\\|").getItem(0).as("rule"),
        split(col("r.k"), "\\|").getItem(1).as("column"),
        col("r.v").cast("long").as("violations"),
        col("__total").cast("long").as("total"))
    // referential rules: one distinct-key anti-join each
    val fks = rules.collect { case ForeignKey(c, ref, rc) =>
      // one pass: left join against the DISTINCT reference keys (no
      // fanout) counts misses and total together — no scalar cross join
      val keys = ref.select(col(rc).as("__k")).distinct()
        .withColumn("__hit", lit(1))
      df.select(col(c).as("__k"))
        .join(keys, Seq("__k"), "left")
        .agg(
          sum(when(col("__k").isNotNull && col("__hit").isNull, 1L)
            .otherwise(0L)).as("violations"),
          count(lit(1)).as("total"))
        .select(lit("foreign_key").as("rule"), lit(c).as("column"),
          col("violations").cast("long").as("violations"),
          col("total").cast("long").as("total"))
    }
    (melted +: fks).reduce(_ unionByName _)
      .withColumn("pass", col("violations") === 0L)
  }
}
