package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Merge-on-duplicate-key upsert — the core of the reference's
  * `insertData` / `mergeTables` (mysql.js:258-393, 547-599;
  * redshift.js:397-424; snowflake.js:868-954), re-expressed as the
  * canonical Spark pattern: keep-one dedup of the source, anti-join of
  * the destination against the source keys, then unionByName.
  *
  * Scale notes: the anti-join and the window dedup shuffle on the same
  * keys, so Catalyst reuses one exchange; with AQE on, a small source
  * side becomes a broadcast anti-join automatically. Nothing touches
  * the driver.
  */
object Upsert {

  /** New rows win over old on key collision. Source rows are first
    * deduplicated per key: keep-latest by `orderBy` descending (the
    * Redshift `MAX(updated_at)` semantics, redshift.js:400-413) when
    * given, else keep an arbitrary single row per key (the Snowflake
    * first-seen `mapOfMergeKeys` semantics, snowflake.js:611-638).
    */
  def apply(dest: DataFrame, src: DataFrame, keys: Seq[String],
      orderBy: Seq[String] = Nil): DataFrame = {
    val srcOne = dedupPerKey(src, keys, orderBy)
    val destAligned = align(dest, srcOne)
    val srcAligned = align(srcOne, destAligned)
    destAligned.join(srcAligned.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(srcAligned)
  }

  /** Keep-one row per key: keep-latest by `orderBy` descending when
    * given, else an arbitrary single row. The SAME rule must apply on
    * a table's very first batch as on every later merge (a stale row
    * winning the initial load poisons all subsequent upserts), which
    * is why this is shared rather than inlined in [[apply]].
    */
  def dedupPerKey(src: DataFrame, keys: Seq[String],
      orderBy: Seq[String] = Nil): DataFrame =
    if (orderBy.nonEmpty) {
      val w = Window.partitionBy(keys.map(col): _*)
        .orderBy(orderBy.map(c => col(c).desc): _*)
      src.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    } else src.dropDuplicates(keys)

  /** Append-or-fail (`mergeOnDuplicates=false`, mysql.js:369-377 else
    * branch): plain append; key uniqueness is the caller's contract.
    */
  def append(dest: DataFrame, src: DataFrame): DataFrame =
    align(dest, src).unionByName(align(src, dest))

  /** FIELD-level document merge — the Elasticsearch `update` contract
    * (elasticsearch.js:30-66; golden: an update carrying only
    * {id, happy} must preserve the doc's other fields,
    * test/connections/elasticsearch.js:97-142): on key match, columns
    * PRESENT in the source batch overwrite, columns absent from the
    * batch keep their destination values; unmatched source docs are
    * created. One full-outer join on the key — same shuffle budget as
    * the row-level upsert.
    */
  def fieldMerge(dest: DataFrame, src: DataFrame, key: String): DataFrame = {
    val srcCols = src.columns.toSet - key
    val d = align(dest, src).alias("d")
    val s = src.dropDuplicates(key).withColumn("__present", lit(1)).alias("s")
    val outCols = d.columns.filter(_ != key).map { c =>
      (if (srcCols.contains(c))
        when(col("s.__present").isNotNull, col(s"s.$c")).otherwise(col(s"d.$c"))
      else col(s"d.$c")).as(c)
    }
    d.join(s, Seq(key), "full_outer")
      .select((col(key) +: outCols.toSeq): _*)
  }

  /** Schema reconciliation (reference auto-add-column,
    * mysql.js:299-317): add columns present in `other` but missing
    * here, as typed NULLs, so unionByName sees identical schemas.
    */
  private def align(df: DataFrame, other: DataFrame): DataFrame = {
    val have = df.columns.toSet
    other.schema.fields.filterNot(f => have.contains(f.name))
      .foldLeft(df)((d, f) => d.withColumn(f.name, lit(null).cast(f.dataType)))
  }
}
