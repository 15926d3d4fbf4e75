package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture primitives: a keyed change set between two
  * snapshots of a table, and incremental maintenance of a materialized
  * aggregate from such a change set (the classic IVM delta-merge).
  *
  * The reference engine re-extracts and re-aggregates whole tables per
  * run (empujar lib/book.js run loop — every chapter reloads its
  * inputs); here the 100 TB path is the opposite: diff once, then
  * touch ONLY the keys the diff names. A 1 GB delta against a 100 TB
  * fact table updates a per-key aggregate with a shuffle sized by the
  * delta, not the table.
  */
object Cdc {

  /** Keyed change set between an older and a newer snapshot of the
    * same logical table: one row per inserted / deleted / updated key,
    * unchanged keys dropped.
    *
    * Column drift between the snapshots is tolerated: the output
    * `before`/`after` structs carry the union of both schemas (absent
    * columns null), and shared columns compare after casting both
    * sides to the NEWER snapshot's type, so a widening load does not
    * diff as a false all-rows update.
    *
    * Shape at scale: ONE full-outer join on the key — uniform by the
    * upsert contract, AQE-sized — with each side pre-packed into a
    * single struct map-side; the classify is a codegen'd
    * null/equality check (`<=>` so null fields compare stably).
    * Unchanged rows drop before anything else happens to them.
    *
    * Output: (key, change ∈ insert|delete|update, before, after) —
    * struct columns, null on the absent side.
    */
  def changeSet(a: DataFrame, b: DataFrame, key: String): DataFrame = {
    // union of columns in a stable order; the newer snapshot's type
    // wins for shared columns
    val allCols = (a.columns ++ b.columns.filterNot(a.columns.contains(_))).toSeq
    val types = (a.schema.fields ++ b.schema.fields)
      .map(f => f.name -> f.dataType).toMap // later (b) entries win
    def packed(df: DataFrame, as: String) = {
      val have = df.columns.toSet
      struct(allCols.map { c =>
        (if (have(c)) col(c).cast(types(c)) else lit(null).cast(types(c))).as(c)
      }: _*).as(as)
    }
    val av = a.select(col(key).cast(types(key)).as("__ka"), packed(a, "before"))
    val bv = b.select(col(key).cast(types(key)).as("__kb"), packed(b, "after"))
    av.join(bv, av("__ka") <=> bv("__kb"), "full_outer")
      .withColumn("change",
        when(col("before").isNull, lit("insert"))
          .when(col("after").isNull, lit("delete"))
          .when(!(col("before") <=> col("after")), lit("update")))
      .filter(col("change").isNotNull)
      .select(coalesce(col("__ka"), col("__kb")).as(key),
        col("change"), col("before"), col("after"))
  }

  /** Incrementally maintain a materialized per-key COUNT/SUM aggregate
    * from a [[changeSet]], without touching the base table.
    *
    * `snapshot` is the prior aggregate state with columns
    * `(groupKey, n_rows, sumCols*)` where each sum column is named
    * after the base-table column it sums. `changes` is a changeSet
    * whose `before`/`after` structs contain `groupKey` and every sum
    * column.
    *
    * Each change contributes signed deltas: an insert adds `after`'s
    * values to `after`'s group, a delete subtracts `before`'s from
    * `before`'s group, and an update does both — which also handles a
    * row MOVING between groups (the two contributions land on
    * different keys). Groups whose maintained count reaches zero are
    * dropped, matching a full recompute.
    *
    * Shape at scale: the deltas aggregate map-side down to one row per
    * TOUCHED group, then a single outer join against the (already
    * aggregated, small-per-key) snapshot — no scan of the base table.
    * With the snapshot stored bucketed on `groupKey` the join
    * co-locates and only the delta side shuffles.
    *
    * Null semantics match recompute: SUM ignores null inputs, and a
    * group whose sum is null on both sides stays null rather than
    * becoming zero.
    */
  def applyDelta(
      snapshot: DataFrame,
      changes: DataFrame,
      groupKey: String,
      sumCols: Seq[String]): DataFrame = {
    def side(src: String, changesKept: Seq[String], sign: Int) = {
      val cols =
        col(s"$src.$groupKey").as(groupKey) +:
          lit(sign.toLong).as("__dn") +:
          sumCols.map(c =>
            (if (sign >= 0) col(s"$src.$c") else negate(col(s"$src.$c"))).as(c))
      changes.filter(col("change").isin(changesKept: _*)).select(cols: _*)
    }
    val delta = side("after", Seq("insert", "update"), 1)
      .unionByName(side("before", Seq("delete", "update"), -1))
      .groupBy(col(groupKey))
      .agg(sum(col("__dn")).as("__dn"),
        sumCols.map(c => sum(col(c)).as(s"__d_$c")): _*)

    val zeroFor = snapshot.schema.fields.map(f => f.name -> f.dataType).toMap
    def merged(c: String) = {
      val s = snapshot(c)
      val d = delta(s"__d_$c")
      when(s.isNull && d.isNull, lit(null).cast(zeroFor(c)))
        .otherwise(coalesce(s, lit(0).cast(zeroFor(c))) +
          coalesce(d, lit(0).cast(zeroFor(c))))
        .cast(zeroFor(c)).as(c)
    }
    snapshot.join(delta, snapshot(groupKey) <=> delta(groupKey), "full_outer")
      .select(
        coalesce(snapshot(groupKey), delta(groupKey)).as(groupKey) +:
          (coalesce(snapshot("n_rows"), lit(0L)) +
            coalesce(delta("__dn"), lit(0L))).as("n_rows") +:
          sumCols.map(merged): _*)
      .filter(col("n_rows") > 0)
  }

  /** The distinct group keys a [[changeSet]] touches — both the group
    * a row left and the group it joined (null-key groups included,
    * matched null-safe downstream).
    */
  def touchedGroups(changes: DataFrame, groupKey: String): DataFrame =
    changes.filter(col("change").isin("delete", "update"))
      .select(col(s"before.$groupKey").as(groupKey))
      .unionByName(changes.filter(col("change").isin("insert", "update"))
        .select(col(s"after.$groupKey").as(groupKey)))
      .distinct()

  /** Incremental maintenance for NON-distributive aggregates (MIN,
    * MAX, exact distinct…): a delta can't be subtracted from a max, so
    * instead of merging deltas this re-aggregates ONLY the groups the
    * change set touches and patches them into the snapshot — untouched
    * groups (the overwhelming majority under an incremental load) are
    * carried over without reading their base rows.
    *
    * `aggFn` recomputes the snapshot's schema for a subset of base
    * rows (same groupBy the snapshot was built with). Groups that
    * emptied out simply produce no recomputed row and their snapshot
    * row is dropped by the anti-join, matching a full recompute.
    *
    * Shape at scale: the touched-key set is delta-sized; it broadcasts
    * into a semi-join PROBE on the base scan (with the base bucketed
    * on a key functionally determining `groupKey`, partition pruning
    * applies too), so the re-aggregation reads base rows but shuffles
    * only the touched groups' rows. All joins are null-safe — a
    * null-keyed group refreshes like any other.
    */
  def refreshGroups(
      snapshot: DataFrame,
      base: DataFrame,
      changes: DataFrame,
      groupKey: String)(aggFn: DataFrame => DataFrame): DataFrame = {
    val touched = touchedGroups(changes, groupKey)
    val keep = snapshot.join(broadcast(touched),
      snapshot(groupKey) <=> touched(groupKey), "left_anti")
    val recomputed = aggFn(base.join(broadcast(touched),
      base(groupKey) <=> touched(groupKey), "left_semi"))
    keep.unionByName(recomputed)
  }
}
