package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.ParquetTable
import graft.types.{GraftType, SchemaLattice}

/** Composite table operators (SURVEY.md §2.9) over [[ParquetTable]].
  * Each mirrors an observable reference behavior, re-expressed as
  * declarative DataFrame transforms so Catalyst plans them.
  */
object TableOps {

  /** A3 `getMax(table, col)` (`mysql.js:193-216`): the incremental
    * watermark. Driver-side scalar by design — the one sanctioned
    * `collect`. Returns None on missing table or all-null column
    * (reference returns null).
    */
  def getMax(t: ParquetTable, column: String): Option[Any] = {
    if (!t.exists) return None
    val row = t.read.agg(max(col(column))).head()
    if (row.isNullAt(0)) None else Some(row.get(0))
  }

  /** O1/S9 `insertData` with merge-on-duplicates (`mysql.js:258-393`):
    * auto-create if missing, schema-reconcile (add + widen), then
    * upsert keyed on `key`. The reference's byte-budget batching
    * dissolves into Spark partitioning.
    *
    * On a bucketed [[ParquetTable]], a schema-preserving merge batch
    * takes the partition-scoped path: read ONLY the buckets the batch
    * touches, upsert, rewrite ONLY those buckets (dynamic partition
    * overwrite). A 1 GB batch over a 100 TB table then rewrites
    * ~batch-coverage of the table instead of all of it. Batches that
    * evolve the schema (new/widened columns) fall back to the full
    * rewrite — evolution must reach every partition.
    */
  def insertData(t: ParquetTable, data: DataFrame, key: String = "id",
      mergeOnDuplicates: Boolean = true, orderBy: Seq[String] = Nil): Unit = {
    if (!t.exists) {
      // first batch obeys the same keep-latest rule as every merge —
      // dropDuplicates alone would let a stale row win the initial
      // load and poison all subsequent upserts
      t.overwrite(
        if (mergeOnDuplicates) Upsert.dedupPerKey(data, Seq(key), orderBy)
        else data,
        distKey = Some(key))
      return
    }
    // partition-scoped only when the merge key IS the bucket key —
    // otherwise a key collision could live in an unread bucket.
    val schemaStable = t.isBucketed && key == t.bucketKey &&
      SchemaLattice.reconcile(t.read.schema, data.schema).isNoop
    if (schemaStable && mergeOnDuplicates) {
      // Hash at the TABLE's key type: a batch whose key arrived
      // narrower (int where the table holds long) reconciles as a
      // no-op, but Murmur3 hashes int and long inputs differently —
      // bucket ids computed from the batch-typed key would read (and
      // dynamic-overwrite!) the wrong bucket directories.
      val dataKeyed = data.withColumn(key,
        col(key).cast(t.read.schema(key).dataType))
      // affected-bucket ids: bounded by the bucket count, so this
      // collect is a small driver-side scalar like getMax.
      val affected = dataKeyed.select(t.bucketExpr.as("b")).distinct()
        .collect().map(_.getInt(0)).toSeq
      val destAffected = t.readBuckets(affected)
      val srcReconciled = reconcileTo(dataKeyed, destAffected.schema)
      t.overwriteBuckets(Upsert(destAffected, srcReconciled, Seq(key), orderBy))
      return
    }
    val dest = t.read
    val destReconciled = reconcileTo(dest, data.schema)
    val srcReconciled = reconcileTo(data, destReconciled.schema)
    val merged =
      if (mergeOnDuplicates) Upsert(destReconciled, srcReconciled, Seq(key), orderBy)
      else destReconciled.unionByName(srcReconciled, allowMissingColumns = true)
    t.overwrite(merged, distKey = Some(key))
  }

  /** O2 `mergeTables` (`mysql.js:547-599`): fullMerge (dest missing →
    * copy) vs incremental (schema-evolve + upsert).
    */
  def mergeTables(source: ParquetTable, dest: ParquetTable, key: String = "id",
      fullMerge: Boolean = false, orderBy: Seq[String] = Nil): Unit = {
    val src = source.read
    if (fullMerge || !dest.exists) dest.overwrite(src, distKey = Some(key))
    else insertData(dest, src, key, mergeOnDuplicates = true, orderBy)
  }

  /** O3 incremental extract (`books/etl/chapters/extract+load/
    * extract.js:14-39`): dest watermark → `>=` filtered source scan
    * (overlap re-reads the boundary row; idempotent because the upsert
    * dedups on key) → upsert. The filter reaches the source scan as a
    * pushed predicate.
    */
  def incrementalExtract(sourceDf: DataFrame, dest: ParquetTable,
      tsCol: String, key: String = "id"): Long = getMax(dest, tsCol) match {
    case Some(wm) =>
      // incremental batch, bounded by the watermark: materialize it
      // ONCE (executor-local) and feed both the merge and the
      // reported count — re-running the filtered scan would double
      // the extract's I/O and could disagree with what was loaded
      // if the source mutates between passes
      val batch = sourceDf.filter(col(tsCol) >= lit(wm)).localCheckpoint(true)
      insertData(dest, batch, key, mergeOnDuplicates = true, orderBy = Seq(tsCol))
      batch.count()
    case None =>
      // FIRST load = the whole source: pinning that in executor
      // storage is exactly the unbounded-materialization this library
      // bans, so stream the scan into the write and pay one extra
      // scan for the count (one-time; the dest was empty, so the
      // count still describes the loaded set)
      insertData(dest, sourceDf, key, mergeOnDuplicates = true, orderBy = Seq(tsCol))
      sourceDf.count()
  }

  /** O4 `copyTableSchema` / CREATE TABLE LIKE (`mysql.js:601-605`). */
  def schemaClone(spark: SparkSession, source: ParquetTable, dest: ParquetTable): Unit = {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], source.read.schema)
    dest.overwrite(empty)
  }

  /** O5 `addColumn` (`mysql.js:471-530`): type inferred from provided
    * sample values via the lattice; existing rows get NULL.
    */
  def addColumn(t: ParquetTable, name: String, sampleValues: Seq[Any]): Unit = {
    val gt = sampleValues.foldLeft(GraftType.Unknown: GraftType)(
      (acc, v) => GraftType.widen(acc, GraftType.infer(v)))
    t.overwrite(t.read.withColumn(name, lit(null).cast(gt.toSpark)))
  }

  /** O5 `alterColumn` (`mysql.js:532-545`): the reference's
    * add-tmp/copy/drop/rename dance collapses to a cast-and-rewrite.
    */
  def alterColumn(t: ParquetTable, name: String, to: DataType): Unit =
    t.overwrite(t.read.withColumn(name, col(name).cast(to)))

  /** Align `df` to cover `target`'s columns: add missing as typed
    * NULLs, widen clashing types via the lattice (reference
    * auto-add-column + widening, `mysql.js:299-358`).
    */
  def reconcileTo(df: DataFrame, target: StructType): DataFrame = {
    val r = SchemaLattice.reconcile(df.schema, target)
    val widened = r.widens.foldLeft(df) { case (d, (c, dt)) =>
      d.withColumn(c, col(c).cast(dt))
    }
    r.adds.foldLeft(widened)((d, f) =>
      d.withColumn(f.name, lit(null).cast(f.dataType)))
  }

  /** Snapshot diff — the incremental-load ACCEPTANCE audit: classify
    * every key of two table versions as `added` / `removed` /
    * `changed` / `unchanged` by comparing an md5 digest of the
    * `compareCols` tuple. One full-outer equi-join on the key columns;
    * digests are computed map-side over a LENGTH-PREFIXED encoding —
    * each value contributes `length:value` and NULL contributes the
    * bare token `n` (no digit prefix, so it cannot collide with any
    * real value) — which makes the concatenation injective for
    * arbitrary strings: no separator character a value could contain
    * ever delimits, so ("a\u0001b", "c") and ("a", "b\u0001c") hash
    * differently and a literal NUL string is distinct from NULL.
    *
    * `compareCols` should be integers/strings/dates for cross-engine
    * digests — float columns stringify differently per engine (the
    * check.py float rule); quantize them first.
    *
    * PRECONDITION: `keyCols` must uniquely identify rows on EACH side
    * (the reference's keyed-diff convention — merges key on a unique
    * id, mysql.js:369-377). Duplicate keys fan out in the full-outer
    * join and emit multiple, possibly contradictory, status rows per
    * key, so the groupBy(status) audit stops summing to the table
    * sizes. Dedup first ([[graft.ops.Upsert.dedupPerKey]]) if the
    * snapshots may carry duplicates.
    *
    * Output: keyCols*, status — feed a groupBy(status).count for the
    * one-line audit, or anti-filter `unchanged` for the change feed.
    */
  def snapshotDiff(before: DataFrame, after: DataFrame,
      keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(compareCols.nonEmpty, "need at least one compare column")
    def enc(c: String): Column = {
      val s = col(c).cast("string")
      when(s.isNull, lit("n"))
        .otherwise(concat(length(s).cast("string"), lit(":"), s))
    }
    def digest(side: DataFrame, h: String): DataFrame = side.select(
      keyCols.map(col) :+
        md5(concat(compareCols.map(enc): _*)).as(h): _*)
    digest(before, "__hb")
      .join(digest(after, "__ha"), keyCols, "full_outer")
      .select(keyCols.map(col) :+
        when(col("__hb").isNull, "added")
          .when(col("__ha").isNull, "removed")
          .when(col("__ha") === col("__hb"), "unchanged")
          .otherwise("changed").as("status"): _*)
  }
}
