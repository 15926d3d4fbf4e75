package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators: two-phase salted aggregation and an
  * as-of join built from window functions.
  *
  * Salting (SURVEY §2.4 / the 100 TB brief): a hot group key sends
  * all its rows to one reducer. Phase 1 aggregates on
  * (key, salt = pmod(hash(whole row), S)) — S-way fan-out of every hot
  * key — phase 2 merges the S partials per key. Correct for any
  * decomposable aggregate; results are identical to the unsalted
  * groupBy (the oracle IS the plain GROUP BY).
  */
object Skew {

  /** Salted sum+count per key. `salt` = fan-out per key (set ≈ the
    * cluster's reducer count over the hot key's row share).
    */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: Column,
      salt: Int = 16): DataFrame = {
    val keys = keyCols.map(col)
    val partial = df
      .withColumn("__salt", pmod(hash(df.columns.map(col): _*), lit(salt)))
      .groupBy((keys :+ col("__salt")): _*)
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
    partial.groupBy(keys: _*)
      .agg(sum(col("__psum")).as("sum_value"), sum(col("__pcnt")).as("n_rows"))
  }

  /** Salted (replicated) equi-join for a skewed key: each fact row
    * gets a deterministic salt, the dimension side is replicated once
    * per salt value, and the join runs on (key, salt) — a hot key's
    * rows spread over `salt` reducers instead of one. Results are
    * identical to the plain join (the oracle IS the plain join).
    *
    * Use when AQE's skew-split cannot help: skew inside an aggregation
    * feeding the join, or a key so hot one split still exceeds memory.
    * Cost: `salt`× replication of the right side — keep the right side
    * the small one. The salt is `pmod(hash(all left columns), salt)`,
    * not rand(): deterministic across retries and partitionings (a
    * failed task re-derives the same salt, so no duplicate/lost rows
    * under speculative execution).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, salt: Int = 16): DataFrame = {
    val l = left.withColumn("__salt", pmod(hash(left.columns.map(col): _*), lit(salt)))
    val r = right.withColumn("__salt", explode(array((0 until salt).map(lit): _*)))
    l.join(r, l("__salt") === r("__salt") && col(leftKey) === col(rightKey))
      .drop("__salt")
  }

  /** HYBRID hot/cold equi-join — differential skew handling, the
    * upgrade over [[saltedJoin]]'s uniform salting (which taxes every
    * cold key with a `salt`× right-side replication to fix a handful
    * of hot ones): split the left side by measured key frequency and
    * give each population the join it wants.
    *
    *  - Keys with ≥ `hotThreshold` left rows join against the right
    *    rows for THOSE keys as a broadcast — no hot key ever crosses a
    *    shuffle, so no reducer receives a hot key's row mass.
    *  - Everything else takes the ordinary shuffled equi-join, paying
    *    zero replication.
    *
    * Both small sides are bounded by construction: at most
    * `|left| / hotThreshold` distinct hot keys exist, and the
    * broadcast right slice carries only those keys' right rows (size
    * it with q93's estimator when the right side is not dimension-
    * shaped). The frequency count itself pre-reduces map-side — the
    * q95 hot-key-report shape — and AQE handles residual skew among
    * cold keys.
    *
    * Inner-join semantics; the result set is identical to the plain
    * join (the oracle IS the plain join), rows merely route
    * differently.
    */
  def hybridJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, hotThreshold: Long): DataFrame = {
    require(hotThreshold >= 1, s"need positive hotThreshold: $hotThreshold")
    val hot = left.groupBy(col(leftKey)).agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= hotThreshold)
      .select(col(leftKey).as("__hk"))
    val cold = left.join(broadcast(hot), col(leftKey) === col("__hk"), "left_anti")
      .join(right, col(leftKey) === col(rightKey))
    val rightHot = right.join(broadcast(hot), col(rightKey) === col("__hk"), "left_semi")
    val hotJoined = left.join(broadcast(hot), col(leftKey) === col("__hk"), "left_semi")
      .join(broadcast(rightHot), col(leftKey) === col(rightKey))
    cold.unionByName(hotJoined)
  }

  /** As-of join: for each left row, the single latest right row with
    * `rightTs <= leftTs` on the same key (NULLs when none) — the
    * time-series enrich Spark has no built-in for (SURVEY §2.3 note).
    *
    * Shape: union both sides tagged, ONE window pass per key ordered
    * by (ts, side) with `last(ignoreNulls)` carrying the right-side
    * row forward AS ONE STRUCT — carrying each value column
    * independently would stitch fields from different right rows
    * whenever the latest row holds a NULL in one column — then keep
    * left rows. One shuffle on the key — no range self-join, no
    * per-row subquery; skewed keys fall to AQE like any single-key
    * window.
    *
    * Right side must be unique per (key, ts) — pre-dedupe it
    * (`dropDuplicates`/keep-latest) or ties make the carried row
    * ambiguous.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
      leftTs: String, rightTs: String, rightVals: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val l = left.withColumn("__side", lit(1))
      .withColumn("__k", col(leftKey)).withColumn("__ts", col(leftTs))
    val r = right.select(
      Seq(col(rightKey).as("__k"), col(rightTs).as("__ts"), lit(0).as("__side"),
        struct(rightVals.map(col): _*).as("__rvals")): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows (side 0) sort before left rows at equal ts, so an
    // exactly-at-ts right row IS visible to the left row. The struct
    // is non-null for EVERY right row (even all-null fields), so
    // ignoreNulls skips left probe rows only, never a matching row.
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__asof",
      last(col("__rvals"), ignoreNulls = true).over(w))
    rightVals.foldLeft(carried) { (d, c) =>
        d.withColumn(s"asof_$c", col("__asof").getField(c))
      }
      .filter(col("__side") === 1)
      .drop("__side", "__k", "__ts", "__rvals", "__asof")
  }

  /** Salting PLAN — the pre-flight artifact behind [[saltedJoin]]'s
    * constant factor and the q95 hot-key report: given a target row
    * count per (key, salt) task, emit each key's measured count and
    * the salt fan-out `⌈n / targetRows⌉` it needs so no single task
    * exceeds the target. Feeding the plan back into a salted
    * join/aggregate replaces a guessed global salt constant with
    * per-key factors: cold keys keep salt 1 (zero replication cost),
    * hot keys get exactly the parallelism their volume demands.
    *
    * One aggregation over the keys (pre-reduced map-side) — the plan
    * costs one pass over key counts, always cheaper than the skewed
    * shuffle it sizes. Output: (keyCols*, n, salt), keys with
    * salt > 1 first-class; include_all keeps the cold keys too (for
    * joining the plan back onto the data).
    */
  def saltPlan(df: DataFrame, keyCols: Seq[String], targetRows: Long,
      includeAll: Boolean = true): DataFrame = {
    require(targetRows >= 1, s"need targetRows >= 1: $targetRows")
    val plan = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("salt", expr(s"(n + ${targetRows - 1}) div $targetRows"))
    if (includeAll) plan else plan.filter(col("salt") > 1)
  }
}
