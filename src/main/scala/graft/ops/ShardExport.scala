package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextKernels

/** Deterministic corpus shuffle + shard export — the last step of a
  * training-data pipeline: place every document into one of K shards
  * by a seeded hash, give it a seeded pseudo-random position WITHIN
  * its shard, and emit a per-shard manifest a trainer (or a re-run)
  * can verify against.
  *
  * Everything is a pure function of (id, seed): re-running the export
  * on the same corpus reproduces byte-identical shard contents and
  * order — no `rand()`, no partition-index dependence, no reliance on
  * input file order. That is what makes a 100 TB export restartable
  * per-shard: a failed shard rewrites alone, and writes land sorted by
  * a hash, so shard files are also statistically shuffled (no
  * source/time clustering inside a shard — the property SGD sampling
  * wants).
  */
object ShardExport {

  /** Hash-derived (shard, ord) assignment. `shard` spreads documents
    * uniformly over `numShards`; `ord` is an independent 60-bit hash
    * (different salt) giving the within-shard shuffle order. Both are
    * portable hex60 hashes (md5-based), so any engine — and the DuckDB
    * oracle — derives identical placement.
    */
  def assign(df: DataFrame, idCol: String, numShards: Int, seed: Long): DataFrame = {
    require(numShards > 0, s"numShards must be positive: $numShards")
    val id = col(idCol).cast("string")
    df.withColumn("shard",
        pmod(TextKernels.hex60(concat(lit(s"s$seed:"), id)), lit(numShards.toLong)))
      .withColumn("ord", TextKernels.hex60(concat(lit(s"o$seed:"), id)))
  }

  /** Per-shard manifest over an [[assign]]ed frame: document count,
    * total payload bytes, the ord-hash range, and a permutation
    * checksum `sum(position_in_shard * (id mod 1000003)) mod (1e9+7)`
    * that pins the exact within-shard ORDER (count/bytes alone would
    * accept a mis-sorted shard). One window pass + one hash aggregate,
    * both partitioned by shard — a single shuffle at scale, and the
    * checksum accumulates in a long (positions × 1e6-bounded terms stay
    * far under 2^63 for any realistic shard).
    */
  def manifest(assigned: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("ord"), col(idCol))
    assigned
      .withColumn("__pos", row_number().over(w).cast("long"))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(bytesCol)).as("total_bytes"),
        min(col("ord")).as("min_ord"),
        max(col("ord")).as("max_ord"),
        (sum(col("__pos") * pmod(col(idCol).cast("long"), lit(1000003L))) %
          lit(1000000007L)).as("perm_check"))
  }

  /** Write the assigned frame as one directory per shard
    * (`shard=K/`), rows sorted by the shuffle order within each
    * shard's files. `repartition(numShards, shard)` puts each shard in
    * exactly one task so `sortWithinPartitions` is a total order per
    * shard; at cluster scale that is also the unit of retry — a lost
    * task rewrites one shard, nothing else.
    *
    * The sort leads with the partition column: the dynamic-partition
    * writer requires rows clustered by partition keys and inserts its
    * OWN (ord-destroying) sort if the incoming order doesn't already
    * satisfy that — leading with `shard` makes our order satisfy it,
    * so the (shard, ord) sort survives to the files.
    */
  def write(assigned: DataFrame, numShards: Int, outDir: String): Unit =
    assigned
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("ord"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)

  /** DuckDB fragment mirroring [[assign]]'s shard/ord for the oracle
    * side (kept here so query packs don't restate the salt scheme).
    */
  def shardSql(idExpr: String, numShards: Int, seed: Long): String =
    s"(${graft.queries.OracleSql.hex60(s"'s$seed:' || $idExpr")}) % $numShards"
  def ordSql(idExpr: String, seed: Long): String =
    graft.queries.OracleSql.hex60(s"'o$seed:' || $idExpr")
}
