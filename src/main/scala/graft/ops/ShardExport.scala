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
    * checksum `sum((pos mod M)·(id mod M) mod M) mod M`, M = 1e9+7,
    * that pins the exact within-shard ORDER (count/bytes alone would
    * accept a mis-sorted shard). One window pass + one hash aggregate,
    * both partitioned by shard — a single shuffle at scale.
    *
    * Every summand is reduced mod M BEFORE aggregation, so the long
    * accumulator holds < n·M per shard — overflow-safe to ~9 billion
    * documents per shard, far past the point where an export would
    * raise `numShards` instead.
    */
  def manifest(assigned: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val M = lit(1000000007L)
    val w = Window.partitionBy(col("shard")).orderBy(col("ord"), col(idCol))
    assigned
      .withColumn("__pos", row_number().over(w).cast("long"))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(bytesCol)).as("total_bytes"),
        min(col("ord")).as("min_ord"),
        max(col("ord")).as("max_ord"),
        (sum(pmod(pmod(col("__pos"), M) * pmod(col(idCol).cast("long"), M), M)) %
          M).as("perm_check"))
  }

  /** Write the assigned frame as one directory per shard
    * (`shard=K/`), rows sorted by the shuffle order within each
    * shard's files. `repartitionByRange` over the dense 0..K-1 shard
    * domain places ~one shard per task (range boundaries fall between
    * distinct values — unlike hash repartition, which collides ~37% of
    * shard values into shared tasks and leaves others empty), so a
    * lost task re-writes one shard's files, and all K tasks carry
    * work.
    *
    * The within-partition sort leads with the partition column: the
    * dynamic-partition writer requires rows clustered by partition
    * keys and inserts its OWN (ord-destroying) sort if the incoming
    * order doesn't already satisfy that — leading with `shard` makes
    * our order satisfy it, so the (shard, ord) sort survives to the
    * files.
    */
  def write(assigned: DataFrame, numShards: Int, outDir: String): Unit =
    assigned
      .repartitionByRange(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("ord"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)

  /** The salt prefixes [[assign]] hashes under — shared with the
    * oracle-side SQL mirror (queries.OracleSql) so both engines derive
    * identical placement from one definition.
    */
  def shardSalt(seed: Long): String = s"s$seed:"
  def ordSalt(seed: Long): String = s"o$seed:"

  /** Vnode hash for consistent-ring placement: hex60 of
    * "r<seed>:<shard>:<vnode>" — shared by [[ringRebalancePlan]] and
    * the oracle so both engines build the identical ring.
    */
  def vnodeHash(seed: Long, shard: Int, vnode: Int): Long =
    graft.functions.Kernels.hex60String(vnodeKey(seed, shard, vnode))
  def vnodeKey(seed: Long, shard: Int, vnode: Int): String =
    s"r$seed:$shard:$vnode"

  /** Consistent-hash RING rebalance plan (Karger et al. STOC'97
    * consistent hashing with virtual nodes; public technique): place
    * every id on two rings — `fromShards` and `toShards`, each shard
    * owning `vnodesPerShard` ring positions — and report the
    * (from_shard, to_shard, n_ids) transition matrix. The diagonal is
    * the point of the ring: unlike `hash mod N` (which moves ~1−1/N of
    * ALL ids on any resize), a ring resize moves only the arc the new
    * vnodes claim — this plan prices a shard-count change BEFORE the
    * export re-runs.
    *
    * Placement is map-side against the two LITERAL sorted vnode
    * tables (≤ shards·vnodes longs — plan constants, nothing is
    * stored, broadcast, or shuffled): an id at hash x belongs to the
    * first vnode clockwise from x (the smallest vnode hash ≥ x,
    * wrapping to the ring's minimum). The only exchange is the final
    * |from|×|to|-bounded count aggregation.
    */
  def ringRebalancePlan(df: DataFrame, idCol: String,
      fromShards: Int, toShards: Int, vnodesPerShard: Int = 3,
      seed: Long = 7L): DataFrame = {
    require(fromShards > 0 && toShards > 0 && vnodesPerShard > 0,
      s"bad ring sizes: $fromShards -> $toShards x $vnodesPerShard")
    def assignExpr(shards: Int): org.apache.spark.sql.Column = {
      val ring = (0 until shards).flatMap { sh =>
        (0 until vnodesPerShard).map(v => (vnodeHash(seed, sh, v), sh.toLong))
      }.sortBy(_._1)
      val hs = ring.map(_._1).mkString("array(", "L, ", "L)")
      val ss = ring.map(_._2).mkString("array(", "L, ", "L)")
      // index of the first vnode hash >= x = #hashes < x (sorted ring);
      // past the end wraps to index 1
      expr(s"""element_at($ss,
        CAST(CASE WHEN size(filter($hs, h -> h < __x)) = ${ring.size}
          THEN 1 ELSE size(filter($hs, h -> h < __x)) + 1 END AS INT))""")
    }
    df.select(TextKernels.hex60(col(idCol).cast("string")).as("__x"))
      .select(assignExpr(fromShards).as("from_shard"),
        assignExpr(toShards).as("to_shard"))
      .groupBy(col("from_shard"), col("to_shard"))
      .agg(count(lit(1)).as("n_ids"))
  }

  /** Concat-and-chunk sequence-packing audit: lay every document's
    * tokens end-to-end in ascending `idCol` order and cut the line
    * into fixed `chunkTokens`-long training sequences (the GPT-style
    * pack — no padding between documents, a document may straddle a
    * cut). Returns one row per chunk:
    * (chunk, n_docs overlapping it, n_starting in it, starts_mid_doc
    * 0/1 — whether its first token continues a straddling document,
    * n_tokens filled — `chunkTokens` everywhere but the final chunk).
    * The trainer reads this before committing a context length: the
    * straddle rate IS the fraction of attention windows that open
    * mid-document.
    *
    * Shape at scale: the global token offset is [[Sweep.runningSum]]'s
    * distributed two-phase prefix sum (never a one-partition sort);
    * each document then fans out map-side to only the chunks it
    * overlaps (⌈len/chunkTokens⌉ + 1 rows — bounded by the document's
    * own length), and the one shuffle is the per-chunk aggregation on
    * the dense chunk id. Token counts are whitespace-token integers,
    * so every engine derives identical cuts.
    *
    * `idCol` must be UNIQUE and cast losslessly to long (it is the
    * position on the line — duplicate ids would collapse into one
    * combined document, see [[Sweep.runningSum]]).
    *
    * The source scans exactly once: the (id, token-count) projection
    * is [[graft.util.Pin.cut]] before [[Sweep.runningSum]], so the
    * bounds min/max action and the prefix-sum plan both read the
    * pinned two-long frame instead of re-executing the text scan.
    */
  def packChunks(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Long = 1024L): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive: $chunkTokens")
    // pin the two-long counts frame: runningSum's bounds action and
    // the prefix-sum plan otherwise each re-execute the text scan
    val counts = graft.util.Pin.cut(df
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("t"),
        size(TextKernels.tokens(col(textCol))).cast("long").as("ntok")))
    val run = Sweep.runningSum(counts, "t", "ntok")
    run
      .withColumn("start", col("running") - col("d"))
      .withColumn("c0", expr(s"start DIV ${chunkTokens}L"))
      .withColumn("c1", expr(s"(running - 1) DIV ${chunkTokens}L"))
      .select(col("start"), col("running"), col("c0"),
        explode(expr("sequence(c0, c1)")).as("chunk"))
      .groupBy(col("chunk"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("chunk") === col("c0"), 1L).otherwise(0L))
          .as("n_starting"),
        max(when(col("chunk") > col("c0"), 1L).otherwise(0L))
          .as("starts_mid_doc"),
        sum(least(col("running"), (col("chunk") + 1) * chunkTokens) -
          greatest(col("start"), col("chunk") * chunkTokens))
          .as("n_tokens"))
  }
}
