package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Entity-resolution pair scoring: blocked candidate generation +
  * rarity-weighted field agreement (the Fellegi–Sunter intuition —
  * agreement on a RARE value is strong evidence, agreement on a common
  * value is weak — with frequency-derived weights, as in
  * Winkler/Newcombe value-specific weighting; public methods).
  *
  * Weights are the integer quantization `⌊2²⁰ · N / freq(v)⌋` (the
  * inverse match probability, scaled), so scores are exact integer
  * sums — order-independent, engine-portable, no `log` anywhere. A
  * field's weight is a function of ITS value: two records agreeing on
  * a one-off value score ~2²⁰·N/1, agreeing on the modal value scores
  * near 2²⁰.
  *
  * Scale shape: candidates come from equality blocking (one bounded
  * shuffle on the block key; CappedCollect caps degenerate blocks —
  * never all-pairs); per-field frequency tables are value-DOMAIN sized
  * aggregations joined row-side BEFORE pairing, so each row carries
  * its precomputed weight vector and the pair join needs no further
  * frequency lookups — two hash joins of the candidate set against the
  * weighted rows, both AQE-broadcastable when candidates are few.
  */
object RecordLinkage {

  /** Score all within-block record pairs.
    *
    * Output: (id_a, id_b, n_agree, score) for pairs with
    * score ≥ minScore, id_a < id_b; `score` sums the agreeing fields'
    * rarity weights, null field values never agree.
    */
  def scorePairs(df: DataFrame, idCol: String, blockCol: String,
      fieldCols: Seq[String], minScore: Long = 1,
      maxBlock: Int = 10000, cacheKey: Option[String] = None): DataFrame = {
    require(fieldCols.nonEmpty, "need at least one scoring field")
    val rows = df.select(
      (Seq(col(idCol).cast("long").as("__id"), col(blockCol).as("__blk")) ++
        fieldCols.map(f => col(f).cast("string").as(f))): _*)
    val tot = rows.agg(count(lit(1)).as("__N"))
    // DEAD END, analyzed (r18): melting the per-field frequency legs
    // into one exploded (field, value) pass does NOT reduce bytes —
    // under columnar pruning each per-field freq scan reads ONLY its
    // field's column, so k pruned scans and one all-field scan read
    // the same column bytes, while the melt adds a ×k explode and its
    // (field, value) exchange carries the same domain-sized partial
    // counts the k per-field exchanges carry. Worse, the per-field
    // consumers filter the melted aggregate on its grouping column,
    // which Catalyst pushes BELOW the aggregate, specializing each
    // branch's subtree and defeating exchange reuse (the q220/q144
    // pruning lesson) — forcing a pin whose only job is to undo the
    // melt. What the melt would save is (k−1) scan-job overheads, sub-
    // second at any scale that matters. Keep the per-field pruned
    // scans.
    // row-side weight vector: each field value joins its frequency once
    val weighted = fieldCols.foldLeft(rows.crossJoin(broadcast(tot))) {
      (acc, f) =>
        val freq = rows.filter(col(f).isNotNull)
          .groupBy(col(f)).agg(count(lit(1)).as(s"__c_$f"))
        acc.join(freq, Seq(f), "left")
          .withColumn(s"__w_$f",
            expr(s"(1048576 * __N) div `__c_$f`")) // null value -> null weight
    }
    // pinned: the weighted row table has THREE consumers (the block
    // pair generator and both verification sides), and the a/b sides
    // alias their columns, so exchange reuse cannot dedupe them — the
    // unpinned shape re-ran the scan + totals + per-field frequency
    // joins once per consumer (7 source scans in the static plan).
    // The pin is a slim (id, block, value, weight)-per-field frame —
    // one narrow row per record, spill-safe storage. With `cacheKey`
    // the pin routes through SessionCache (build-once per session,
    // releasable), closing the per-invocation hazard of a bare
    // eager cut: a construction-time job per call and, in
    // reliable-checkpoint mode, one un-retired checkpoint copy per
    // call for the app lifetime. Callers whose `df` is a pure
    // function of the key should pass one; keyless callers keep the
    // direct cut and own its lifecycle.
    val sidesRaw = weighted.select(
      (Seq(col("__id"), col("__blk")) ++
        fieldCols.flatMap(f => Seq(col(f), col(s"__w_$f")))): _*)
    val sides = cacheKey match {
      case Some(key) if graft.util.SessionCache.enabled(df.sparkSession) =>
        graft.util.SessionCache.cached(df.sparkSession,
          s"rl-weighted:$key:$idCol:$blockCol:${fieldCols.mkString(",")}")(
          graft.util.Pin.cut(sidesRaw))
      case _ => graft.util.Pin.cut(sidesRaw)
    }
    val pairs = sides
      .filter(col("__blk").isNotNull)
      .groupBy(col("__blk"))
      .agg(graft.functions.CappedCollect.cappedLongList(col("__id"), maxBlock).as("cl"))
      .filter(col("cl.n").between(2, maxBlock))
      .select(explode(graft.functions.Kernels.sortedPairsOf(col("cl.ids"))).as("p"))
      .select(col("p.a").as("id_a"), col("p.b").as("id_b"))
    def side(suffix: String) = sides.select(
      (Seq(col("__id").as(s"id_$suffix")) ++
        fieldCols.flatMap(f =>
          Seq(col(f).as(s"${f}_$suffix"), col(s"__w_$f").as(s"__w_${f}_$suffix")))): _*)
    val agree = fieldCols.map(f =>
      when(col(s"${f}_a").isNotNull && col(s"${f}_a") === col(s"${f}_b"),
        col(s"__w_${f}_a")).otherwise(lit(0L)))
    // the pair set is NEVER safely broadcastable: it explodes out of
    // one row per block, so the static size estimate (a handful of
    // rows) undersells the true cardinality by the square of the
    // block size — at 30x corpus the planner happily "broadcast" 2.8
    // GiB of pairs before these hints pinned both joins to sort-merge
    // (the shuffle lands on the join key SMJ needs anyway; spill-safe
    // at any block size). Measured floor (r17, 30x corpus, 6.0 M
    // pairs, rows bit-identical at every point): 16 GiB heap 735 s,
    // 10 GiB 779 s, 6 GiB ~21 min — the stage degrades to spill, it
    // does not die; a no-output abort on a shared box is OS-level
    // memory contention (co-resident oracle/suite processes), not a
    // plan hazard.
    pairs.hint("merge")
      .join(side("a"), Seq("id_a"))
      .hint("merge")
      .join(side("b"), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        agree.map(w => when(w > 0, 1L).otherwise(0L)).reduce(_ + _).as("n_agree"),
        agree.reduce(_ + _).as("score"))
      .filter(col("score") >= minScore)
  }
}
