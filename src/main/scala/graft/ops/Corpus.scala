package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Whole-corpus composition audits that need a deterministic
  * document ORDER — growth curves and their kin. The order is always
  * `idCol` ascending, and the global rank comes from the distributed
  * two-phase prefix sum ([[Sweep.runningSum]]) — never a
  * single-partition `row_number() OVER (ORDER BY ...)`.
  */
object Corpus {

  /** Vocabulary GROWTH CURVE (the Heaps'-law audit): how many distinct
    * token types the corpus has accumulated after its first
    * `ceil(k·N/checkpoints)` documents in `idCol` order, for
    * k = 1..checkpoints. Sublinear growth is the healthy shape; a
    * late-checkpoint jump means a tail source injects novel vocabulary
    * (encoding junk, another language) and deserves a look.
    *
    * Shape: doc ranks via the distributed prefix sum (doc-count rows),
    * one doc-keyed join to attach ranks BEFORE the token explode, one
    * shuffle on token for the first-appearance min, then a
    * ×checkpoints literal fan-out of the distinct-type rows (already
    * reduced, ≪ corpus). The only driver materialization is the
    * doc-count scalar — the sanctioned watermark class.
    *
    * Output: (checkpoint, n_docs, vocab) — all longs, exact counts.
    */
  def vocabGrowth(df: DataFrame, idCol: String, textCol: String,
      checkpoints: Int = 10): DataFrame = {
    require(checkpoints >= 1, s"need positive checkpoints: $checkpoints")
    val ranks = Sweep.runningSum(
      df.select(col(idCol).cast("long").as("t"), lit(1L).as("one")),
      "t", "one")
      .select(col("t"), col("running").as("rk"))
    val n = df.count()
    val firstRank = df
      .select(col(idCol).cast("long").as("t"), col(textCol).as("text"))
      .join(ranks, Seq("t"))
      .select(col("rk"), explode(graft.functions.TextKernels.tokens(col("text"))).as("tok"))
      .groupBy(col("tok"))
      .agg(min(col("rk")).as("rt"))
    val cps = array((1 to checkpoints).map { k =>
      struct(lit(k.toLong).as("checkpoint"),
        lit((k * n + checkpoints - 1) / checkpoints).as("n_docs"))
    }: _*)
    firstRank
      .select(col("rt"), explode(cps).as("cp"))
      .filter(col("rt") <= col("cp.n_docs"))
      .groupBy(col("cp.checkpoint").as("checkpoint"), col("cp.n_docs").as("n_docs"))
      .agg(count(lit(1)).as("vocab"))
  }
}
