package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Length-bucketed batching diagnostics: sequence batches pad
  * every example to its bucket's boundary, so the boundary set decides
  * how much of every training step is wasted compute. This measures
  * that waste EXACTLY for a candidate boundary set — the report an
  * engineer reads before picking bucket edges (or deciding to pack
  * instead, q78's `packIntoChunks`).
  *
  * Shape at scale: bucket assignment is a map-side CASE over literal
  * boundaries; the report is one hash aggregation keyed on the bucket
  * — partial map-side, |buckets| output rows. All counts are longs;
  * the waste fraction divides two exactly-agreed integers once.
  */
object Batching {

  /** Per-bucket padding report for boundary set `bounds` (ascending).
    * A row with `n` tokens lands in the smallest boundary ≥ n;
    * longer-than-max rows TRUNCATE to the last boundary (the training
    * convention) and pad nothing. Empty (0-token) rows still occupy a
    * slot in the first bucket — padding fully.
    *
    * Output: (bucket, n_rows, real_tokens, padded_tokens, pad_waste_q)
    * — bucket is the boundary, padded = n_rows·boundary,
    * real = Σ min(n, boundary), pad_waste_q = ⌊2²⁰·(padded−real)/padded⌋.
    */
  def paddingReport(df: DataFrame, nTokensCol: String,
      bounds: Seq[Int]): DataFrame = {
    require(bounds.nonEmpty && bounds == bounds.sorted && bounds.head > 0,
      s"need ascending positive boundaries: $bounds")
    require(bounds.distinct == bounds, s"duplicate boundary: $bounds")
    val n = col(nTokensCol).cast("long")
    val bucket = bounds.init.foldRight(lit(bounds.last.toLong)) {
      case (b, acc) => when(n <= b, lit(b.toLong)).otherwise(acc)
    }
    df.filter(n.isNotNull)
      .select(bucket.as("bucket"), n.as("__n"))
      .select(col("bucket"), least(col("__n"), col("bucket")).as("__kept"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("__kept")).as("real_tokens"),
        (count(lit(1)) * col("bucket")).as("padded_tokens"))
      .withColumn("pad_waste_q",
        expr("(1048576 * (padded_tokens - real_tokens)) div padded_tokens"))
  }
}
