package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextKernels

/** [EXT] Deterministic sampling for training-data curation.
  *
  * `stratifiedByHash` keeps the first `n` rows per stratum in md5-hash
  * order of the id — a balanced per-class subsample that is a pure
  * function of the data: reproducible across engines, runs, cluster
  * sizes, and partitionings (unlike `sampleBy`, whose RNG draw depends
  * on partition layout). The hash order is effectively uniform-random
  * but frozen, so the sample is unbiased w.r.t. any column not
  * correlated with md5(id).
  *
  * Shape: one shuffle on the stratum key + one window sort — rank
  * within stratum by (hash, id), keep rank <= n. A hot stratum is one
  * window partition; for extreme skew pre-filter with
  * `pmod(hash, k) = 0`-style thinning before ranking.
  */
object Sample {

  def stratifiedByHash(
      df: DataFrame, stratumCols: Seq[String], idCol: String,
      n: Int): DataFrame = {
    val h = TextKernels.hex60(col(idCol).cast("string"))
    val w = Window.partitionBy(stratumCols.map(col): _*)
      .orderBy(h.asc, col(idCol).asc)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }

  /** Mixture (per-class rate) sampling: keep a row when its id hash
    * lands under the class's rate — the data-mixing knob (upsample
    * high-quality sources, downsample boilerplate ones) as a pure
    * function of the data. Entirely map-side: no shuffle, no RNG, the
    * same row keeps/drops identically on every engine, run, and
    * partitioning. Rates are in [0, 1]; classes absent from the map
    * use `defaultRate`.
    */
  def mixtureByHash(
      df: DataFrame, classCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    val M = 1000000L
    val bucket = pmod(TextKernels.hex60(col(idCol).cast("string")), lit(M))
    val threshold = rates.foldLeft(lit((defaultRate * M).toLong)) {
      case (acc, (cls, rate)) =>
        when(col(classCol) === cls, lit((rate * M).toLong)).otherwise(acc)
    }
    df.filter(bucket < threshold)
  }
}
