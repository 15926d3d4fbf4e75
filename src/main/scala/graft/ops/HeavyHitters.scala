package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Exact heavy hitters over an unbounded key domain via a
  * Misra–Gries prune + exact rescan (two passes, no full-domain
  * shuffle).
  *
  * Why not `groupBy(key).count.filter`: that shuffles the ENTIRE
  * distinct domain — for token streams at 100 TB that's billions of
  * group keys exchanged to answer a question whose output is a handful
  * of rows. Here pass 1 reduces each partition to a k-counter
  * [[graft.functions.MisraGries]] summary (exchange = O(k·partitions)
  * rows, independent of domain size), whose keys are a SUPERSET of
  * every key with true share > 1/(k+1); pass 2 rescans with the
  * candidate set broadcast, counting ONLY candidate-matching rows —
  * the groupBy touches ≤ k keys. The output is exact counts under an
  * exact integer threshold, so MG's partition-order-dependent
  * internals never show: candidates the exact filter rejects vanish,
  * and the guarantee (`k + 1 ≥ den/num`, enforced) means no true heavy
  * hitter can be missing from the candidate set.
  *
  * Output: (keyCol, cnt, share) for keys with
  * cnt · den > n · num — exact, deterministic.
  */
object HeavyHitters {

  def exact(df: DataFrame, keyCol: String,
      thresholdNum: Long = 1, thresholdDen: Long = 200,
      k: Int = 512): DataFrame = {
    require(thresholdNum >= 1 && thresholdDen >= thresholdNum,
      s"need 0 < threshold <= 1: $thresholdNum/$thresholdDen")
    // MG guarantee covers the threshold: keys with share > num/den
    // must satisfy share > 1/(k+1), i.e. (k+1)·num ≥ den
    require((k.toLong + 1L) * thresholdNum >= thresholdDen,
      s"k too small for threshold: need (k+1)*$thresholdNum >= $thresholdDen, got k=$k")
    val summary = df.agg(
      graft.functions.MisraGries.mg(col(keyCol), k).as("mg"))
    val cands = summary.select(col("mg.n").as("__total"),
      explode(col("mg.keys")).as(keyCol))
    df.select(col(keyCol))
      .join(broadcast(cands), Seq(keyCol))
      .groupBy(col(keyCol), col("__total"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * thresholdDen > col("__total") * thresholdNum)
      .select(col(keyCol), col("cnt"),
        (col("cnt").cast("double") / col("__total").cast("double")).as("share"))
  }
}
