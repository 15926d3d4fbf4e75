package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Exact 2-D Pareto frontier (skyline): the points no other
  * point dominates, minimizing both dimensions — `q` dominates `p`
  * when `q.x ≤ p.x ∧ q.y ≤ p.y` and at least one is strict. The
  * cost/size trade-off view a curation or capacity planner reads
  * ("nothing cheaper is also smaller").
  *
  * Distributed shape — the local-prune/global-merge pattern (same
  * family as `Sweep`'s two-phase prefix sum):
  *
  *  1. `distinct` collapses the value domain (skyline is a set
  *     property; duplicates never co-exist on a strict frontier).
  *  2. LOCAL prune: each partition computes the frontier of its own
  *     subset with a running-min window keyed on
  *     `spark_partition_id()` — fully parallel, and safe because a
  *     point dominated inside any subset is dominated globally, while
  *     every global frontier point survives its partition's frontier.
  *  3. GLOBAL pass: the same running-min window, unpartitioned, over
  *     the local survivors only. Survivors are the union of P
  *     partition frontiers — for non-adversarial data orders of
  *     magnitude smaller than the input; the worst case (all points
  *     mutually non-dominated) is inherent to the operator's OUTPUT,
  *     not the algorithm.
  *
  * The running-min identity: after sorting by (x asc, y asc), a point
  * is on the frontier iff its y is strictly below every preceding y —
  * preceding points have x ≤ this x, so any with y ≤ this y dominates
  * it (ties collapse to the first in order); all comparisons stay in
  * the columns' native types, no float math is introduced.
  */
object Skyline {

  /** Frontier of `df` over (`xCol`, `yCol`), both minimized.
    * Output: the distinct frontier points, columns (`xCol`, `yCol`).
    */
  def frontier2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val pts = df.select(col(xCol), col(yCol))
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .distinct()
    val local = Window.partitionBy(spark_partition_id())
      .orderBy(col(xCol), col(yCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val survivors = pts
      .withColumn("__pm", min(col(yCol)).over(local))
      .filter(col("__pm").isNull || col(yCol) < col("__pm"))
      .drop("__pm")
    val global = Window.orderBy(col(xCol), col(yCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    survivors
      .withColumn("__pm", min(col(yCol)).over(global))
      .filter(col("__pm").isNull || col(yCol) < col("__pm"))
      .drop("__pm")
  }
}
