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
  *
  * '''Anti-correlated-input guard.''' The global pass sorts the local
  * survivors on ONE partition — fine when the frontier is small, but
  * anti-correlated data (x and y trade off perfectly, every point
  * mutually non-dominated) defeats the local prune entirely: all N
  * points survive and the "global pass over survivors" silently
  * becomes a whole-data single-partition sort. That hazard is
  * inherent to the exact 2-D skyline's OUTPUT size, so rather than
  * degrade quietly the plan carries a lazy size tripwire: a 1-row
  * survivor count (cheap map-side partial aggregate) gated by
  * `assert_true` and cross-joined (1-row broadcast) into the global
  * pass — past `maxGlobalRows` the job fails LOUDLY at the first
  * action, naming the hazard, before the single-partition sort runs.
  */
object Skyline {

  /** Frontier of `df` over (`xCol`, `yCol`), both minimized.
    * Output: the distinct frontier points, columns (`xCol`, `yCol`).
    *
    * @param maxGlobalRows loud upper bound on the local-frontier
    *   survivors the exact global pass will sort on one partition
    *   (class doc); raise it only if one partition can actually hold
    *   that many rows.
    */
  def frontier2D(df: DataFrame, xCol: String, yCol: String,
      maxGlobalRows: Long = 10000000L): DataFrame = {
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
    // lazy tripwire (class doc): the guard row only exists if the
    // survivor count passes assert_true, so the global sort below can
    // never receive an over-limit input. The filter REFERENCES __n, so
    // column pruning cannot fold the assertion away; the 1-row
    // broadcast join is bounded by construction.
    // COST: the guard aggregate is a SECOND evaluation of the
    // survivors subtree (distinct + local-prune window) — Catalyst
    // reuses the distinct's exchange across the two readers, but the
    // window recomputes, so frontier2D pays roughly 2× the local-prune
    // cost even when the guard passes. Accepted: the subtree is one
    // map-side window over the deduplicated domain, and the
    // alternative (an eager count or a localCheckpoint pin) would
    // trade a lazy single-action plan for a second action/
    // materialization that breaks callers composing this frame lazily.
    val guard = survivors.agg(count(lit(1)).as("__n"))
      .filter(assert_true(col("__n") <= maxGlobalRows,
        concat(lit("Skyline.frontier2D: "), col("__n"),
          lit(s" local-frontier survivors exceed maxGlobalRows=" +
            s"$maxGlobalRows. Anti-correlated input: nearly all points " +
            "are mutually non-dominated, so the exact global pass would " +
            "sort them on a single partition. Either the frontier " +
            "itself is this large (raise maxGlobalRows only if one " +
            "partition can hold it) or pre-bucket one dimension and " +
            "take per-bucket frontiers first."))).isNull)
    val global = Window.orderBy(col(xCol), col(yCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    survivors
      .crossJoin(broadcast(guard))
      .withColumn("__pm", min(col(yCol)).over(global))
      .filter(col("__pm").isNull || col(yCol) < col("__pm"))
      .drop("__pm", "__n")
  }
}
