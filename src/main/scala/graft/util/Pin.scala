package graft.util

import org.apache.spark.sql.DataFrame

/** Lineage cut for driver-looped algorithms (pagerank, k-core, label
  * propagation, connected components): without a cut, iteration k's
  * plan replays all k−1 predecessors and the fixpoint loops go
  * super-linear in planning alone.
  *
  * Two cut strategies, selected per session:
  *
  *   - `localCheckpoint(eager)` — blocks pinned to executor memory/
  *     disk. Right for local[n] and short loops, but at cluster scale
  *     an evicted or lost block KILLS the job (local checkpoints are
  *     not fault-tolerant: losing an executor loses the partition and
  *     Spark cannot recompute it, the lineage is gone).
  *   - `checkpoint(eager)` — reliable checkpoint materialized to the
  *     SparkContext checkpoint directory (HDFS/object store), which
  *     survives executor loss. The standard Spark opt-in is
  *     `sc.setCheckpointDir(...)`; setting it signals exactly the
  *     cluster deployment where reliable cuts are wanted.
  *
  * Selection: `spark.graft.checkpoint` ∈ {auto, local, reliable},
  * default `auto` = reliable iff a checkpoint dir is set, else local —
  * so existing local runs are unchanged and a cluster job opts in with
  * the ordinary public Spark API, no graft-specific plumbing:
  *
  * {{{
  * spark.sparkContext.setCheckpointDir("hdfs:///tmp/graft-ckpt")
  * Graph.pagerank(edges, "src", "dst", iterations = 20) // reliable cuts
  * }}}
  *
  * `reliable` without a checkpoint dir fails fast with a clear message
  * (Spark would otherwise throw mid-loop from deep inside an action).
  */
object Pin {

  /** Cut `df`'s lineage eagerly with the session-selected strategy. */
  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val mode = spark.conf.get("spark.graft.checkpoint", "auto")
    val hasDir = spark.sparkContext.getCheckpointDir.isDefined
    mode match {
      case "local" => df.localCheckpoint(true)
      case "reliable" =>
        require(hasDir, "spark.graft.checkpoint=reliable needs " +
          "sparkContext.setCheckpointDir(...) to be called first")
        df.checkpoint(true)
      case "auto" =>
        if (hasDir) df.checkpoint(true) else df.localCheckpoint(true)
      case other => throw new IllegalArgumentException(
        s"spark.graft.checkpoint must be auto|local|reliable, got '$other'")
    }
  }

  /** Cut `df` and retire `superseded`'s checkpoint — the loop-body
    * form (`ranks = updated.cutLineageReplacing(ranks)`). Without
    * retirement every reliable cut leaves one full materialized copy
    * of the working set in the checkpoint dir for the app lifetime
    * (Spark only reclaims them with
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true`, a
    * GC-driven maybe); a 20-round fixpoint would hold 20 copies.
    * Retirement happens AFTER the new cut is eagerly materialized, so
    * the data the new checkpoint was computed from is never pulled out
    * from under a running job.
    *
    * Contract: the caller declares `superseded` dead — no other live
    * frame may still read it. Frames that were never cut (no
    * checkpoint to retire) are a no-op, so the first loop round can
    * pass its un-cut seed frame safely.
    */
  def cutReplacing(df: DataFrame, superseded: DataFrame): DataFrame = {
    val out = cut(df)
    retire(superseded)
    out
  }

  /** Drop `df`'s checkpoint artifacts IF `df` itself is the result of
    * a cut (its plan is a bare LogicalRDD): reliable checkpoint files
    * are deleted via the Hadoop FS API, local-checkpoint blocks are
    * unpersisted. Deliberately NOT transitive — a derived frame
    * (`someCut.select(...)`) may share its underlying cut with other
    * live frames (e.g. pagerank's per-loop `base`), so walking to
    * leaves would pull data out from under them; a derived or
    * never-cut frame is a no-op, which makes passing a loop's un-cut
    * seed frame on round one safe. Keep loop variables as DIRECT cuts
    * (cut last, after any select) so every superseded round is
    * actually reclaimed.
    */
  def retire(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.getCheckpointFile match {
          case Some(path) =>
            val p = new org.apache.hadoop.fs.Path(path)
            val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
            fs.delete(p, true): Unit
          case None =>
            // local checkpoint (or plain cached rdd): release the blocks
            l.rdd.unpersist(blocking = false): Unit
        }
      case _ => () // derived or never-cut frame — nothing to retire
    }

  /** `df.cutLineage` sugar so loop bodies keep reading as chains. */
  implicit final class PinOps(private val df: DataFrame) extends AnyVal {
    def cutLineage: DataFrame = cut(df)
    def cutLineageReplacing(superseded: DataFrame): DataFrame =
      cutReplacing(df, superseded)
  }
}
