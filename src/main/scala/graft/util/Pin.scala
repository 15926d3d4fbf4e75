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

  /** `df.cutLineage` sugar so loop bodies keep reading as chains. */
  implicit final class PinOps(private val df: DataFrame) extends AnyVal {
    def cutLineage: DataFrame = cut(df)
  }
}
