package graft.queries

/** Shared DuckDB SQL fragments for the oracle side of the query packs.
  * Each mirrors a Spark-side kernel/Column form bit-for-bit (see the
  * cross-engine determinism rules in PipelinePack's scaladoc).
  */
private[queries] object OracleSql {

  /** Whitespace tokens of `text`. */
  val T = "string_split(text, ' ')"

  /** Non-negative 60-bit hash of a string expression (mirrors
    * TextKernels.hex60 / Kernels.hex60).
    */
  def hex60(s: String): String =
    s"('0x' || substr(md5($s), 1, 15))::BIGINT"

  /** Left-fold dot product of two list expressions, cast to double
    * element-wise first (mirrors VectorKernels.dot).
    */
  def dot(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, len($a) + 1), " +
      s"i -> ($a)[i]::DOUBLE * ($b)[i]::DOUBLE)), (acc, x) -> acc + x)"

  /** Null-safe cosine (mirrors Similarity.safeCosine / Kernels.cosine). */
  def cos(a: String, b: String): String =
    s"(CASE WHEN sqrt(${dot(a, a)}) > 0 AND sqrt(${dot(b, b)}) > 0 " +
      s"THEN ${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})) END)"

  /** Shard/ord placement mirroring ShardExport.assign — the salt
    * prefixes come from the operator so both engines share one
    * definition.
    */
  def shard(idExpr: String, numShards: Int, seed: Long): String =
    s"(${hex60(s"'${graft.ops.ShardExport.shardSalt(seed)}' || $idExpr")}) % $numShards"
  def ord(idExpr: String, seed: Long): String =
    hex60(s"'${graft.ops.ShardExport.ordSalt(seed)}' || $idExpr")
}
