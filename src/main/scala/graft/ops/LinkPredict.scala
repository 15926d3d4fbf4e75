package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Link prediction over an edge list: score NON-adjacent node
  * pairs by their shared neighborhood — the "which documents/suppliers
  * probably belong together even though no edge was observed" signal a
  * curation pipeline runs on its kNN / co-occurrence graphs to densify
  * them (missing-edge recovery before connected components) or to
  * propose merge candidates record linkage missed.
  *
  * Two classic indices per candidate pair (Liben-Nowell & Kleinberg,
  * "The link-prediction problem for social networks", CIKM 2003 —
  * public formulas), both exact integers here:
  *   - common neighbors:  cn(a,b)  = |Γ(a) ∩ Γ(b)|
  *   - resource allocation: ra(a,b) = Σ_{w ∈ Γ(a)∩Γ(b)} 1/deg(w),
  *     quantized as Σ ⌊2²⁰/deg(w)⌋ so the sum is an order-independent
  *     long on any engine (RA beats Adamic–Adar's 1/log deg on most
  *     graphs and needs no runtime log — Zhou/Lü/Zhang, EPJ B 2009).
  *
  * Scale shape: candidate pairs come from the WEDGE expansion — for
  * each node w, all i<j pairs of its neighbors — so total work is
  * Σ_w deg(w)², bounded on the graphs this is meant for (kNN graphs
  * have deg ≤ k by construction; near-dup candidate graphs are
  * top-k-truncated). `maxDegree` guards the power-law case: a hub
  * above it contributes no wedges (its pairs are the least informative
  * — a near-universal neighbor predicts nothing), exactly the maxDf
  * cap the Jaccard inverted index applies to hot shingles. The
  * adjacency check that removes existing edges is a left-anti
  * equi-join on the canonical pair, never a broadcast of the graph.
  *
  * One shuffle builds degrees, one expands wedges (keyed on w), one
  * aggregates pairs, plus the anti-join — all equi-keyed, nothing
  * quadratic in |V|.
  */
object LinkPredict {

  private val Q = 1L << 20

  /** Score non-adjacent pairs with ≥ `minCommon` common neighbors.
    * Output: (node_a < node_b, cn, ra_q) — ra_q = Σ ⌊2²⁰/deg(w)⌋.
    */
  def commonNeighborScores(edges: DataFrame, srcCol: String, dstCol: String,
      minCommon: Int = 2, maxDegree: Int = 1000): DataFrame = {
    require(minCommon >= 1, s"need minCommon >= 1: $minCommon")
    require(maxDegree >= 2, s"need maxDegree >= 2: $maxDegree")
    val canon = edges.select(
        least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val adj = canon.unionAll(canon.select(col("v").as("u"), col("u").as("v")))
    val deg = adj.groupBy(col("u").as("w")).agg(count(lit(1)).as("deg"))
    // wedges at w: neighbor pairs (a < b) of every non-hub w, each
    // carrying w's quantized 1/deg contribution
    val nbrs = adj.select(col("v").as("w"), col("u").as("x"))
      .join(deg.filter(col("deg") <= maxDegree), Seq("w"))
    val wedges = nbrs.as("l")
      .join(nbrs.as("r"),
        col("l.w") === col("r.w") && col("l.x") < col("r.x"))
      .select(col("l.x").as("a"), col("r.x").as("b"),
        expr(s"$Q div l.deg").as("c"))
    val scored = wedges
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("cn"), sum(col("c")).as("ra_q"))
      .filter(col("cn") >= minCommon)
    scored
      .join(canon.select(col("u").as("a"), col("v").as("b")),
        Seq("a", "b"), "left_anti")
      .select(col("a").as("node_a"), col("b").as("node_b"),
        col("cn"), col("ra_q"))
  }
}
