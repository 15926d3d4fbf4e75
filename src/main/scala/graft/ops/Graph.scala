package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.util.Pin.PinOps

/** Shared, session-cached graph prework: the canonical undirected
  * edge set, its symmetric doubling, the degree table, and the node
  * list — each computed and PINNED at most once per (SparkContext,
  * cache key) and reused by every graph query in the session. Before
  * this existed, each of the graph queries over the same source graph
  * rebuilt edges/nodes/degrees from scratch — at sf0.1 the shared
  * co-occurrence prefix alone was 1–2 s PER QUERY across eight
  * queries. At cluster scale the pins are persists of ~|V|·k edge
  * rows; the cache holds one entry per distinct graph source, for
  * the context's lifetime (an explicit, bounded session cache — the
  * deliberate trade of memory for the repeated-analysis pattern).
  *
  * The derived members are lazy: a query touching only `edges` pins
  * nothing extra.
  */
final class GraphFrameLite private (val edges: DataFrame,
    srcCol: String, dstCol: String)
    extends graft.util.SessionCache.PinnedArtifact {
  import graft.util.Pin.PinOps

  private val pins = new java.util.concurrent.CopyOnWriteArrayList[DataFrame]()
  private def pin(df: DataFrame): DataFrame = {
    val c = df.cutLineage
    pins.add(c)
    c
  }

  /** Canonical undirected (u < v) edge set, pinned once. */
  lazy val canonical: DataFrame =
    pin(Graph.canonUndirected(edges, srcCol, dstCol))

  /** Both orientations of [[canonical]] — the message-passing edge
    * list, pinned once. */
  lazy val symmetric: DataFrame =
    pin(canonical.unionAll(
      canonical.select(col("v").as("u"), col("u").as("v"))))

  /** (node, degree) of [[canonical]], pinned once. */
  lazy val degrees: DataFrame = pin(Graph.undirectedDegrees(canonical))

  /** Every endpoint node, derived from the pinned degree table. */
  def nodes: DataFrame = degrees.select(col("node"))

  /** The cuts forced so far — [[graft.util.SessionCache]]'s byte
    * accounting and release hook (never forces an unbuilt lazy).
    */
  def pinnedFrames: Seq[DataFrame] = {
    import scala.jdk.CollectionConverters._
    pins.asScala.toSeq
  }
}

object GraphFrameLite {

  /** The session-cached instance for `key` ([[graft.util
    * .SessionCache]] — one build per (SparkContext, key), stale-
    * context eviction). `build` must return an edge list whose
    * content is a pure function of `key` (immutable source data),
    * which is what makes cross-query reuse sound. Honors the
    * `spark.graft.sessionCache=off` sweep switch like every other
    * cached wrapper: a bypassing session gets a FRESH uncached
    * instance, so the partition-invariance and plan-contract sweeps
    * never read the sibling session's pinned graph.
    */
  def cached(spark: org.apache.spark.sql.SparkSession, key: String,
      srcCol: String = "src", dstCol: String = "dst")(
      build: => DataFrame): GraphFrameLite =
    if (!graft.util.SessionCache.enabled(spark)) of(build, srcCol, dstCol)
    else graft.util.SessionCache.cached(spark, s"graph:$key")(
      new GraphFrameLite(build, srcCol, dstCol))

  /** Uncached wrapper for a one-off graph. */
  def of(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst"): GraphFrameLite =
    new GraphFrameLite(edges, srcCol, dstCol)
}

/** [EXT] Distributed graph statistics over an edge-list DataFrame —
  * the graph-shaped analyses a curation pipeline runs on similarity /
  * co-occurrence graphs (the q124 kNN graph, supplier co-part graphs,
  * near-dup candidate graphs).
  *
  * Everything is edge-list relational algebra: no vertex-program
  * framework, no driver-side adjacency — joins and aggregations that
  * AQE sizes like any other query. Operators come in two forms: the
  * raw edge-list entry points (self-contained), and
  * [[GraphFrameLite]] overloads that reuse the session-pinned
  * canonical/degree prework instead of rebuilding it per query.
  */
object Graph {

  /** Canonical undirected edge set: (u < v), self-loops dropped,
    * duplicates collapsed — the shared first step of every undirected
    * operator here, maintained once.
    */
  private[ops] def canonUndirected(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame =
    edges.select(
        least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()

  /** Per-node degree of a canonical edge set. */
  private[ops] def undirectedDegrees(es: DataFrame): DataFrame =
    es.select(col("u").as("node"))
      .unionAll(es.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))

  /** One k-core peel round: drop every edge touching a node whose
    * surviving degree is below k; lineage cut so round r never
    * replays rounds 1..r−1. Shared by the fixed-round and
    * convergence-detecting peels — the step is maintained once.
    */
  private def peelRound(e: DataFrame, k: Int): DataFrame = {
    val keep = undirectedDegrees(e).filter(col("degree") >= k)
      .select(col("node"))
    e.join(keep.select(col("node").as("u")), Seq("u"), "left_semi")
      .join(keep.select(col("node").as("v")), Seq("v"), "left_semi")
      .select(col("u"), col("v"))
      .cutLineageReplacing(e) // the pre-peel round is superseded
  }

  /** Shared PageRank driver loop. `redistributeDangling = false` drops
    * sink mass each round (the simple variant); `true` floor-shares
    * the summed sink rank back uniformly. ONE implementation of the
    * quantized update so the two public variants can never fork.
    */
  private def pagerankLoop(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, dampNum: Long, dampDen: Long,
      redistributeDangling: Boolean): DataFrame = {
    require(iterations >= 1, s"need iterations >= 1: $iterations")
    require(dampNum >= 0 && dampDen > 0 && dampNum <= dampDen,
      s"bad damping: $dampNum/$dampDen")
    val Scale = 1000000000000L
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).cutLineage
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    val outdeg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("outdeg"))
    val base = nodes.join(outdeg, Seq("node"), "left").cutLineage
    val n = if (redistributeDangling) base.count() else 0L
    val teleport = Scale * (dampDen - dampNum) / dampDen
    var ranks = base.select(col("node"), lit(Scale).as("rank"), col("outdeg"))
    for (_ <- 1 to iterations) {
      val contribs = e
        .join(ranks.select(col("node").as("src"),
          expr("rank div outdeg").as("__c")), Seq("src"))
        .groupBy(col("dst").as("node")).agg(sum(col("__c")).as("__inc"))
      val joined = base.join(contribs, Seq("node"), "left")
      val updated =
        if (redistributeDangling) {
          val dangling = ranks.filter(col("outdeg").isNull)
            .agg(coalesce(sum(col("rank")), lit(0L)).as("__dt"))
          joined.crossJoin(broadcast(dangling))
            .select(col("node"),
              (lit(teleport) + expr(
                s"($dampNum * (coalesce(__inc, 0L) + __dt div $n)) div $dampDen"))
                .as("rank"),
              col("outdeg"))
        } else
          joined.select(col("node"),
            (lit(teleport) +
              expr(s"($dampNum * coalesce(__inc, 0L)) div $dampDen")).as("rank"),
            col("outdeg"))
      ranks = updated.cutLineageReplacing(ranks)
    }
    ranks.select(col("node"), col("rank"))
  }


  /** Driver-looped PageRank over a directed edge list — the full
    * iterative algorithm (q73 is one step), integer-quantized so every
    * iteration is exact and engine-portable: ranks start at
    * SCALE = 10¹² per node and update as
    * `teleport + ⌊damp · Σ ⌊rank/outdeg⌋⌋` with damp = num/den — no
    * float mass anywhere, so the fixpoint trajectory is identical
    * under any partitioning. Dangling mass is dropped (the simple
    * variant), documented rather than redistributed.
    *
    * Scale shape: per iteration ONE join of the edge list against the
    * |nodes|-row rank table (both keyed on node ids) + one aggregation
    * — the standard message-passing step; [[graft.util.Pin]] cuts the
    * lineage each round (the k-means loop rule: without it iteration k
    * replays all k−1 predecessors), pinning only (node, rank, outdeg)
    * longs. Locally that cut is an eager `localCheckpoint`; on a
    * cluster, call `sc.setCheckpointDir(...)` and every cut upgrades
    * to a RELIABLE storage checkpoint that survives executor loss
    * (Pin's auto mode). The edge list is pinned ONCE since every
    * round re-reads it.
    *
    * Output: (node, rank) after `iterations` rounds.
    */
  def pagerank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 3, dampNum: Long = 85, dampDen: Long = 100): DataFrame =
    pagerankLoop(edges, srcCol, dstCol, iterations, dampNum, dampDen,
      redistributeDangling = false)

  /** [[pagerank]] over the session-pinned SYMMETRIC edge set (the
    * undirected message-passing form the graph queries use). */
  def pagerank(g: GraphFrameLite, iterations: Int): DataFrame =
    pagerankLoop(g.symmetric, "u", "v", iterations, 85, 100,
      redistributeDangling = false)

  /** [[pagerank]] with DANGLING-MASS REDISTRIBUTION — the textbook
    * variant for genuinely directed graphs (citation/link graphs,
    * oriented candidate edges), where sink nodes otherwise leak their
    * whole rank every round and total mass decays: each iteration the
    * summed rank of out-degree-0 nodes is shared back uniformly,
    * `rank' = teleport + ⌊damp · (Σ ⌊rank/outdeg⌋ + ⌊dangling/n⌋)⌋`
    * (Page–Brin–Motwani–Winograd 1999, §2.7 — public method), with the
    * same integer quantization as [[pagerank]] so the trajectory is
    * exact and engine-portable (the share uses one floor division of
    * longs; the ≤ n−1 units of flooring residue per round are
    * deliberately dropped, identically on every engine).
    *
    * Scale adds ONE 1-row aggregate per iteration (the dangling sum,
    * broadcast onto the rank update) on top of [[pagerank]]'s
    * join+agg; `n` is a single driver scalar computed once (the
    * watermark rule). Symmetric graphs have no sinks — there this
    * reduces to [[pagerank]] exactly (dangling sum 0), so it is only
    * worth its extra aggregate on directed inputs.
    *
    * Output: (node, rank) after `iterations` rounds.
    */
  def pagerankDangling(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 3, dampNum: Long = 85, dampDen: Long = 100): DataFrame =
    pagerankLoop(edges, srcCol, dstCol, iterations, dampNum, dampDen,
      redistributeDangling = true)

  /** [[pagerankDangling]] over the session-pinned CANONICAL (u→v for
    * u<v) edge set — nodes appearing only on the v side are genuine
    * sinks, the directed form the dangling variant is for. */
  def pagerankDangling(g: GraphFrameLite, iterations: Int): DataFrame =
    pagerankLoop(g.canonical, "u", "v", iterations, 85, 100,
      redistributeDangling = true)

  /** Per-node triangle count + local clustering coefficient via the
    * DEGREE-ORIENTED wedge join (the MPS/Cohen algorithm): each
    * undirected edge points from its (degree, id)-smaller endpoint to
    * the larger, so every node's out-degree is bounded by O(√|E|)
    * regardless of how skewed the raw degrees are — the wedge
    * expansion at a hub node is quadratic in its ORIENTED out-degree,
    * not its real degree, which is what makes the join survive a
    * power-law graph at scale. Each triangle is generated exactly once
    * (at its orientation-minimal vertex) and closed with one probe of
    * the canonical edge set.
    *
    * Orientation changes which vertex ENUMERATES a triangle, never the
    * triangle set itself — so an oracle may use plain id-order (a<b<c)
    * and match exactly.
    *
    * Shuffle inventory: canonical dedup, degree agg, 2 degree joins,
    * the wedge self-join on the oriented source, the closing-edge
    * join, and the per-node rollup — all keyed on node ids or id
    * pairs, uniform after orientation; nothing corpus-quadratic.
    *
    * Output: (node, degree, n_triangles, cc) — cc = 2T / d(d−1), one
    * division of exact longs, null when degree < 2; triangle-free
    * nodes appear with 0.
    */
  def triangleStats(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val canon = canonUndirected(edges, srcCol, dstCol)
    triangleStatsOn(canon, undirectedDegrees(canon))
  }

  /** [[triangleStats]] on the session-pinned prework. */
  def triangleStats(g: GraphFrameLite): DataFrame =
    triangleStatsOn(g.canonical, g.degrees)

  private def triangleStatsOn(canon: DataFrame, deg: DataFrame): DataFrame = {
    val oriented = canon
      .join(deg.select(col("node").as("u"), col("degree").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("degree").as("dv")), Seq("v"))
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          struct(col("u").as("s"), col("v").as("t")))
          .otherwise(struct(col("v").as("s"), col("u").as("t"))).as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"))
    // wedges at the orientation-minimal vertex; id-order on (t1, t2)
    // only avoids emitting each unordered pair twice
    val tri = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.s") === col("e2.s") && col("e1.t") < col("e2.t"))
      .select(col("e1.s").as("a"), col("e1.t").as("b"), col("e2.t").as("c"))
      .join(canon,
        least(col("b"), col("c")) === col("u") &&
          greatest(col("b"), col("c")) === col("v"))
      .select(col("a"), col("b"), col("c"))
    val perNode = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .withColumn("cc", when(col("degree") >= 2,
        (col("n_triangles") * 2).cast("double") /
          (col("degree") * (col("degree") - 1)).cast("double")))
  }

  /** Synchronous majority label propagation (Raghavan et al., PRE
    * 2007 — LPA community detection; public algorithm), made fully
    * deterministic: each round EVERY node adopts the most frequent
    * label among its neighbors, ties to the smallest label — no
    * random visit order, so the trajectory is a pure function of the
    * (graph, seed labels, rounds) triple and an unrolled oracle can
    * replay it exactly.
    *
    * Per round: one edge⋈label join (both keyed on node ids) + one
    * (node, label) count + one per-node argmax folded into a single
    * `max(struct(count, −label))` aggregation — no window, no sort;
    * [[graft.util.Pin]] cuts lineage per round (the [[pagerank]]
    * rule; reliable checkpoint on a cluster with a checkpoint dir).
    *
    * Output: (node, label) after `rounds` rounds — nodes present in
    * the edge list only (isolated nodes have no neighbors to vote).
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      labels: DataFrame, labelNodeCol: String, labelCol: String,
      rounds: Int): DataFrame = {
    val canon = canonUndirected(edges, srcCol, dstCol)
    labelPropagationOn(
      canon.unionAll(canon.select(col("v").as("u"), col("u").as("v")))
        .cutLineage,
      labels, labelNodeCol, labelCol, rounds)
  }

  /** [[labelPropagation]] on the session-pinned prework. */
  def labelPropagation(g: GraphFrameLite, labels: DataFrame,
      labelNodeCol: String, labelCol: String, rounds: Int): DataFrame =
    labelPropagationOn(g.symmetric, labels, labelNodeCol, labelCol, rounds)

  private def labelPropagationOn(de: DataFrame, labels: DataFrame,
      labelNodeCol: String, labelCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, s"need rounds >= 1: $rounds")
    var lab = labels.select(col(labelNodeCol).cast("long").as("node"),
      col(labelCol).cast("long").as("label")).cutLineage
    for (_ <- 1 to rounds) {
      lab = de
        .join(lab.select(col("node").as("v"), col("label")), Seq("v"))
        .groupBy(col("u"), col("label"))
        .agg(count(lit(1)).as("__c"))
        .groupBy(col("u").as("node"))
        .agg(max(struct(col("__c").as("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("node"), (-col("m.nl")).as("label"))
        .cutLineageReplacing(lab)
    }
    lab
  }

  /** Degree assortativity: the Pearson correlation of the endpoint
    * degrees over every DIRECTED edge (each undirected edge counted in
    * both orientations, the standard convention — Newman, "Assortative
    * mixing in networks", PRL 2002; public formula). Positive means
    * hubs attach to hubs; similarity graphs from near-dup candidates
    * are typically strongly assortative (dup clusters are cliques).
    *
    * Everything up to the final division is EXACT: degrees are longs,
    * and the five moment sums accumulate as decimal(38,0) — order-
    * independent under any partitioning, so both engines agree on
    * every intermediate; doubles appear only in the closing
    * `cov / (sx·sy)`. Cost is linear in edges: one degree aggregation,
    * two degree joins (the degree table is AQE-broadcastable — one row
    * per node), one global fold. No wedge expansion, no self-join.
    *
    * Output: one row (n_edges, assortativity) — assortativity null
    * when either side's degree variance is zero (the correlation is
    * undefined on degree-regular graphs).
    */
  /** Fixed-round k-core peel: repeatedly delete nodes whose degree in
    * the SURVIVING subgraph is below k (Seidman's k-core, public
    * algorithm) — the graph-curation analogue of a quality floor: on a
    * near-dup or co-occurrence graph the k-core is the densely
    * connected region, the periphery the long tail of weak evidence.
    *
    * The round count is an explicit contract (like [[pagerank]]'s
    * iteration count) so the trajectory is a pure function of the
    * input on any engine — after `rounds` peels the survivors are a
    * SUPERSET of the true k-core, converged when a round deletes
    * nothing; at scale you run rounds until a cheap count stabilizes.
    *
    * Per round: one degree aggregation + two semi-joins of the edge
    * list against the surviving node set (both keyed on node ids —
    * AQE broadcasts the node side when it has shrunk), with
    * [[graft.util.Pin]] cutting lineage so round r never replays
    * rounds 1..r−1. Cost per round is linear in surviving edges and
    * the edge set only shrinks.
    *
    * Output: surviving (node, degree) — degree measured inside the
    * surviving subgraph.
    */
  def kcore(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, rounds: Int): DataFrame =
    kcoreOn(canonUndirected(edges, srcCol, dstCol).cutLineage, k, rounds)

  /** [[kcore]] on the session-pinned prework. The peel loop RETIRES
    * each superseded round's checkpoint — handing it the pinned
    * canonical frame directly would unpersist the session cache on
    * round one, so the loop starts from a DERIVED frame ([[graft.util
    * .Pin.retire]] is deliberately non-transitive: derived frames are
    * a retire no-op).
    */
  def kcore(g: GraphFrameLite, k: Int, rounds: Int): DataFrame =
    kcoreOn(g.canonical.select(col("u"), col("v")), k, rounds)

  private def kcoreOn(canon: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"need k >= 1: $k")
    require(rounds >= 1, s"need rounds >= 1: $rounds")
    var e = canon
    for (_ <- 1 to rounds) e = peelRound(e, k)
    undirectedDegrees(e)
  }

  /** [[kcore]] peeled to CONVERGENCE: rounds run until the surviving
    * edge count stabilizes (one cheap `count()` per round — the driver
    * scalar [[kcore]]'s own doc prescribes at scale), so the result is
    * the TRUE k-core, not a fixed-round superset. `maxRounds` is a
    * runaway bound only — peeling is monotone (the edge set strictly
    * shrinks until the fixpoint), so termination is guaranteed at
    * ≤ |V| rounds and typical graphs converge in a handful.
    *
    * Output: (surviving (node, degree), rounds actually run) — the
    * round count is the convergence diagnostic a pipeline logs.
    */
  def kcoreConverged(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, maxRounds: Int = 100): (DataFrame, Int) = {
    require(k >= 1, s"need k >= 1: $k")
    require(maxRounds >= 1, s"need maxRounds >= 1: $maxRounds")
    var e = canonUndirected(edges, srcCol, dstCol).cutLineage
    var prev = e.count()
    var rounds = 0
    var converged = prev == 0
    while (!converged && rounds < maxRounds) {
      e = peelRound(e, k)
      rounds += 1
      val cur = e.count()
      converged = cur == prev || cur == 0
      prev = cur
    }
    (undirectedDegrees(e), rounds)
  }

  /** Newman modularity of a node partition (Newman–Girvan, PRE 2004 —
    * public formula): how much denser communities are than a random
    * graph with the same degrees. Exact integers to the last division:
    * with m undirected edges, per community c let e_c = intra-edges
    * and d_c = Σ degrees; then `Q = Σ_c (4m·e_c − d_c²) / 4m²` — the
    * numerator Σ(4m·e_c − d_c²) is the exact long this emits next to
    * the double Q, so an oracle can compare the integer and both
    * engines agree on the ratio of identical integers.
    *
    * This is the ACCEPTANCE METRIC for [[labelPropagation]]'s output —
    * run after clustering to decide whether the partition carries any
    * structure (Q ≈ 0 ⇒ labels are noise).
    *
    * Shape: one degree aggregation, two label joins (labels are
    * |V|-row, AQE-broadcastable), two |labels|-domain rollups, one
    * 1-row m broadcast — linear in edges, no wedge work.
    *
    * Edges whose endpoints carry different labels (or none) count in m
    * but in no community — the standard convention. Output ONE row:
    * (n_edges, n_communities, q_num, modularity = q_num/(4m²)).
    */
  def modularity(edges: DataFrame, srcCol: String, dstCol: String,
      labels: DataFrame, labelNodeCol: String, labelCol: String): DataFrame = {
    val canon = canonUndirected(edges, srcCol, dstCol)
    modularityOn(canon, undirectedDegrees(canon), labels, labelNodeCol, labelCol)
  }

  /** [[modularity]] on the session-pinned prework. */
  def modularity(g: GraphFrameLite, labels: DataFrame,
      labelNodeCol: String, labelCol: String): DataFrame =
    modularityOn(g.canonical, g.degrees, labels, labelNodeCol, labelCol)

  private def modularityOn(canon: DataFrame, deg: DataFrame,
      labels: DataFrame, labelNodeCol: String, labelCol: String): DataFrame = {
    val lab = labels.select(col(labelNodeCol).cast("long").as("node"),
      col(labelCol).cast("long").as("label"))
    val dC = deg.join(lab, Seq("node"))
      .groupBy(col("label")).agg(sum(col("degree")).as("d_c"))
    val eC = canon
      .join(lab.select(col("node").as("u"), col("label").as("lu")), Seq("u"))
      .join(lab.select(col("node").as("v"), col("label").as("lv")), Seq("v"))
      .filter(col("lu") === col("lv"))
      .groupBy(col("lu").as("label")).agg(count(lit(1)).as("e_c"))
    val m = canon.agg(count(lit(1)).as("m"))
    // Terms are bounded by 4m² — past BIGINT for m ≳ 1.5e9 edges (the
    // 100 TB regime), so the products and the sum accumulate as
    // decimal(38,0) like the sibling moment sums (assortativity,
    // autocorrelation). The emitted q_num stays BIGINT for the oracle
    // contract, null-guarded rather than silently wrapped when the
    // exact numerator leaves long range; modularity itself always
    // derives from the exact decimal sum.
    val dec = "decimal(38,0)"
    dC.join(eC, Seq("label"), "left")
      .crossJoin(broadcast(m))
      .select(col("m"),
        (lit(4) * col("m").cast(dec) * coalesce(col("e_c"), lit(0L)) -
          col("d_c").cast(dec) * col("d_c")).as("term"))
      .groupBy(col("m"))
      .agg(count(lit(1)).as("n_communities"), sum(col("term")).as("q_num_d"))
      .select(col("m").as("n_edges"), col("n_communities"),
        when(abs(col("q_num_d")) <= lit(Long.MaxValue),
          col("q_num_d").cast("long")).as("q_num"),
        when(col("m") > 0, col("q_num_d").cast("double") /
          (lit(4) * col("m").cast("double") * col("m"))).as("modularity"))
  }

  def assortativity(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val canon = canonUndirected(edges, srcCol, dstCol)
    assortativityOn(
      canon.unionAll(canon.select(col("v").as("u"), col("u").as("v"))),
      undirectedDegrees(canon))
  }

  /** [[assortativity]] on the session-pinned prework. */
  def assortativity(g: GraphFrameLite): DataFrame =
    assortativityOn(g.symmetric, g.degrees)

  private def assortativityOn(directed: DataFrame, deg: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val xy = directed
      .join(deg.select(col("node").as("u"), col("degree").as("x")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("degree").as("y")), Seq("v"))
    val m = xy.agg(
      count(lit(1)).as("m"),
      sum(col("x").cast(dec)).as("sx"),
      sum(col("y").cast(dec)).as("sy"),
      sum((col("x") * col("y")).cast(dec)).as("sxy"),
      sum((col("x") * col("x")).cast(dec)).as("sxx"),
      sum((col("y") * col("y")).cast(dec)).as("syy"))
    m.select(
      col("m").as("n_edges"),
      when(col("m") * col("sxx") > col("sx") * col("sx"),
        (col("m") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("m") * col("sxx") - col("sx") * col("sx")).cast("double")) *
            sqrt((col("m") * col("syy") - col("sy") * col("sy")).cast("double"))))
        .as("assortativity"))
  }
}
