package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Graph, GraphFrameLite}

/** The session-cached graph prework: every GraphFrameLite overload
  * must return EXACTLY what its raw edge-list form returns (the cache
  * is a performance artifact, never a semantic one), the cache must
  * return one instance per key, and the peel loop's checkpoint
  * retirement must never unpersist the session-pinned frames (the
  * hazard kcore's derived-frame shield exists for).
  */
class GraphFrameLiteSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // a small graph with hubs, sinks (canonical orientation), and a
  // triangle-rich core
  private def rawEdges: DataFrame = Seq(
    (1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (3L, 5L),
    (5L, 6L), (6L, 7L), (2L, 7L), (7L, 1L), (5L, 1L), (4L, 2L),
    (8L, 1L), (8L, 2L), (9L, 9L), (2L, 1L)).toDF("src", "dst")

  private def g = GraphFrameLite.of(rawEdges)

  private def sorted(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toVector).toSeq.sortBy(_.mkString("|"))

  test("lite overloads agree with the raw edge-list forms exactly") {
    assert(sorted(Graph.triangleStats(g)) ===
      sorted(Graph.triangleStats(rawEdges, "src", "dst")))
    assert(sorted(Graph.assortativity(g)) ===
      sorted(Graph.assortativity(rawEdges, "src", "dst")))
    assert(sorted(Graph.kcore(g, k = 2, rounds = 2)) ===
      sorted(Graph.kcore(rawEdges, "src", "dst", k = 2, rounds = 2)))
    val seeds = g.nodes.select(col("node"), pmod(col("node"), lit(3L)).as("label"))
    assert(sorted(Graph.labelPropagation(g, seeds, "node", "label", rounds = 2)) ===
      sorted(Graph.labelPropagation(rawEdges, "src", "dst", seeds,
        "node", "label", rounds = 2)))
    assert(sorted(Graph.modularity(g, seeds, "node", "label")) ===
      sorted(Graph.modularity(rawEdges, "src", "dst", seeds, "node", "label")))
    // pagerank lite runs over the symmetric form; raw equivalent is the
    // canonical edge set doubled
    val canon = rawEdges.select(least($"src", $"dst").as("u"),
      greatest($"src", $"dst").as("v")).filter($"u" =!= $"v").distinct()
    val de = canon.unionAll(canon.select($"v".as("u"), $"u".as("v")))
    assert(sorted(Graph.pagerank(g, iterations = 2)) ===
      sorted(Graph.pagerank(de, "u", "v", iterations = 2)))
    assert(sorted(Graph.pagerankDangling(g, iterations = 2)) ===
      sorted(Graph.pagerankDangling(canon, "u", "v", iterations = 2)))
  }

  test("cached returns one shared instance per key; build runs once") {
    var builds = 0
    def build: DataFrame = { builds += 1; rawEdges }
    val a = GraphFrameLite.cached(spark, "gfl-spec-key")(build)
    val b = GraphFrameLite.cached(spark, "gfl-spec-key")(build)
    assert(a eq b)
    assert(builds === 1)
    val c = GraphFrameLite.cached(spark, "gfl-spec-other")(build)
    assert(!(a eq c) && builds === 2)
  }

  test("cached honors the sessionCache=off sweep switch") {
    var builds = 0
    def build: DataFrame = { builds += 1; rawEdges }
    val off = spark.newSession()
    off.conf.set("spark.graft.sessionCache", "off")
    try {
      val a = GraphFrameLite.cached(off, "gfl-spec-off")(build)
      val b = GraphFrameLite.cached(off, "gfl-spec-off")(build)
      // fresh uncached instance per call — the sweep session never
      // reads (or populates) the sibling session's pinned graph
      assert(!(a eq b) && builds === 2)
      assert(GraphFrameLite.cached(spark, "gfl-spec-off") {
        builds += 1; rawEdges
      } ne b)
    } finally off.conf.unset("spark.graft.sessionCache")
  }

  test("kcore's retirement loop never unpersists the session-pinned canonical") {
    val shared = GraphFrameLite.cached(spark, "gfl-spec-pin")(rawEdges)
    val before = sorted(shared.canonical)
    // two peel runs, each retiring its superseded rounds
    Graph.kcore(shared, k = 2, rounds = 3).collect()
    Graph.kcore(shared, k = 3, rounds = 3).collect()
    // the pinned canonical must still be alive and identical
    assert(sorted(shared.canonical) === before)
    assert(sorted(shared.degrees).nonEmpty)
  }
}
