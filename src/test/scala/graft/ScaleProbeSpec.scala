package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The scale probe's replication must preserve exactly what makes the
  * 10× measurement honest: per-replica key/value distributions equal
  * to the source, referential integrity within a replica, and salted
  * text that keeps in-replica duplicate structure while never
  * cross-matching between replicas (un-salted replication would make
  * every doc a 10-way near-duplicate — quadratic OUTPUT blowup that
  * probes the data, not the plans).
  */
class ScaleProbeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("replicate: counts scale, keys land in disjoint ranges, join " +
      "fanout is preserved per replica") {
    val orders = Seq((1L, 10L), (2L, 10L), (3L, 11L))
      .toDF("o_orderkey", "o_custkey")
    val lines = Seq((1L, 100L), (1L, 101L), (2L, 100L), (3L, 102L))
      .toDF("l_orderkey", "l_partkey")
    val k = 3
    // owning-dim offsets, as synthesize computes them
    val ordOff = 4L; val custOff = 12L; val partOff = 103L
    val ordersK = ScaleProbe.replicate(orders, k,
      Map("o_orderkey" -> ordOff, "o_custkey" -> custOff))
    val linesK = ScaleProbe.replicate(lines, k,
      Map("l_orderkey" -> ordOff, "l_partkey" -> partOff))
    assert(ordersK.count() === orders.count() * k)
    assert(linesK.count() === lines.count() * k)
    // keys are globally unique across replicas (disjoint offset ranges)
    assert(ordersK.select("o_orderkey").distinct().count() === 3L * k)
    // the join fans out exactly k× — every line still finds exactly
    // its replica's order (referential integrity per replica)
    val joined = linesK.join(ordersK, linesK("l_orderkey") === ordersK("o_orderkey"))
    assert(joined.count() === lines.count() * k)
    // per-replica distribution identical to the source: group sizes of
    // lines-per-order are {2,1,1} in every replica
    val sizes = linesK.groupBy(col("l_orderkey")).count()
      .groupBy(col("count")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes === Map(2L -> 1L * k, 1L -> 2L * k))
  }

  test("replicate: salted text keeps in-replica duplicate structure and " +
      "never matches across replicas; replica 0 is verbatim") {
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "delta epsilon zeta")).toDF("doc_id", "text")
    val k = 3; val docOff = 4L
    val out = ScaleProbe.replicate(docs, k, Map("doc_id" -> docOff),
      saltTokens = Seq("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.length === 9)
    def replicaOf(id: Long) = (id - 1) / docOff // ids 1..3, offset 4
    val byReplica = out.groupBy(t => replicaOf(t._1))
      .view.mapValues(_.map(_._2).toSeq).toMap
    // replica 0 verbatim
    assert(byReplica(0L).sorted === Seq("alpha beta gamma",
      "alpha beta gamma", "delta epsilon zeta"))
    // within every replica: same duplicate structure (2 equal + 1)
    byReplica.values.foreach { texts =>
      assert(texts.groupBy(identity).values.map(_.size).toSeq.sorted === Seq(1, 2))
    }
    // across replicas: zero shared texts AND zero shared tokens (so
    // shingle/minhash/span structures cannot cross-match either)
    val tokensByReplica = byReplica.view.mapValues(
      _.flatMap(_.split(" ")).toSet).toMap
    for (i <- 0L until k.toLong; j <- 0L until k.toLong if i < j) {
      assert(tokensByReplica(i).intersect(tokensByReplica(j)).isEmpty,
        s"replicas $i and $j share tokens")
    }
  }

  test("replicate: schema (names, types, order) is unchanged, including " +
      "offset integer keys") {
    val df = Seq((1, 2L, "x", 0.5)).toDF("ik", "lk", "s", "d")
    val out = ScaleProbe.replicate(df, 2, Map("ik" -> 10L, "lk" -> 100L))
    assert(out.schema === df.schema,
      "offset keys must cast back to their source types")
    val rows = out.collect().map(r => (r.getInt(0), r.getLong(1))).sorted
    assert(rows === Array((1, 2L), (11, 102L)))
  }
}
