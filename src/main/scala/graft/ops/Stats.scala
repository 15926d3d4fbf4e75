package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] One-pass exact-moment statistics over measure columns.
  *
  * Scale shape: ALL moment sums (per-column sum, sum-of-squares, and
  * every pairwise cross product) ride ONE aggregation over ONE scan —
  * map-side partials reduce to a single row, so the only exchange is
  * the final 1-row merge; the pair melt then expands that row
  * map-side. Nothing here grows with row count except the scan.
  *
  * Determinism: raw doubles are scaled to integers
  * (`decimal(18,4) · scale → decimal(38,0)`) BEFORE summing, so every
  * sum is an exact integer, order-independent under any partitioning —
  * the q82/q100/q135 integer-mass rule. Doubles enter only at the
  * final `corr` expression (cast, sqrt, divide), an identical
  * expression tree on both engines.
  */
object Stats {

  /** Pearson correlation matrix of `cols` (upper triangle, x < y in
    * the given order): (x, y, n, corr).
    *
    * corr = (n·Σxy − Σx·Σy) / (√(n·Σx² − (Σx)²) · √(n·Σy² − (Σy)²)),
    * every Σ an exact scaled-integer sum. Degenerate (zero-variance)
    * columns yield NULL (0/0), identically on both engines.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String], scale: Int = 100): DataFrame = {
    require(cols.size >= 2, s"need >= 2 columns: $cols")
    require(scale > 0, s"need positive scale: $scale")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val ints = cols.map(c =>
      (col(c).cast("decimal(18,4)") * scale).cast("decimal(38,0)").as(c))
    val aggs: Seq[Column] =
      Seq(count(lit(1)).cast("decimal(38,0)").as("n")) ++
        cols.map(c => sum(col(c)).as(s"s_$c")) ++
        cols.map(c => sum(col(c) * col(c)).as(s"ss_$c")) ++
        pairs.map { case (a, b) => sum(col(a) * col(b)).as(s"sp_${a}__$b") }
    def varTerm(c: String): Column =
      (col("n") * col(s"ss_$c") - col(s"s_$c") * col(s"s_$c")).cast("double")
    val pairRows = pairs.map { case (a, b) =>
      struct(lit(a).as("x"), lit(b).as("y"),
        ((col("n") * col(s"sp_${a}__$b") - col(s"s_$a") * col(s"s_$b"))
          .cast("double") / (sqrt(varTerm(a)) * sqrt(varTerm(b)))).as("corr"))
    }
    df.select(ints: _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(col("n").cast("long").as("__n"),
        explode(array(pairRows: _*)).as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"),
        col("__n").as("n"), col("p.corr").as("corr"))
  }

  /** Quantile (rank) normalization — the heavy-tail-proof feature
    * transform (map each value to its empirical quantile; the
    * "rank-gauss" prep minus the gaussian tail): quantile_q =
    * ⌊2²⁰·(rank−1)/(N−1)⌋ with rank = MIN-rank (ties share the rank of
    * their first position — SQL `rank()` semantics), so the transform
    * is exact integer end-to-end and identical on any engine.
    *
    * Distributed shape: ranks come from the [[Sweep.runningSum]]
    * prefix over the VALUE DOMAIN (two small shuffles — never a
    * corpus-wide single-partition `rank()` window); rows join their
    * rank back on the value key (pre-reduced, uniform), and N is a
    * 1-row broadcast. The q137/q144 rank-decomposition pattern applied
    * to feature scaling.
    *
    * Output: input row id + value + `quant_q` ∈ [0, 2²⁰]. Degenerate
    * single-distinct-value inputs map to 0 (the N−1 = 0 guard).
    */
  def quantileNormalize(df: DataFrame, idCol: String,
      valueCol: String): DataFrame = {
    val rows = df.select(col(idCol), col(valueCol).cast("long").as("__v"))
      .filter(col("__v").isNotNull)
    val dom = rows.groupBy(col("__v")).agg(count(lit(1)).as("__n"))
    val ranks = Sweep.runningSum(dom, "__v", "__n")
      .select(col("t").as("__v"), (col("running") - col("d") + 1).as("__rank"))
    val n = rows.agg(count(lit(1)).as("__total"))
    rows
      .join(ranks, Seq("__v"))
      .crossJoin(broadcast(n))
      .select(col(idCol), col("__v").as(valueCol),
        when(col("__total") > 1,
          expr("(1048576 * (__rank - 1)) div (__total - 1)"))
          .otherwise(lit(0L)).as("quant_q"))
  }
}
