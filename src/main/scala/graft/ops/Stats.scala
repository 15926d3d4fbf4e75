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
    *
    * '''Domain contract.''' Per-row products multiply in 64-bit, so
    * the operator REQUIRES |value·scale| ≤ 3 037 000 499 (⌊√(2⁶³−1)⌋ —
    * the largest magnitude whose square fits a long; ~$30 M at cents
    * scale). The bound is enforced: the same single pass aggregates
    * max|v| per column and a violating corpus fails LOUDLY
    * (raise_error) rather than wrapping — a narrowing of the former
    * all-decimal form, which answered (slowly) at any magnitude;
    * callers needing magnitudes beyond the bound must pre-scale.
    * Known gap, shared with the SQL oracle and predating the bound: a
    * value whose decimal(18,4) cast itself overflows (|v| ≥ 10¹⁴)
    * becomes NULL before the guard, silently shrinking that column's
    * Σ while `n` still counts the row — NULL-bearing inputs and
    * ≥10¹⁴ magnitudes are outside this operator's contract (both
    * engines compute the same mismatched-n number, so the parity
    * contract still holds; StatsSpec documents the bound's
    * rationale).
    */
  def corrMatrix(df: DataFrame, cols: Seq[String], scale: Int = 100): DataFrame = {
    require(cols.size >= 2, s"need >= 2 columns: $cols")
    require(scale > 0, s"need positive scale: $scale")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    // Per-row values are LONGS (the decimal(18,4)·scale → decimal(38,0)
    // rounding is unchanged, the integral result then casts to long
    // exactly) and every per-row square/cross product multiplies in
    // 64-bit — the former decimal(38,0) per-row multiplies ran through
    // BigDecimal, ~10 heap-allocating multiplies per row on the
    // corpus's hot path. Only the SUMS accumulate as decimal(38,0):
    // the row-count factor is what passes 2⁶³ at 100 TB, the per-row
    // product never does as long as |v·scale| ≤ 3 037 000 499
    // (⌊√(2⁶³−1)⌋). That bound is data-dependent, so it is ENFORCED,
    // not assumed: the same single pass aggregates max(|v|) per column
    // and the final projection raises a loud error if any column
    // exceeds it. The guard sees what the long cast sees: a value
    // whose decimal(18,4) cast already overflowed is NULL here (and in
    // the sums) while count(1) still counts its row — the scaladoc's
    // documented contract gap, not a silent wrap of the products.
    val longSafe = 3037000499L
    val ints = cols.map(c =>
      (col(c).cast("decimal(18,4)") * scale).cast("decimal(38,0)")
        .cast("long").as(c))
    val dec = "decimal(38,0)"
    val aggs: Seq[Column] =
      Seq(count(lit(1)).cast(dec).as("n")) ++
        cols.map(c => sum(col(c).cast(dec)).as(s"s_$c")) ++
        cols.map(c => sum((col(c) * col(c)).cast(dec)).as(s"ss_$c")) ++
        pairs.map { case (a, b) =>
          sum((col(a) * col(b)).cast(dec)).as(s"sp_${a}__$b") } ++
        cols.map(c => max(abs(col(c))).as(s"mx_$c"))
    val guard = cols.map(c => coalesce(col(s"mx_$c"), lit(0L)))
      .reduce(greatest(_, _))
    def varTerm(c: String): Column =
      (col("n") * col(s"ss_$c") - col(s"s_$c") * col(s"s_$c")).cast("double")
    val pairRows = pairs.map { case (a, b) =>
      struct(lit(a).as("x"), lit(b).as("y"),
        ((col("n") * col(s"sp_${a}__$b") - col(s"s_$a") * col(s"s_$b"))
          .cast("double") / (sqrt(varTerm(a)) * sqrt(varTerm(b)))).as("corr"))
    }
    df.select(ints: _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(
        when(guard > longSafe, raise_error(concat(
            lit("corrMatrix: |scaled value| exceeds the 64-bit product " +
              "bound 3037000499: max |v| = "),
            guard.cast("string"))).cast("long"))
          .otherwise(col("n").cast("long")).as("__n"),
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
    // the rank table and the total BOTH derive from the (v, n) domain
    // (deduplicated in-plan by exchange reuse) — the former
    // rows.agg(count) total was a third full scan of the value column
    // for a number the domain already holds
    val ranks = Sweep.runningSum(dom, "__v", "__n")
      .select(col("t").as("__v"), (col("running") - col("d") + 1).as("__rank"))
    val n = dom.agg(sum(col("__n")).as("__total"))
    rows
      .join(ranks, Seq("__v"))
      .crossJoin(broadcast(n))
      .select(col(idCol), col("__v").as(valueCol),
        when(col("__total") > 1,
          expr("(1048576 * (__rank - 1)) div (__total - 1)"))
          .otherwise(lit(0L)).as("quant_q"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic between the `classA` and
    * `classB` populations of an integral `valueCol` — the drift
    * detector a feed monitor runs between yesterday's and today's
    * batch (or two sources): D = max_v |F_A(v) − F_B(v)|. Everything
    * up to the last division is EXACT: per-value counts cross-multiply
    * to `|cumA·n_B − cumB·n_A|` longs, so both engines agree on the
    * supremum and its location; ties on the max break toward the
    * smallest value (min over an argmax struct).
    *
    * One count aggregation keyed on (value), then TWO distributed
    * prefix sums over the value domain via [[Sweep.runningSum]]
    * (bucketed two-level cumulative — never a one-partition window,
    * even on an unbounded value domain) joined back on the value, and
    * a 1-row fold. The CDF cross-products accumulate as decimal(38,0)
    * (two ~4e9-row sides would push cum·n past long range — the
    * modularity rule); the emitted ks_num stays BIGINT, null-guarded
    * rather than wrapped. Output: (n_a, n_b, ks_num, ks_at_value, ks)
    * with ks = ks_num / (n_a·n_b); empty when no row carries either
    * class.
    */
  def ksStatistic(df: DataFrame, classCol: String, valueCol: String,
      classA: String, classB: String): DataFrame = {
    require(classA != classB, s"need two distinct classes: $classA")
    // no pin: the (v, ca, cb) domain subtree recurs in the sweep, its
    // in-plan bounds subqueries, and the totals — all branches of ONE
    // plan, deduplicated by exchange reuse
    val counts = df
      .filter(col(classCol).isin(classA, classB) && col(valueCol).isNotNull)
      .groupBy(col(valueCol).cast("long").as("v"))
      .agg(sum(when(col(classCol) === classA, 1L).otherwise(0L)).as("ca"),
        sum(when(col(classCol) === classB, 1L).otherwise(0L)).as("cb"))
    // ONE multi-column sweep: both cumulative series come out of the
    // same domain aggregation/window/offset pass already aligned on v
    // — the former two-sweep-plus-join form paid ~2x the exchanges
    // plus a re-alignment shuffle for the identical rows
    val cum = Sweep.runningSums(counts, "v", Seq("ca", "cb"))
      .select(col("t").as("v"), col("running_ca").as("cuma"),
        col("running_cb").as("cumb"))
    val totals = counts.agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    val dec = "decimal(38,0)"
    cum.crossJoin(broadcast(totals))
      .select(col("n_a"), col("n_b"),
        abs(col("cuma").cast(dec) * col("n_b") -
          col("cumb").cast(dec) * col("n_a")).as("d"),
        col("v"))
      .groupBy(col("n_a"), col("n_b"))
      .agg(min(struct((-col("d")).as("neg"), col("v").as("at"))).as("m"))
      .select(col("n_a"), col("n_b"),
        when(abs(col("m.neg")) <= lit(Long.MaxValue),
          (-col("m.neg")).cast("long")).as("ks_num"),
        col("m.at").as("ks_at_value"),
        when(col("n_a") > 0 && col("n_b") > 0,
          (-col("m.neg")).cast("double") /
            (col("n_a").cast("double") * col("n_b"))).as("ks"))
  }

  /** Concentration report over a categorical column — is the corpus
    * dominated by a few sources? Exact integers: with per-class counts
    * c_i and total N, the Herfindahl–Hirschman numerator Σc_i² and the
    * top share c_max/N are emitted as (numerator, N, doubles). HHI =
    * Σc_i²/N² ∈ (1/k, 1]; 1/HHI is the "effective source count" a
    * mixture designer tracks. One count aggregation (keyed on the
    * class domain) + a 1-row fold; Σc_i² accumulates as decimal(38,0)
    * (c_i ≤ N ≈ corpus rows — the square passes long range at ~3e9).
    *
    * Output: (n_classes, n_rows, sum_sq_num, top_class, top_count,
    * hhi, effective_classes, top_share).
    */
  def concentration(df: DataFrame, classCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    df.filter(col(classCol).isNotNull)
      .groupBy(col(classCol).cast("string").as("cls"))
      .agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_classes"), sum(col("c")).as("n_rows"),
        sum(col("c").cast(dec) * col("c")).as("__ss"),
        // argmax with ties to the LEX-SMALLEST class: one min over a
        // (−count, class) struct, no sort
        min(struct((-col("c")).as("nc"), col("cls").as("cls"))).as("__mn"))
      .select(col("n_classes"), col("n_rows"),
        when(abs(col("__ss")) <= lit(Long.MaxValue),
          col("__ss").cast("long")).as("sum_sq_num"),
        col("__mn.cls").as("top_class"), (-col("__mn.nc")).as("top_count"),
        when(col("n_rows") > 0, col("__ss").cast("double") /
          (col("n_rows").cast("double") * col("n_rows"))).as("hhi"),
        when(col("__ss") > 0,
          (col("n_rows").cast("double") * col("n_rows")) /
            col("__ss").cast("double")).as("effective_classes"),
        when(col("n_rows") > 0, (-col("__mn.nc")).cast("double") /
          col("n_rows").cast("double")).as("top_share"))
  }
}
