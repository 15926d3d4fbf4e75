package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Per-series time-series diagnostics over (series, t, value)
  * rows — the monitoring layer of a feed pipeline: is a source's daily
  * volume periodic (autocorrelation), and did its level shift
  * (CUSUM changepoint)? Both exact-integer inside, double only in the
  * final division, so Spark and an unrolled SQL oracle agree bit-wise.
  *
  * Both operators assume the per-series POINT COUNT is domain-bounded
  * (days, hours — the q70/q99 calendar-spine regime), while the series
  * count is unbounded: every shuffle keys on the series, and no window
  * partition ever exceeds one series' point domain.
  */
object TimeSeries {

  /** Lag-k autocorrelation per series: the Pearson correlation of
    * (x_t, x_{t+lag}) over points where both exist, as an EQUI-join of
    * the series on (series, t+lag) — no window, no spine fill; gaps
    * simply contribute no pair (the "available case" convention).
    * Duplicate (series, t) rows are summed first (the cusumChangepoint
    * convention) — without that, duplicates cross-multiply in the lag
    * equi-join and silently corrupt the ACF. The five moment sums
    * accumulate as decimal(38,0) (the assortativity/corrMatrix rule)
    * so both engines divide identical integers.
    *
    * Output: (series, n_pairs, acf) — acf null when either side of a
    * series' pair set has zero variance or fewer than 3 pairs.
    */
  def autocorrelation(points: DataFrame, seriesCol: String, tCol: String,
      vCol: String, lag: Int): DataFrame = {
    require(lag >= 1, s"need lag >= 1: $lag")
    val dec = "decimal(38,0)"
    val p = points.select(col(seriesCol).as("series"),
        col(tCol).cast("long").as("t"), col(vCol).cast("long").as("x"))
      .groupBy(col("series"), col("t")).agg(sum(col("x")).as("x"))
    val pairs = p.as("l")
      .join(p.as("r"),
        col("l.series") === col("r.series") && col("r.t") === col("l.t") + lag)
      .select(col("l.series").as("series"),
        col("l.x").as("x"), col("r.x").as("y"))
    val m = pairs.groupBy(col("series")).agg(
      count(lit(1)).as("n_pairs"),
      sum(col("x").cast(dec)).as("sx"),
      sum(col("y").cast(dec)).as("sy"),
      sum(col("x").cast(dec) * col("y")).as("sxy"),
      sum(col("x").cast(dec) * col("x")).as("sxx"),
      sum(col("y").cast(dec) * col("y")).as("syy"))
    m.select(col("series"), col("n_pairs"),
      when(col("n_pairs") >= 3 &&
          col("n_pairs") * col("sxx") > col("sx") * col("sx") &&
          col("n_pairs") * col("syy") > col("sy") * col("sy"),
        (col("n_pairs") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n_pairs") * col("sxx") - col("sx") * col("sx")).cast("double")) *
            sqrt((col("n_pairs") * col("syy") - col("sy") * col("sy")).cast("double"))))
        .as("acf"))
  }

  /** Index of dispersion (Fano factor) per series: sample variance
    * over mean of the point values — the burstiness scalar (1 ≈
    * Poisson-like arrivals, ≫ 1 bursty, ≪ 1 metronomic) a feed
    * monitor tracks next to the q171/q172/q177 battery. With
    * decimal(38,0) moment sums, F = (n·Σx² − (Σx)²) / ((n−1)·Σx) —
    * both engines divide identical integers; one aggregation total.
    *
    * Output: (series, n_points, fano) — fano null when n < 2 or the
    * mean is not positive (counts: Σx = 0 means an empty series).
    */
  def dispersion(points: DataFrame, seriesCol: String, vCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    points.select(col(seriesCol).as("series"), col(vCol).cast("long").as("x"))
      .filter(col("x").isNotNull)
      .groupBy(col("series"))
      .agg(count(lit(1)).as("n_points"),
        sum(col("x").cast(dec)).as("sx"),
        sum(col("x").cast(dec) * col("x")).as("sxx"))
      .select(col("series"), col("n_points"),
        when(col("n_points") >= 2 && col("sx") > 0,
          (col("n_points") * col("sxx") - col("sx") * col("sx")).cast("double") /
            ((col("n_points") - 1) * col("sx")).cast("double")).as("fano"))
  }

  /** Theil–Sen robust trend per series: the MEDIAN of all pairwise
    * slopes (y₂−y₁)/(t₂−t₁) over t₁<t₂ — the estimator a single
    * outlier day cannot drag, where q82's least-squares slope can
    * (Theil 1950 / Sen 1968, public method). Slopes quantize to
    * ⌊2²⁰·Δy/Δt⌋ via one IEEE double divide+floor (identical on both
    * engines), and the median is the exact lower median over the
    * (series, slope) DOMAIN — the q134 aggregation shape, windows
    * bounded by slope-domain cardinality.
    *
    * Pair volume is C(points, 2) per series — domain-bounded by the
    * class contract (days²; ~66k pairs for a year of days), generated
    * by a self-equi-join on the series key.
    *
    * Output: (series, n_pairs, slope_q_med); series with < 2 points
    * produce no pairs and are absent.
    */
  def theilSenSlope(points: DataFrame, seriesCol: String, tCol: String,
      vCol: String): DataFrame = {
    val p = points.select(col(seriesCol).as("series"),
      col(tCol).cast("long").as("t"), col(vCol).cast("long").as("x"))
    val slopes = p.as("l")
      .join(p.as("r"),
        col("l.series") === col("r.series") && col("r.t") > col("l.t"))
      .select(col("l.series").as("series"),
        floor((col("r.x") - col("l.x")).cast("double") * (1L << 20) /
          (col("r.t") - col("l.t")).cast("double")).cast("long").as("s"))
    val dom = slopes.groupBy(col("series"), col("s"))
      .agg(count(lit(1)).as("n"))
    val cumW = Window.partitionBy(col("series")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = Window.partitionBy(col("series"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    dom
      .withColumn("cum", sum(col("n")).over(cumW))
      .withColumn("tot", sum(col("n")).over(totW))
      .groupBy(col("series"))
      .agg(max(col("tot")).as("n_pairs"),
        min(when(col("cum") * 2 >= col("tot"), col("s"))).as("slope_q_med"))
  }

  /** CUSUM changepoint per series: with n points and total T, the
    * deviation at t is `n·x_t − T` (the mean-centered value cross-
    * multiplied by n so it stays integer), and the cumulative sum
    * S_t = Σ_{u ≤ t} (n·x_u − T) telescopes to zero at the last point;
    * the t maximizing |S_t| is the classic single-changepoint estimate
    * (Page 1954, public method). Everything is a long; the argmax is
    * one `max(struct(|S|, −t))` — deterministic, no second pass.
    *
    * The prefix sum runs as a window partitioned BY SERIES ordered by
    * t — bounded by the point domain per the class contract above (an
    * unbounded single series would call [[Sweep.runningSum]] instead).
    *
    * Output: (series, n_points, cp_t, max_abs_cusum_xn) — cp_t the
    * earliest argmax point, max_abs_cusum_xn = max |S_t| (in value×n
    * units; divide by n for the mean-deviation scale). Series with
    * fewer than 2 points report a null cp_t.
    */
  def cusumChangepoint(points: DataFrame, seriesCol: String, tCol: String,
      vCol: String): DataFrame = {
    val p = points.select(col(seriesCol).as("series"),
        col(tCol).cast("long").as("t"), col(vCol).cast("long").as("x"))
      .groupBy(col("series"), col("t")).agg(sum(col("x")).as("x"))
    val totals = p.groupBy(col("series"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("total"))
    val w = Window.partitionBy(col("series")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p.join(totals, Seq("series"))
      .withColumn("s", sum(col("n") * col("x") - col("total")).over(w))
      .groupBy(col("series"))
      .agg(max(col("n")).as("n_points"),
        max(struct(abs(col("s")).as("a"), (-col("t")).as("nt"))).as("m"))
      .select(col("series"), col("n_points"),
        when(col("n_points") >= 2, -col("m.nt")).as("cp_t"),
        when(col("n_points") >= 2, col("m.a")).as("max_abs_cusum_xn"))
  }

  /** Seasonal-naive FORECAST EVALUATION (MASE — mean absolute scaled
    * error) per series: how much better the season-lag forecast
    * `ŷ_t = y_{t−season}` is than the one-step naive baseline, as
    * `mase_ppm = ⌊10⁶ · (Σ|y_t−y_{t−season}|/n_season)
    *                  / (Σ|y_t−y_{t−1}|/n_one)⌋`
    * — exact integers end to end (counts, absolute differences, one
    * decimal(38,0) cross-multiplied division; < 10⁶ means the
    * seasonal forecast beats the naive scale — seasonality is real).
    * The forecast-eval gate a pipeline runs before trusting a
    * seasonal model or a seasonality-aware sampler.
    *
    * Defined over OBSERVED-point pairs: t pairs with t−lag when both
    * exist (two self-EQUI-joins on (series, t−lag) — never a range
    * join; per-series domains are the day domain, so both joins and
    * the #series-row report are exchange-light at any corpus size).
    * A constant series (zero naive scale) gets a NULL verdict, not a
    * division crash.
    */
  def seasonalNaiveMase(df: org.apache.spark.sql.DataFrame,
      seriesCol: String, tCol: String, valueCol: String,
      season: Int = 7): org.apache.spark.sql.DataFrame = {
    require(season >= 2, s"season below 2 IS the naive baseline: $season")
    val d = df.select(col(seriesCol).as("series"),
      col(tCol).cast("long").as("t"), col(valueCol).cast("long").as("x"))
    def lagged(lag: Int, sName: String, nName: String) =
      d.as("a").join(d.as("b"),
          col("a.series") === col("b.series") &&
            col("b.t") === col("a.t") - lag)
        .groupBy(col("a.series").as("series"))
        .agg(sum(abs(col("a.x") - col("b.x"))).as(sName),
          count(lit(1)).as(nName))
    lagged(season, "s_season", "n_season")
      .join(lagged(1, "s_one", "n_one"), Seq("series"))
      .select(col("series"), col("n_season"), col("n_one"),
        when(col("s_one") > 0L && col("n_season") > 0L,
          expr("CAST(CAST(s_season AS DECIMAL(38,0)) * 1000000 * n_one " +
            "DIV (CAST(s_one AS DECIMAL(38,0)) * n_season) AS BIGINT)"))
          .as("mase_ppm"))
  }
}
