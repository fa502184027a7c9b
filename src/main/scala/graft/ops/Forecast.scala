package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Forecast-baseline scoring for per-key daily series — the monitoring
  * primitive that tells a pipeline whether tomorrow's volume is
  * predictable from last week's (and therefore whether an alerting
  * threshold derived from seasonality is trustworthy).
  *
  * MASE (mean absolute scaled error) of the seasonal-naive forecast
  * `ŷ_d = y_{d-season}` against the naive forecast `ŷ_d = y_{d-1}`:
  *
  *   mase = (Σ|y_d − y_{d−s}| / n_s) / (Σ|y_d − y_{d−1}| / n_1)
  *
  * < 1e6 ppm means week-ago beats yesterday as a predictor — the
  * series is seasonal; ≥ 1e6 ppm means it is not.
  *
  * Scale shape: ONE partial-agg shuffle builds the (key, day) counts;
  * the dense day grid is a map-side `sequence` explode off a two-value
  * global aggregate (gap days must exist as zeros or the lag-7 pairs
  * silently skip them); the lag windows then run per key over
  * day-grain series — thousands of rows per key per decade, bounded by
  * retention, never by corpus size. All counts are BIGINTs; the final
  * score is ONE integral division (cross-multiplied means), so the
  * result is engine-exact with ~9.2e18 headroom (|err| sums are
  * bounded by total event count).
  */
object Forecast {

  /** Per-key MASE table: `(key, n_days, seasonal_abs_err,
    * naive_abs_err, mase_ppm)`. `mase_ppm` is null when the naive
    * denominator is zero (a constant series admits no scaling).
    */
  def seasonalNaiveMase(events: DataFrame, keyCol: String, tsCol: String,
      season: Int = 7): DataFrame =
    maseFromDaily(
      events.groupBy(col(keyCol).as("k"), to_date(col(tsCol)).as("day"))
        .agg(count(lit(1)).as("c")),
      keyCol, season)

  /** The scoring fold over an ALREADY-aggregated (k, day, c) daily
    * frame — the entry point for continuously-maintained counts (the
    * streaming twin keeps day-grain counts as aggregation state, the
    * bestSplitFromDaily pattern).
    */
  /** Dense (k, day, c) grid over the GLOBAL day span — gap days exist
    * as zeros, so lag-k pairs never silently skip them. The spine is
    * a map-side sequence off a two-value aggregate (Resample shape).
    */
  private[ops] def denseGrid(daily: DataFrame): DataFrame = {
    val bounds = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    val spine = bounds.select(
      explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 DAY")))
        .as("day"))
    daily.select(col("k")).distinct().crossJoin(spine)
      .join(daily, Seq("k", "day"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
  }

  def maseFromDaily(daily: DataFrame, keyOut: String,
      season: Int = 7): DataFrame = {
    require(season >= 2, s"season must be >= 2, got $season")
    val grid = denseGrid(daily)
    val w = Window.partitionBy(col("k")).orderBy(col("day"))
    val scored = grid
      .withColumn("c1", lag(col("c"), 1).over(w))
      .withColumn("cs", lag(col("c"), season).over(w))
    scored.groupBy(col("k").as(keyOut))
      .agg(
        count(lit(1)).as("n_days"),
        sum(when(col("cs").isNotNull, abs(col("c") - col("cs"))))
          .as("seasonal_abs_err"),
        count(col("cs")).as("n_seasonal"),
        sum(when(col("c1").isNotNull, abs(col("c") - col("c1"))))
          .as("naive_abs_err"),
        count(col("c1")).as("n_naive"))
      .withColumn("mase_ppm",
        // decimal(38) multiply: err_sum · n · 1e6 overflows LONG once
        // the corpus passes ~9.2e6 events per day-count unit — the
        // Profiling/Gini bound, applied here; div returns BIGINT
        when(col("naive_abs_err") > 0 && col("n_seasonal") > 0,
          expr("(cast(seasonal_abs_err as decimal(38,0)) * n_naive " +
            "* 1000000) div (n_seasonal * naive_abs_err)")))
      .drop("n_seasonal", "n_naive")
  }

  /** Theil–Sen trend per key over the dense daily series: the MEDIAN
    * of all pairwise day-count slopes — the robust level-trend
    * estimator (a breakdown point of ~29%: a burst of bot days can't
    * drag it the way it drags an OLS slope). Slopes are quantized to
    * ×10⁶ via one integral division per pair ((c₂−c₁)·10⁶ div Δdays —
    * the Changepoint replay rule), and the median is lower/type-1 over
    * that integer multiset, so the whole statistic is engine-exact.
    *
    * Scale shape: day-grain aggregate first; the pair self-join and
    * the rank window run per key over the CALENDAR-bounded dense
    * series (n_days² pairs per key — a decade of days is ~6.7M pairs,
    * a per-key constant independent of corpus size).
    *
    * Output: `(key, n_days, n_pairs, slope_x1e6)`.
    */
  def theilSenDailyTrend(events: DataFrame, keyCol: String,
      tsCol: String): DataFrame =
    theilSenFromDaily(
      events.groupBy(col(keyCol).as("k"), to_date(col(tsCol)).as("day"))
        .agg(count(lit(1)).as("c")),
      keyCol)

  /** The slope fold over an ALREADY-aggregated (k, day, c) daily frame
    * — the streaming-snapshot entry point (the maseFromDaily pattern).
    */
  def theilSenFromDaily(daily: DataFrame, keyOut: String): DataFrame = {
    val keyCol = keyOut
    val grid = denseGrid(daily)
    val pairs = grid.select(col("k"), col("day").as("d1"), col("c").as("c1"))
      .join(grid.select(col("k"), col("day").as("d2"), col("c").as("c2")),
        Seq("k"))
      .where(col("d1") < col("d2"))
      .withColumn("slope_q",
        expr("(cast(c2 - c1 as decimal(38,0)) * 1000000) " +
          "div datediff(d2, d1)"))
    val w = Window.partitionBy(col("k"))
    val ranked = pairs
      .withColumn("__rn", row_number().over(
        w.orderBy(col("slope_q"), col("d1"), col("d2"))))
      .withColumn("__np", count(lit(1)).over(w))
    ranked.where(col("__rn") * 2 === col("__np") ||
        col("__rn") * 2 === col("__np") + 1) // lower median: ceil(np/2)
      .groupBy(col("k").as(keyCol))
      .agg(min(col("__np")).as("n_pairs"), min(col("slope_q")).as("slope_x1e6"))
      .join(grid.groupBy(col("k").as(keyCol))
        .agg(count(lit(1)).as("n_days")), Seq(keyCol))
      .select(col(keyCol), col("n_days"), col("n_pairs"), col("slope_x1e6"))
  }
}
