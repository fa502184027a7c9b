package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Offline changepoint detection — "when did this series change
  * level?", the drift-localization question a corpus/traffic monitor
  * asks after a drift ALARM (profileDrift, anomalyFlags) fires. Exact
  * two-segment split: for every cut position t in a key's
  * daily series, the between-segment sum-of-squares
  *
  *   J(t) = (L_t·n − t·S)² / (t·(n−t))
  *
  * (L_t = prefix sum, S = total, n = series length; the variance-
  * reduction objective of binary segmentation / Otsu thresholding on
  * the time axis). The argmax is the maximum-likelihood single
  * changepoint under a constant-mean-per-segment model.
  *
  * Determinism: everything up to J is exact integer/decimal; J itself
  * is emitted as obj_scaled = (num² · 10³) div (t·(n−t)) — ONE
  * integral division, so the ranking (and its day tiebreak) is a pure
  * integer function any engine replays. Bounds (the Collocations
  * documented-bound pattern): the DECIMAL(38) intermediates hold to
  * num ≤ ~10¹⁷, but obj_scaled itself must fit BIGINT — J·10³ ≤
  * 9·10¹⁸, i.e. S·√n ≲ 10⁸ at daily grain (e.g. 10⁶ rows/day over
  * 10⁴ days). Beyond that, pre-aggregate to coarser grain or
  * pre-scale the values.
  *
  * Scale shape: one day-grain aggregate (partial combine), one
  * bounded per-key prefix window (rows = days per key, never corpus
  * rows), one per-key argmax window over the same frame.
  */
object Changepoint {

  /** Per key: the best split day, its scaled objective, and the two
    * segment means (×1000, integral) — (key, n_days, split_day,
    * obj_scaled, mean_before_milli, mean_after_milli).
    */
  def bestSplit(df: DataFrame, keyCol: Column, dayCol: Column,
      value: Column): DataFrame =
    bestSplitFromDaily(
      df.groupBy(keyCol.as("__k"), dayCol.as("__d")).agg(value.as("__v")))

  /** The objective fold over an ALREADY-aggregated (__k, __d, __v)
    * daily frame — the entry point for continuously-maintained counts
    * (the streaming twin keeps the day-grain counts as aggregation
    * state, the keySkewAuditFromCounts pattern).
    */
  def bestSplitFromDaily(daily: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val wPre = Window.partitionBy(col("__k")).orderBy(col("__d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("__k"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val scored = daily
      .withColumn("__t", count(lit(1)).over(wPre))
      .withColumn("__L", sum(col("__v")).over(wPre).cast(dec))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__S", sum(col("__v")).over(wAll).cast(dec))
      .where(col("__t") < col("__n")) // a cut needs a non-empty right side
      .withColumn("__num",
        col("__L") * col("__n").cast(dec) - col("__t").cast(dec) * col("__S"))
      .withColumn("obj_scaled",
        expr("(__num * __num * 1000) div " +
          "(cast(__t as decimal(38,0)) * cast(__n - __t as decimal(38,0)))"))
    val wBest = Window.partitionBy(col("__k"))
      .orderBy(col("obj_scaled").desc, col("__d"))
    scored.withColumn("__rn", row_number().over(wBest))
      .where(col("__rn") === 1)
      .select(col("__k").as("key"), col("__n").as("n_days"),
        col("__d").as("split_day"), col("obj_scaled"),
        expr("(__L * 1000) div cast(__t as decimal(38,0))")
          .as("mean_before_milli"),
        expr("((__S - __L) * 1000) div cast(__n - __t as decimal(38,0))")
          .as("mean_after_milli"))
  }

  /** CUSUM drift monitor over dense daily counts — the SEQUENTIAL
    * complement of bestSplit: instead of locating one historical
    * level shift, it answers "on which day would a control chart have
    * ALARMED", the page a traffic monitor actually serves. Classic
    * one-sided CUSUM in both directions:
    *
    *   S⁺_t = max(0, S⁺_{t−1} + (c_t − μ̂ − slack))
    *
    * with μ̂ = the mean of each key's first `refDays` days. The
    * recursive max(0,·) fold is made RELATIONAL by the drawup
    * identity S⁺_t = P_t − min_{j≤t} P_j (P = prefix sum of the
    * slack-adjusted deviations) — two windows per direction, no
    * iterative state. All terms are scaled integers (deviations
    * ×(ref_n·10⁶) so slack_ppm and h_ppm — both in units of μ̂ —
    * stay integral; prefix sums in DECIMAL(38)), so alarm days replay
    * exactly on any engine.
    *
    * Output per key: `(key, n_days, ref_n, ref_sum, up_alarm_day,
    * down_alarm_day)` — alarm days null when the chart never trips.
    */
  def cusumFromDaily(daily: DataFrame, keyOut: String, refDays: Int,
      slackPpm: Long, hPpm: Long): DataFrame = {
    require(refDays >= 1 && slackPpm >= 0 && hPpm > 0)
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val grid = Forecast.denseGrid(daily)
    val wPre = Window.partitionBy(col("k")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val withRef = grid
      .withColumn("__t", count(lit(1)).over(
        Window.partitionBy(col("k")).orderBy(col("day"))))
      .withColumn("__ref_sum",
        sum(when(col("__t") <= refDays, col("c"))).over(wAll))
      .withColumn("__ref_n",
        sum(when(col("__t") <= refDays, 1L).otherwise(0L)).over(wAll))
    // raw deviation scaled by ref_n·1e6: 1e6·(c·ref_n − ref_sum); the
    // slack term SUBTRACTS in BOTH chart directions — up charts
    // (c − μ̂ − slack), down charts (μ̂ − c − slack). Negating the
    // already-slacked up deviation would ADD slack to the down chart
    // and guarantee a spurious down alarm on an in-control series
    // after ~hPpm/slackPpm chart days.
    val scored = withRef
      .where(col("__t") > refDays) // the chart runs AFTER the reference
      .withColumn("__raw",
        lit(1000000L).cast(dec) *
          (col("c").cast(dec) * col("__ref_n") - col("__ref_sum")))
      .withColumn("__slk", lit(slackPpm).cast(dec) * col("__ref_sum"))
      .withColumn("__dev", col("__raw") - col("__slk"))
      .withColumn("__devd", col("__raw") * -1 - col("__slk"))
      // P_0 = 0 enters the running min (the chart starts at S = 0)
      .withColumn("__p", sum(col("__dev")).over(wPre))
      .withColumn("__sup", col("__p") -
        least(lit(0).cast(dec), min(col("__p")).over(wPre)))
      .withColumn("__pd", sum(col("__devd")).over(wPre))
      .withColumn("__sdn", col("__pd") -
        least(lit(0).cast(dec), min(col("__pd")).over(wPre)))
      .withColumn("__h", lit(hPpm).cast(dec) * col("__ref_sum"))
    scored.groupBy(col("k").as(keyOut))
      .agg(count(lit(1)).as("n_days"),
        min(col("__ref_n")).as("ref_n"),
        min(col("__ref_sum")).as("ref_sum"),
        // alarm days ship as ISO strings: a nullable DATE hashes
        // differently across harness dataframe libraries (None vs NaT)
        date_format(min(when(col("__sup") > col("__h"), col("day"))),
          "yyyy-MM-dd").as("up_alarm_day"),
        date_format(min(when(col("__sdn") > col("__h"), col("day"))),
          "yyyy-MM-dd").as("down_alarm_day"))
  }

  /** [[cusumFromDaily]] over an event log. */
  def cusumDrift(events: DataFrame, keyCol: String, tsCol: String,
      refDays: Int = 7, slackPpm: Long = 100000L,
      hPpm: Long = 2000000L): DataFrame =
    cusumFromDaily(
      events.groupBy(col(keyCol).as("k"), to_date(col(tsCol)).as("day"))
        .agg(count(lit(1)).as("c")),
      keyCol, refDays, slackPpm, hPpm)
}
