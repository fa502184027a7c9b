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
}
