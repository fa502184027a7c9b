package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hour-of-day pivot: (timestamp, keys…) → one row per (date, keys…) with
  * 24 count columns `hour_0..hour_23`, optionally dropping rows whose
  * total count is below a threshold.
  *
  * This is the reference engine's core computation
  * (/root/reference/pivot_and_boostrap/pivot_utils.py:179-208 pivot,
  * :211-224 min-rides filter; pivot_all_files.py:126-162 per-batch
  * aggregation), re-expressed as a single Catalyst plan:
  *
  *  - Instead of pandas `pivot_table` (or Spark's `pivot()`, which either
  *    needs a distinct-scan or an explicit value list and is unsupported
  *    on streams), we emit 24 `sum(when(hour === h, 1))` aggregate
  *    expressions in ONE hash aggregate. Spark runs it as partial
  *    (map-side) + final aggregation — one shuffle keyed on the group
  *    columns, network ∝ groups × 24 longs, never rows. The reference's
  *    three-level agg (per-batch groupby → per-file merge → global merge)
  *    collapses into this single operator.
  *  - All 24 columns always exist (the reference pads missing hours,
  *    pivot_utils.py:204-206) and empty input yields the canonical empty
  *    schema for free.
  *  - The min-total filter (HAVING Σ hour_h ≥ minTotal) runs on the
  *    aggregated side — group counts, not input rows — so it costs
  *    nothing extra at scale.
  *
  * At 100 TB: the only shuffle is on (date, keys), whose cardinality is
  * tiny relative to input (days × key domain); partial aggregation makes
  * this map-side-bound, and AQE coalesces the handful of result
  * partitions.
  */
object HourPivot {
  val hourCols: Seq[String] = (0 until 24).map(h => s"hour_$h")

  def pivot(df: DataFrame, tsCol: Column, keys: Seq[String],
      minTotal: Option[Long] = None,
      dateColName: String = "event_date"): DataFrame = {
    val base = df.select(
      (to_date(tsCol).as(dateColName) +: hour(tsCol).as("__hour") +:
        keys.map(col)): _*)
    val aggs = (0 until 24).map(h =>
      sum(when(col("__hour") === h, 1L).otherwise(0L)).as(s"hour_$h"))
    val grouped = base
      .groupBy((col(dateColName) +: keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
    minTotal match {
      case Some(t) =>
        grouped.where(hourCols.map(col).reduce(_ + _) >= t)
      case None => grouped
    }
  }

  /** The pivot's inverse — melt the 24 wide hour columns back to long
    * (keys..., hour, n) rows, dropping empty cells. `stack` is a pure
    * map-side generator (one input row → ≤24 output rows, no shuffle),
    * so un-pivoting a wide table back into a relational long form for
    * downstream joins/windows costs one scan. Round-trip law (tested):
    * unpivot(pivot(events)) equals the plain (date, keys, hour)
    * group-count — which is exactly the declared oracle.
    */
  def unpivot(wide: DataFrame, keys: Seq[String],
      dateColName: String = "event_date"): DataFrame = {
    val pairs = (0 until 24).map(h => s"$h, hour_$h").mkString(", ")
    wide.select(
      (dateColName +: keys).map(col) :+
        expr(s"stack(24, $pairs)").as(Seq("hour", "n")): _*)
      .where(col("n") > 0)
  }
}
