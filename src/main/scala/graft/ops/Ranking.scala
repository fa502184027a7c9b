package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable EXACT global ranking — `row_number() OVER (ORDER BY …)`
  * without the single-partition window that formulation costs.
  *
  * Shape (the shuffledIndex / sequence-packing two-level prefix sum,
  * generalized to an arbitrary sort key):
  *  1. `repartitionByRange` on the sort key — ordered ranges across
  *     partitions, each ~uniform (sampled boundaries);
  *  2. the ranged frame is materialized ONCE (localCheckpoint) so the
  *     offsets pass and the rank pass see the SAME boundaries — range
  *     boundaries are sampled per execution, so recomputing the
  *     lineage twice could disagree;
  *  3. per-partition `row_number` (window PARTITIONED by partition id);
  *  4. partition offsets = running sum over the ≤numPartitions-row
  *     count frame (bounded single-partition window — the documented
  *     bounded-frame contract), broadcast back.
  *
  * global rank = offset + in-partition row_number. The rank VALUE is
  * invariant to where the sampled boundaries fall; only per-partition
  * balance depends on them. `sort` must be a TOTAL order (append a
  * unique tiebreaker) or ties order arbitrarily within a partition.
  */
object Ranking {

  def globalRank(df: DataFrame, sort: Seq[Column],
      out: String = "rank"): DataFrame = {
    val ranged = df.repartitionByRange(sort: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val offsets = ranged.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__offset",
        coalesce(sum(col("__n")).over(
          Window.orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__n")
    val w = Window.partitionBy(col("__pid")).orderBy(sort: _*)
    ranged.join(broadcast(offsets), Seq("__pid"))
      .withColumn(out, (col("__offset") + row_number().over(w)).cast("long"))
      .drop("__pid", "__offset")
  }

  /** Equi-depth score 1..buckets from a 1-based global rank over n
    * rows: floor((rank−1)·buckets / n) + 1 — deliberately NOT SQL
    * NTILE (whose remainder-to-early-buckets split differs); this
    * formula keeps bucket sizes within ±1, is windowless, and any
    * engine replays it. The floor(double) is exact: (rank−1)·buckets
    * stays far below 2⁵³ for any real row count.
    */
  def equiDepthScore(rank: Column, n: Column, buckets: Int): Column =
    (floor((rank - 1) * buckets / n) + 1).cast("int")
}
