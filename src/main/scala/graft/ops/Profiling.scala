package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level data profiling and snapshot-over-snapshot drift — the
  * DQ companion to SnapshotDiff (which diffs ROWS) and Expectations
  * (which gates CHECKS): per column, row/null/distinct counts, and the
  * version-to-version deltas that catch silent upstream schema decay
  * (a field going sparse, an enum collapsing, an id column suddenly
  * repeating) before it poisons a training run.
  *
  * Scale shape: one aggregate pass per snapshot — n_rows, per-column
  * non-null counts, and per-column exact distincts in a single agg
  * (Spark plans multi-distinct via Expand: ONE scan, one shuffle of
  * the expanded key stream; for very wide tables profile in column
  * batches). The long-format unpivot happens on the 1-row aggregate
  * output, not on data. Drift joins two |cols|-row profiles — free.
  */
object Profiling {

  /** Long-format profile: (col_name, n_rows, n_nulls, n_distinct) —
    * n_distinct counts distinct NON-NULL values, exact.
    */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap(c => Seq(
      count(col(c)).as(s"__nn_$c"),
      countDistinct(col(c)).as(s"__nd_$c")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    one.select(col("__n"), explode(array(cols.map(c =>
        struct(lit(c).as("col_name"),
          (col("__n") - col(s"__nn_$c")).as("n_nulls"),
          col(s"__nd_$c").as("n_distinct"))): _*)).as("__p"))
      .select(col("__p.col_name").as("col_name"), col("__n").as("n_rows"),
        col("__p.n_nulls").as("n_nulls"),
        col("__p.n_distinct").as("n_distinct"))
  }

  /** Drift between two snapshots of one schema: per column, both
    * profiles side by side plus null_rate_delta (v2 − v1) and
    * distinct_ratio (v2/v1) — each ONE fixed IEEE double tree over
    * exact counts, cross-engine identical. distinct_ratio is NULL
    * when v1 had no distinct values.
    */
  def profileDrift(v1: DataFrame, v2: DataFrame,
      cols: Seq[String]): DataFrame = {
    val a = columnProfile(v1, cols)
      .select(col("col_name"), col("n_rows").as("n_rows_v1"),
        col("n_nulls").as("n_nulls_v1"),
        col("n_distinct").as("n_distinct_v1"))
    val b = columnProfile(v2, cols)
      .select(col("col_name"), col("n_rows").as("n_rows_v2"),
        col("n_nulls").as("n_nulls_v2"),
        col("n_distinct").as("n_distinct_v2"))
    a.join(b, Seq("col_name"))
      .withColumn("null_rate_delta",
        col("n_nulls_v2").cast("double") / nullif(col("n_rows_v2"), lit(0L)) -
          col("n_nulls_v1").cast("double") / nullif(col("n_rows_v1"), lit(0L)))
      .withColumn("distinct_ratio",
        col("n_distinct_v2").cast("double") /
          nullif(col("n_distinct_v1"), lit(0L)))
  }
}
