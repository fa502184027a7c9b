package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: pair rows whose timestamps fall within a
  * tolerance of each other, per key — "find the B events within N
  * seconds of each A event for the same user".
  *
  * Spark has no range-join optimization (a raw `a.ts BETWEEN b.ts-N AND
  * b.ts+N` predicate plans as a broadcast-nested-loop or a cartesian
  * per key). The scale-safe composition is BUCKETED: quantize time into
  * `tolerance`-sized buckets, explode each left row to its bucket ± 1,
  * equi-join on (key, bucket), then apply the exact predicate. Every
  * qualifying pair shares a bucket ID in one of the three copies, so
  * the equi-join is exhaustive; the exact filter removes the
  * false-positive remainder; a distinct would be needed only if BOTH
  * sides were exploded (only the left is — right rows keep one bucket,
  * so each true pair matches exactly once).
  *
  * 100 TB: one shuffle per side on (key, bucket); work is confined to
  * per-bucket groups (≈ tolerance-window density), never all-pairs per
  * key. The 3× left-side explode is the price of the equi-join form —
  * rows carry only (key, bucket, ts, id), not payloads.
  */
object RangeJoin {

  /** Pairs (key, left id/ts, right id/ts, dt_s) with
    * |left.ts − right.ts| ≤ toleranceSec, left/right given as
    * (df, idCol, tsCol, keyCol) quadruples.
    */
  def withinSeconds(left: DataFrame, right: DataFrame,
      keyCol: String, idCol: String, tsCol: String,
      toleranceSec: Long): DataFrame = {
    require(toleranceSec > 0, "tolerance must be positive")
    def us(c: Column): Column = unix_micros(c)
    val tolUs = toleranceSec * 1000000L
    val bucket = (c: Column) => floor(us(c) / tolUs)

    val l = left.select(
      col(keyCol).as("k"),
      col(idCol).as("left_id"), col(tsCol).as("left_ts"),
      explode(array(bucket(col(tsCol)) - 1, bucket(col(tsCol)),
        bucket(col(tsCol)) + 1)).as("b"))
    val r = right.select(
      col(keyCol).as("k"),
      col(idCol).as("right_id"), col(tsCol).as("right_ts"),
      bucket(col(tsCol)).as("b"))
    l.join(r, Seq("k", "b"))
      .where(abs(us(col("left_ts")) - us(col("right_ts"))) <= tolUs)
      .select(col("k"), col("left_id"), col("left_ts"),
        col("right_id"), col("right_ts"),
        ((us(col("right_ts")) - us(col("left_ts"))) / 1000000L)
          .cast("long").as("dt_s"))
  }
}
