package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spatial neighbor join — all pairs of points within a radius,
  * without the all-pairs cross product. The grid-cell trick: bucket
  * points into radius-sized cells, explode ONE side over its 3×3 cell
  * neighborhood, equi-join on the cell key, then exact-filter on
  * distance. Any qualifying pair sits at most one cell apart in each
  * axis, so the 9-cell probe cannot miss; the join itself is a plain
  * hash equi-join whose fan-in is the local point density, never n².
  * (The same family as the reference's lat/lon rounding-to-key —
  * pivot_all_files.py:114-118 — promoted from formatting to an actual
  * spatial operator.)
  *
  * Determinism contract: coordinates are INTEGER micro-units and the
  * distance test is exact BIGINT squared-Euclidean — no doubles
  * anywhere, so any engine reproduces the pair set bit-exactly.
  * Coordinates must be non-negative (floor vs truncating division
  * diverge below zero — shift upstream if needed).
  *
  * 100 TB shape: exchanges carry (cell key, id, two longs); the 9×
  * explosion multiplies only the probe side's row COUNT, not payload
  * width. Density skew (a mega-city cell) bounds the per-key work as
  * density², the classic spatial-join hotspot — salt or sub-grid hot
  * cells upstream if density is unbounded.
  */
object GeoJoin {

  /** All unordered pairs (id_a < id_b) within `radius` (micro-units),
    * with the exact squared distance. `df` must carry (idCol, xCol,
    * yCol) with integer micro-coordinates ≥ 0.
    */
  def neighborPairs(df: DataFrame, idCol: String, xCol: String,
      yCol: String, radius: Long): DataFrame = {
    require(radius > 0)
    val pts = df.select(col(idCol).cast("long").as("id"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .withColumn("cx", expr(s"x div ${radius}L"))
      .withColumn("cy", expr(s"y div ${radius}L"))
    val probe = pts
      .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("id").as("id_a"), col("x").as("xa"), col("y").as("ya"),
        (col("cx") + col("dx")).as("cx"), (col("cy") + col("dy")).as("cy"))
    val build = pts.select(col("id").as("id_b"), col("x").as("xb"),
      col("y").as("yb"), col("cx"), col("cy"))
    probe.join(build, Seq("cx", "cy"))
      .where(col("id_a") < col("id_b"))
      .withColumn("dist2",
        (col("xa") - col("xb")) * (col("xa") - col("xb")) +
          (col("ya") - col("yb")) * (col("ya") - col("yb")))
      .where(col("dist2") <= lit(radius * radius))
      .select(col("id_a"), col("id_b"), col("dist2"))
  }
}
