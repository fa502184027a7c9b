package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch — bounded-memory frequency estimation: d hash
  * rows × w buckets of counters; an item increments one counter per
  * row, and a key's estimate is the MIN over its d counters (always
  * ≥ the true count; collisions only inflate). The sketch size is
  * d·w REGARDLESS of corpus size — the whole point at 100 TB: the
  * build is one partial-aggregated shuffle where every map task emits
  * at most d·w rows, and the finished sketch broadcasts anywhere.
  *
  * Hashing is md5-derived (`substr(md5(j:key), 1, 2)` → 256 string
  * buckets per row) — the repo-standard ENGINE-PORTABLE hash (same
  * trick as Sampling's md5 thresholds), so the full sketch, every
  * estimate, and the heavy-hitter ranking replay exactly in the
  * DuckDB oracle. Deterministic: counts are exact ints, min is exact,
  * ties rank lexicographically.
  */
object Sketches {

  val Width = 256 // 2 hex chars; fixed so oracles stay textual

  private def bucket(key: Column, j: Int): Column =
    substring(md5(concat_ws(":", lit(j.toString), key)), 1, 2)

  /** The (j, bucket, n) counter table — d×256 rows, corpus-independent. */
  def cmsSketch(items: DataFrame, keyCol: String, d: Int): DataFrame =
    items
      .select(posexplode(array((0 until d).map(j =>
        bucket(col(keyCol), j)): _*)).as(Seq("j", "bucket")))
      .groupBy(col("j"), col("bucket"))
      .agg(count(lit(1)).as("n"))

  /** Top-k keys by CMS estimate: every distinct key looks up its d
    * counters via a broadcast join against the (tiny) sketch and takes
    * the min; ranking is (estimate DESC, key). The distinct is the
    * only corpus-sized shuffle and carries bare keys.
    */
  def cmsHeavyHitters(items: DataFrame, keyCol: String, d: Int = 4,
      k: Int = 20): DataFrame = {
    val sketch = cmsSketch(items, keyCol, d)
    items.select(col(keyCol).as("key")).distinct()
      .select(col("key"), posexplode(array((0 until d).map(j =>
        bucket(col("key"), j)): _*)).as(Seq("j", "bucket")))
      .join(broadcast(sketch), Seq("j", "bucket"))
      .groupBy(col("key"))
      .agg(min(col("n")).as("cms_estimate"))
      .orderBy(col("cms_estimate").desc, col("key"))
      .limit(k)
  }
}
