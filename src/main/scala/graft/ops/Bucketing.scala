package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage bucketing — the co-located-join primitive at 100 TB: both
  * fact tables are written pre-hash-partitioned (and pre-sorted) on the
  * join key, so every future join on that key needs NO exchange and NO
  * sort — the scan itself satisfies the join's distribution and
  * ordering requirements. At cluster scale this converts the dominant
  * repeated cost of a star-schema workload (shuffling the fact table
  * for every fact-fact join) into a one-time write-layout decision —
  * the same contract as Hive/Iceberg bucketed tables.
  *
  * Mechanics: `bucketBy(n, key).sortBy(key)` parquet tables with an
  * explicit `path`. Bucket counts MUST match across join sides (Spark
  * shuffles the mismatched side otherwise); `n` is chosen once per
  * layout and sized so a bucket ≈ one task's worth of data at target
  * scale. PlanSpec asserts the join plan has zero ShuffleExchange and
  * zero Sort nodes above the scans.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted parquet table (overwrite).
    *
    * The pre-write `repartition(buckets, key)` matters: Spark's reader
    * only reports the sorted-bucket ordering (letting SMJ skip its
    * Sort) when each bucket consists of exactly ONE file. Repartition
    * uses the same murmur3 hash as the bucketing spec, so partition i
    * holds exactly bucket i and each bucket writes as a single file.
    * Without it, a many-task write leaves several files per bucket and
    * every downstream join re-sorts (exchange still eliminated, but
    * half the point of `sortBy` lost).
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit =
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(table)

  /** Read a bucketed table back (bucket metadata lives in the session
    * catalog — `spark.table`, not `spark.read.parquet`, or the layout
    * degrades to a plain directory scan and the join shuffles again).
    */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
