package graft.ops

import org.apache.spark.sql.DataFrame

/** Partitioning helpers. */
object Partitioning {

  /** Spread a small/under-split input across all cores before
    * per-row-expensive operators (hashing, shingling, scoring). Parquet
    * splits at ~128 MB, so a small file arrives as ONE task and
    * serializes the work; at real scale inputs already have many splits
    * and this is a no-op. Round-robin (no key) — these operators are
    * map-side until their own shuffle.
    */
  def fanOut(df: DataFrame): DataFrame = {
    // a streaming frame can't be partition-counted (`df.rdd` plans the
    // query); micro-batches split per source file anyway, so pass
    // through — the shared map-side operators stay streaming-legal
    if (df.isStreaming) df
    else {
      val p = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < p) df.repartition(p) else df
    }
  }
}
