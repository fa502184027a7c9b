package graft.streaming

import org.apache.spark.sql.SparkSession

/** Helpers for driving bounded batch-equivalence runs of streaming
  * plans.
  */
object StreamingRun {

  /** Run `f` with `spark.sql.shuffle.partitions` temporarily lowered:
    * a streaming query fixes its STATE partition count from this conf
    * at start, and every state partition owns store instances that
    * checkpoint on every micro-batch (a stream-stream join keeps 4 per
    * partition — 128 stores at the batch default of 32, ~7 s of pure
    * store/commit overhead for kilobytes of state). State partitioning
    * is sized to stateful-key volume, not scan width — the bounded
    * exhibits carry a few thousand keys. At deployment scale this knob
    * is exactly what you tune upward again.
    *
    * The conf is session-wide; callers run queries sequentially
    * (Verify/Bench do), and the previous value is always restored.
    */
  def withStatePartitions[T](spark: SparkSession, n: Int)(f: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try f finally spark.conf.set(key, prev)
  }
}
