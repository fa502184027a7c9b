package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Continuous parquet sink with exactly-once restart semantics — the
  * production shape for "stream the cleaned/derived table to storage":
  * Spark's file sink records committed files in a transaction log under
  * the checkpoint, so a restarted query resumes from the last committed
  * offset and never duplicates or loses a batch; readers see only
  * committed files (the `_spark_metadata` log).
  *
  * `Trigger.AvailableNow` drains everything available then stops —
  * the batch-style deployment mode ("run the continuous pipeline as a
  * scheduled job"), which is also what makes restart semantics
  * testable: run, write more input, run again with the SAME
  * checkpoint, and the second run processes only the new files.
  */
object StreamingFileSink {

  /** Drain `df` (a streaming DataFrame) to parquet at `outPath`,
    * exactly-once under `checkpoint`. Blocks until the drain finishes.
    */
  def drainToParquet(df: DataFrame, outPath: String,
      checkpoint: String): Unit = {
    val q = df.writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Read back ONLY the committed output of a file-sink directory
    * (goes through the `_spark_metadata` commit log, the reader-side
    * half of exactly-once).
    */
  def readCommitted(spark: SparkSession, outPath: String): DataFrame =
    spark.read.parquet(outPath)
}
