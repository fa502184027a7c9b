package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Continuous shuffle-strategy advice — the streaming face of
  * `ops/Profiling.aggKeyAdvice` (the StreamingKeySkew pattern): per-key
  * counts for each candidate grouping key are maintained as ONE
  * streaming aggregation with O(|keys|) state, and the advice fold
  * (`aggKeyAdviceFromCounts`) runs on the counts SNAPSHOT through the
  * identical batch code path. This is a partition router's live
  * control input: as traffic skew shifts, the broadcast/salt/plain
  * decision refreshes without re-scanning history.
  *
  * The emitted rows must equal the batch advisor whatever the arrival
  * order — the shared oracle hash-checks it.
  */
object StreamingAdvice {

  private val nameCounter = new AtomicInteger(0)

  def runBatchEquivalent(spark: SparkSession, sfDir: String): DataFrame = {
    val candidates = Seq("user_id" -> "user_id",
      "event_type" -> "event_type")
    candidates.map { case (name, c) =>
      val sink = s"stream_advice_${nameCounter.incrementAndGet()}"
      StreamingRun.withStatePartitions(spark, 4) { s =>
        val counts = StreamingHourPivot.eventsStream(s, sfDir)
          .groupBy(col(c).as("__k"))
          .agg(count(lit(1)).as("__c"))
        val q = counts.writeStream
          .outputMode("complete")
          .format("memory")
          .queryName(sink)
          .start()
        try q.processAllAvailable()
        finally q.stop()
        val snapshot = s.createDataFrame(
          s.table(sink).collectAsList(), s.table(sink).schema)
        s.catalog.dropTempView(sink)
        graft.ops.Profiling.aggKeyAdviceFromCounts(snapshot, name,
          parallelism = 32)
      }
    }.reduce(_ unionByName _)
  }
}
