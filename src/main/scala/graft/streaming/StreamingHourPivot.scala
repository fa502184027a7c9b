package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.HourPivot

/** The hour pivot as a continuous query (Structured Streaming).
  *
  * The reference has no streaming surface (its "streaming" is bounded
  * batch iteration — pivot_all_files.py:2); this is the extended
  * engine's continuous variant (SURVEY §2.9/§7): same 24×sum(when)
  * aggregate — `pivot()` is unsupported on streams, the sum(when) form
  * works in both modes, which is exactly why HourPivot uses it.
  *
  * Two shapes:
  *  - `pivotStream`: the unbounded transform (watermark + tumbling
  *    date bucket) for a real deployment — caller attaches a sink and
  *    output mode. State is bounded by the watermark: group keys older
  *    than (max event time − delay) are finalized and evicted.
  *  - `runBatchEquivalent`: drives the SAME streaming plan over a
  *    bounded file source with a memory sink in complete mode and
  *    returns the result — lets the DuckDB oracle hash-check the
  *    streaming operator against the batch semantics.
  */
object StreamingHourPivot {

  private val nameCounter = new AtomicInteger(0)

  /** Events-shaped streaming source from the testdata parquet layout.
    * `ts` dispatches on the footer schema exactly like Tables.events:
    * legacy int64-nanos layouts get the exact `DIV 1000` rebuild; the
    * timestamp[us] layout converts to TimestampType directly (the
    * Footers converter runs with NTZ inference off, mirroring how the
    * session-UTC batch reader lands the same wall clock).
    */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    // nanosAsLong is set at session bootstrap (Session.builder) — the
    // old per-call conf.set here leaked session-wide
    val path = s"$sfDir/events.parquet"
    // direct footer read (~10 ms) — a spark.read.parquet().schema
    // schema-inference job costs ~1 s and was a third of this query
    val schema = graft.ingest.Footers.schemaOf(
      spark.sparkContext.hadoopConfiguration, path, nanosAsLong = true)
    // the file source requires a directory basePath; select the events
    // file from the sf dir via glob filter
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampType => raw
      case other =>
        // mirror Tables.events: an unrecognized third layout must fail
        // loudly, not stream half-coerced timestamps
        throw new IllegalStateException(
          s"events.ts arrived as unrecognized physical type $other — " +
            "extend the eventsStream dispatch for this layout")
    }
  }

  /** Unbounded hour-pivot transform with a watermark for state
    * eviction. Late rows beyond `watermarkDelay` are dropped in
    * append/update modes.
    *
    * The date bucket is `window(ts, "1 day")`, NOT `to_date(ts)`: only
    * the window expression's output attribute carries the event-time
    * watermark metadata through the projection, so Spark can build the
    * state-eviction predicate (and append mode can finalize groups). A
    * `to_date` group key loses the metadata → unbounded state and no
    * append output. The window start is re-projected to a plain date
    * AFTER the aggregate, which preserves eviction (the predicate is
    * bound at the aggregation node). Hour columns stay the 24
    * `sum(when)` aggregates — `pivot()` is unsupported on streams.
    */
  def pivotStream(events: DataFrame, tsCol: Column, keys: Seq[String],
      watermarkDelay: String = "1 hour",
      dateColName: String = "event_date"): DataFrame = {
    val withWm = events.withWatermark(tsCol.toString, watermarkDelay)
    val aggs = (0 until 24).map(h =>
      sum(when(col("__hour") === h, 1L).otherwise(0L)).as(s"hour_$h"))
    withWm
      .select((tsCol +: hour(tsCol).as("__hour") +: keys.map(col)): _*)
      .groupBy(window(tsCol, "1 day") +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select((to_date(col("window.start")).as(dateColName) +:
        keys.map(col)) ++ HourPivot.hourCols.map(col): _*)
  }

  /** Execute the streaming pivot over the bounded events file and
    * return the final table (complete output mode, memory sink,
    * processAllAvailable → deterministic batch-equivalent result).
    */
  def runBatchEquivalent(spark: SparkSession, sfDir: String): DataFrame = {
    val name = s"stream_hour_pivot_${nameCounter.incrementAndGet()}"
    StreamingRun.withStatePartitions(spark, 4) { s =>
      val stream = eventsStream(s, sfDir)
      val pivoted = pivotStream(stream, col("ts"), Seq("event_type"))
      val q = pivoted.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
      try q.processAllAvailable()
      finally q.stop()
      s.table(name)
    }
  }
}
