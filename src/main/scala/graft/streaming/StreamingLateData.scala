package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType,
  TimestampType}

import graft.sources.Tables

/** Watermarked LATE-DATA semantics, exercised for real (SURVEY §7.4
  * risk 5). The 31 streaming twins prove arrival-order independence by
  * folding continuously-maintained state through batch code paths —
  * none of them ever DROPS a row. This exhibit does: it replays the
  * events table in an arrival order where one event type arrives a
  * full stream-epoch late, and the watermark decides, per Structured
  * Streaming's contract, which of those late rows still count.
  *
  * THE MEASURED SEMANTICS (probed on 4.1.2, pinned in StreamingSpec):
  * Spark keeps TWO watermarks per batch. Eviction uses the current
  * one (max event time through the previous batch, ms-floored, minus
  * delay); the LATE-INPUT FILTER deliberately lags ONE MORE batch
  * (`eventTimeWatermarkForLateEvents`) so rows that were in flight
  * while the watermark advanced aren't dropped — a row arriving in
  * the same batch where the watermark first passes its window still
  * MERGES and ships in that batch's emission. A late row is dropped
  * iff its day window's end ≤ the PREVIOUS batch's watermark — and
  * the one-batch lag makes duplicate emission impossible (a row
  * passing the lagged filter always finds its window state live,
  * because eviction never ran past the lagged mark yet).
  *
  * Arrival schedule (one file per micro-batch, `maxFilesPerTrigger=1`,
  * modification-time ordered), delay = 3 days:
  *
  *   batch 0  every non-click event — watermark (for batch 1's
  *            eviction, batch 2's late filter) advances to
  *            ms(max non-click ts) − 3d at its close;
  *   batch 1  clicks ON the final day — the on-time cohort (the
  *            lagged filter for batch 1 is still the initial 0);
  *   batch 2  every EARLIER click, one whole epoch late. Kept iff the
  *            click's day-window end > batch 0's watermark — at 3-day
  *            delay that MERGES the last ~3 days' clicks into their
  *            still-open windows and DROPS everything older (both
  *            paths non-trivially populated);
  *   batch 3+4  one far-future `__wm_sentinel` row each: batch 3
  *            advances the stored max, batch 4's eviction mark then
  *            clears every real day window, flushing them to the
  *            sink. The sentinel's own window never closes and is
  *            absent from the output by the same rule it exploits.
  *
  * OUTPUT MODE: append — the deliberate choice for a monitor feeding
  * an immutable downstream sink (each day×type row is emitted exactly
  * once, when its window is guaranteed complete; a late row for an
  * emitted window is DROPPED). Update mode would instead re-emit
  * amended rows and push the drop/merge decision downstream; the
  * fixture in StreamingSpec pins both behaviors.
  *
  * The oracle is LATE-DATA-AWARE: it reproduces the window-granular
  * drop rule in SQL — clicks count iff their day window's end exceeds
  * max(non-click ts, millisecond precision) − 1 hour — so the hash
  * gate checks the watermark semantics themselves, not just that some
  * rows came out.
  */
object StreamingLateData {

  private val nameCounter = new AtomicInteger(0)

  /** Replay `(ts, event_type)` batches in the given arrival order —
    * one micro-batch each (`StreamingRun.withArrivalDir`, the shared
    * modification-time-stamped harness) — through the watermarked hour
    * pivot and return everything the chosen output mode emitted.
    * Append: each finalized day×type row exactly once. Update: every
    * per-batch amendment, so re-emissions are VISIBLE (the fixture
    * spec pins both). Callers append their own far-future sentinel
    * batches if they need trailing windows flushed.
    */
  def lateReplayPivot(spark: SparkSession, batches: Seq[DataFrame],
      watermarkDelay: String = "1 hour",
      outputMode: String = "append"): DataFrame = {
    val name = s"stream_late_pivot_${nameCounter.incrementAndGet()}"
    StreamingRun.withArrivalDir(
      batches.map(_.select(col("ts"), col("event_type")))) { srcDir =>
      StreamingRun.withStatePartitions(spark, 4) { s =>
        val schema = StructType(Seq(StructField("ts", TimestampType),
          StructField("event_type", StringType)))
        val stream = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .option("latestFirst", "false")
          .parquet(srcDir)
        val pivoted = StreamingHourPivot.pivotStream(
          stream, col("ts"), Seq("event_type"),
          watermarkDelay = watermarkDelay)
        val q = pivoted.writeStream
          .outputMode(outputMode)
          .format("memory")
          .queryName(name)
          .start()
        try q.processAllAvailable()
        finally q.stop()
        // materialize before the fixture directory is deleted
        s.table(name).localCheckpoint(true)
      }
    }
  }

  /** The late-replay hour pivot over the sf events table: non-clicks,
    * then final-day clicks on time, then every earlier click one epoch
    * late, sentinel-finalized append output. Deterministic: the
    * kept-click set is a pure function of the data and the 3-day
    * delay.
    */
  def runLateHourPivot(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("ts"), col("event_type"))
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
    val lastDay = to_date(lit(maxTs))
    val sentinelTs =
      new java.sql.Timestamp(maxTs.getTime + 10L * 24 * 3600 * 1000)
    val sentinel = spark.range(1)
      .select(lit(sentinelTs).as("ts"),
        lit("__wm_sentinel").as("event_type"))
    lateReplayPivot(spark, Seq(
      ev.where(col("event_type") =!= "click"),
      ev.where(col("event_type") === "click" &&
        to_date(col("ts")) === lastDay),
      ev.where(col("event_type") === "click" &&
        to_date(col("ts")) =!= lastDay),
      sentinel, sentinel), watermarkDelay = "3 days")
  }

  /** The SAME arrival replay in UPDATE output mode — the other half
    * of the output-mode decision matrix (SURVEY §7.4): update re-emits
    * a group every micro-batch that amends it, pushing the
    * drop-vs-amend decision downstream instead of finalizing.
    *
    * On this schedule the re-emission set is fully determined:
    *  - every real (day, type) group arrives in exactly ONE batch
    *    (non-clicks in batch 0, final-day clicks in batch 1, surviving
    *    late clicks in batch 2 — the late filter is the same lagged
    *    watermark as append, so the kept/dropped split is identical),
    *    so each emits exactly once with its full counts — the same
    *    rows append ships;
    *  - the two sentinel batches amend the SENTINEL group twice, so
    *    update emits it at count 1 and again at count 2 — the group
    *    append proves can never finalize is exactly the one update
    *    re-emits. The oracle reproduces both waves in SQL.
    */
  def runLateHourPivotUpdate(spark: SparkSession,
      sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("ts"), col("event_type"))
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
    val lastDay = to_date(lit(maxTs))
    val sentinelTs =
      new java.sql.Timestamp(maxTs.getTime + 10L * 24 * 3600 * 1000)
    val sentinel = spark.range(1)
      .select(lit(sentinelTs).as("ts"),
        lit("__wm_sentinel").as("event_type"))
    lateReplayPivot(spark, Seq(
      ev.where(col("event_type") =!= "click"),
      ev.where(col("event_type") === "click" &&
        to_date(col("ts")) === lastDay),
      ev.where(col("event_type") === "click" &&
        to_date(col("ts")) =!= lastDay),
      sentinel, sentinel), watermarkDelay = "3 days",
      outputMode = "update")
  }

  /** Update mode where REAL business keys amend (r13 verdict #8 — in
    * [[runLateHourPivotUpdate]] every real group arrives in one batch,
    * so only the sentinel ever re-emits; here the amendment path
    * consumers actually reconcile is exercised corpus-wide). The
    * non-click epoch is split into TWO micro-batches by hour-of-day:
    * morning rows (hour < 12) arrive first, afternoon rows (hour ≥ 12)
    * one batch later. Every (day, type) group with events on both
    * sides of noon — at sf gate scale, essentially all of them — emits
    * exactly two waves: partial counts with hour_12..23 all zero, then
    * the amended full counts. Groups on one side only emit once.
    *
    * The afternoon batch merges CUMULATIVELY into live state: batch
    * 1's eviction watermark is max(morning ts) − 3 days, and eviction
    * runs AFTER merge+emit within a batch, so no real group's state
    * can vanish between its two waves. Clicks and sentinels replay
    * exactly as [[runLateHourPivotUpdate]] (the late filter for the
    * late-click batch is the wm over ALL non-clicks — the two-batch
    * lag, measured by tools/WatermarkLagProbe — so the kept/dropped
    * split is byte-identical to the append exhibit's).
    */
  def runLateHourPivotUpdateSplit(spark: SparkSession,
      sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("ts"), col("event_type"))
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
    val lastDay = to_date(lit(maxTs))
    val sentinelTs =
      new java.sql.Timestamp(maxTs.getTime + 10L * 24 * 3600 * 1000)
    val sentinel = spark.range(1)
      .select(lit(sentinelTs).as("ts"),
        lit("__wm_sentinel").as("event_type"))
    val nc = ev.where(col("event_type") =!= "click")
    lateReplayPivot(spark, Seq(
      nc.where(hour(col("ts")) < 12),
      nc.where(hour(col("ts")) >= 12),
      ev.where(col("event_type") === "click" &&
        to_date(col("ts")) === lastDay),
      ev.where(col("event_type") === "click" &&
        to_date(col("ts")) =!= lastDay),
      sentinel, sentinel), watermarkDelay = "3 days",
      outputMode = "update")
  }
}
