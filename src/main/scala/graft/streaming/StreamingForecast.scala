package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Continuous seasonality scoring — the streaming face of
  * `ops/Forecast.seasonalNaiveMase`: day-grain counts per key are
  * maintained as ONE streaming aggregation (state = |keys| × |days|,
  * bounded by the calendar — the StreamingChangepoint contract) and
  * the MASE fold runs on the counts SNAPSHOT through the identical
  * batch code path (`maseFromDaily`). A volume monitor's serving
  * shape: "is this stream still week-seasonal" refreshes continuously
  * without re-scanning history, and must equal the batch answer
  * whatever the arrival order — the shared oracle hash-checks it.
  */
object StreamingForecast {

  private val nameCounter = new AtomicInteger(0)

  def runBatchEquivalent(spark: SparkSession, sfDir: String): DataFrame = {
    val name = s"stream_mase_${nameCounter.incrementAndGet()}"
    StreamingRun.withStatePartitions(spark, 4) { s =>
      val daily = StreamingHourPivot.eventsStream(s, sfDir)
        .groupBy(col("event_type").as("k"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
      val q = daily.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
      try q.processAllAvailable()
      finally q.stop()
      val snapshot = s.createDataFrame(
        s.table(name).collectAsList(), s.table(name).schema)
      s.catalog.dropTempView(name)
      graft.ops.Forecast.maseFromDaily(snapshot, "event_type", season = 7)
    }
  }

  /** Theil–Sen trend on the same continuously-maintained day counts —
    * the robust "is volume trending" monitor, refreshed per
    * micro-batch; identical batch fold on the snapshot.
    */
  def runTheilSenBatchEquivalent(spark: SparkSession,
      sfDir: String): DataFrame = {
    val name = s"stream_theilsen_${nameCounter.incrementAndGet()}"
    StreamingRun.withStatePartitions(spark, 4) { s =>
      val daily = StreamingHourPivot.eventsStream(s, sfDir)
        .groupBy(col("event_type").as("k"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
      val q = daily.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
      try q.processAllAvailable()
      finally q.stop()
      val snapshot = s.createDataFrame(
        s.table(name).collectAsList(), s.table(name).schema)
      s.catalog.dropTempView(name)
      graft.ops.Forecast.theilSenFromDaily(snapshot, "event_type")
    }
  }

  /** EWMA forecast-band monitor on the same continuously-maintained
    * day counts — "is today's volume inside the exponentially-
    * weighted band, and what is tomorrow's forecast, as of NOW";
    * identical batch fold (`ewmaFromDaily`) on the snapshot.
    */
  def runEwmaBatchEquivalent(spark: SparkSession,
      sfDir: String): DataFrame = {
    val name = s"stream_ewma_${nameCounter.incrementAndGet()}"
    StreamingRun.withStatePartitions(spark, 4) { s =>
      val daily = StreamingHourPivot.eventsStream(s, sfDir)
        .groupBy(col("event_type").as("k"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
      val q = daily.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
      try q.processAllAvailable()
      finally q.stop()
      val snapshot = s.createDataFrame(
        s.table(name).collectAsList(), s.table(name).schema)
      s.catalog.dropTempView(name)
      graft.ops.Forecast.ewmaFromDaily(snapshot, "event_type")
    }
  }

  /** Robust MAD outlier audit on a continuously-maintained VALUE
    * DISTRIBUTION: state = (type, value_cents, count) — bounded by
    * the cents grid, not the stream — folded through
    * GroupQuantile.madFromDistribution per snapshot.
    */
  def runMadBatchEquivalent(spark: SparkSession,
      sfDir: String): DataFrame = {
    val name = s"stream_mad_${nameCounter.incrementAndGet()}"
    StreamingRun.withStatePartitions(spark, 4) { s =>
      val dist = StreamingHourPivot.eventsStream(s, sfDir)
        .groupBy(col("event_type"),
          (col("value").cast(
            org.apache.spark.sql.types.DataTypes.createDecimalType(12, 2))
            * 100).cast("long").as("__v"))
        .agg(count(lit(1)).as("__n"))
      val q = dist.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
      try q.processAllAvailable()
      finally q.stop()
      val snapshot = s.createDataFrame(
        s.table(name).collectAsList(), s.table(name).schema)
      s.catalog.dropTempView(name)
      graft.ops.GroupQuantile.madFromDistribution(
        snapshot, Seq("event_type"), k = 3L)
    }
  }

  /** Day-of-week profile on the same continuously-maintained day
    * counts — "what does the weekly shape look like as of NOW";
    * identical batch fold (`dowProfileFromDaily`) on the snapshot.
    */
  def runDowProfileBatchEquivalent(spark: SparkSession,
      sfDir: String): DataFrame = {
    val name = s"stream_dow_${nameCounter.incrementAndGet()}"
    StreamingRun.withStatePartitions(spark, 4) { s =>
      val daily = StreamingHourPivot.eventsStream(s, sfDir)
        .groupBy(col("event_type").as("k"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
      val q = daily.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
      try q.processAllAvailable()
      finally q.stop()
      val snapshot = s.createDataFrame(
        s.table(name).collectAsList(), s.table(name).schema)
      s.catalog.dropTempView(name)
      graft.ops.Forecast.dowProfileFromDaily(snapshot, "event_type")
    }
  }

  /** Rolling HLL reach on continuously-maintained SKETCH state: the
    * per-(day, bucket) max-rho registers are a streaming MAX
    * aggregate — state is days × 256 registers, bounded by the
    * calendar and the sketch, never by users (the exact
    * rollingDistinct needs the distinct (day, user) frame; this is
    * its 100 TB-reach approximate twin) — and the trailing-window
    * register merge + raw estimate fold on the snapshot through the
    * identical batch path (shared oracle: the estimate is bit-exact
    * cross-engine because every 2^-M term is dyadic).
    */
  def runHllRollingBatchEquivalent(spark: SparkSession,
      sfDir: String): DataFrame = {
    val name = s"stream_hll_roll_${nameCounter.incrementAndGet()}"
    StreamingRun.withStatePartitions(spark, 4) { s =>
      val ev = StreamingHourPivot.eventsStream(s, sfDir)
        .select(to_date(col("ts")).as("day"), col("user_id"))
      val regs = graft.ops.Sketches.hllRegisters(ev, "user_id", Seq("day"))
      val q = regs.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
      try q.processAllAvailable()
      finally q.stop()
      val snapshot = s.createDataFrame(
        s.table(name).collectAsList(), s.table(name).schema)
      s.catalog.dropTempView(name)
      graft.ops.Sketches.hllRollingEstimate(snapshot, "day",
        windowDays = 3)
    }
  }

  /** Hamilton budget allocation on continuously-maintained stratum
    * counts — "how many rows does tonight's eval set take from each
    * type, as of NOW"; state = |strata| rows, fold per snapshot.
    */
  def runAllocationBatchEquivalent(spark: SparkSession,
      sfDir: String): DataFrame = {
    val name = s"stream_alloc_${nameCounter.incrementAndGet()}"
    StreamingRun.withStatePartitions(spark, 4) { s =>
      val counts = StreamingHourPivot.eventsStream(s, sfDir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_rows"))
      val q = counts.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
      try q.processAllAvailable()
      finally q.stop()
      val snapshot = s.createDataFrame(
        s.table(name).collectAsList(), s.table(name).schema)
      s.catalog.dropTempView(name)
      graft.ops.Sampling.allocationFromCounts(
        snapshot, Seq("event_type"), budget = 1000L)
    }
  }

  /** Streaming twin of q_ks_value_drift: the per-(type, value, pop)
    * distribution counts are ONE streaming aggregation (state =
    * distinct values per group — distribution-sized, the
    * GroupQuantile caveat, never corpus rows) and the exact-rational
    * KS fold runs on the snapshot through the identical batch code
    * path (`Profiling.ksFromCounts`), sharing the batch oracle. The
    * population cut (first 15 days) is derived batch-side up front —
    * a deployment would configure the reference window statically.
    */
  def runKsBatchEquivalent(spark: SparkSession,
      sfDir: String): DataFrame = {
    val minTs = graft.sources.Tables.events(spark, sfDir)
      .agg(min(col("ts"))).head().getTimestamp(0)
    val name = s"stream_ks_${nameCounter.incrementAndGet()}"
    StreamingRun.withStatePartitions(spark, 4) { s =>
      val dist = StreamingHourPivot.eventsStream(s, sfDir)
        .groupBy(col("event_type"), col("value").as("__v"),
          (to_date(col("ts")) < date_add(to_date(lit(minTs)), 15))
            .as("__p"))
        .agg(count(lit(1)).as("__n"))
      val q = dist.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
      try q.processAllAvailable()
      finally q.stop()
      val snapshot = s.createDataFrame(
        s.table(name).collectAsList(), s.table(name).schema)
      s.catalog.dropTempView(name)
      graft.ops.Profiling.ksFromCounts(
        snapshot.groupBy(col("event_type"), col("__v"))
          .agg(
            sum(when(col("__p"), col("__n")).otherwise(0L)).as("__na"),
            sum(when(col("__p"), lit(0L)).otherwise(col("__n")))
              .as("__nb")),
        Seq("event_type"))
    }
  }
}
