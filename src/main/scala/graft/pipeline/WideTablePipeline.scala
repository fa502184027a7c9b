package graft.pipeline

import org.apache.spark.sql.{DataFrame, Observation, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.{Discovery, Normalize, PathMeta}
import graft.ops.HourPivot

/** The reference's end-to-end pipeline
  * (/root/reference/pivot_and_boostrap/pivot_all_files.py:366-550) as a
  * SINGLE lazy Spark plan:
  *
  *   discover → detect dialects (driver) → per-dialect scans → union
  *   → broadcast-join path metadata → coerce/drop bad timestamps
  *   → observe(quality) → hour pivot (one hash agg) → observe(groups)
  *   → min-rides filter → write
  *
  * What the reference does with two materialization passes (per-file
  * intermediate parquet + pandas merge, :279-283 / :307-340) and a
  * process pool collapses into one shuffle keyed on
  * (taxi_type, date, pickup_place); the quality counters the reference
  * accumulates across worker result dicts (:448-482) ride the same plan
  * as `observe()` CollectMetrics — zero extra scans.
  *
  * Per-file metadata (taxi type, expected year/month) is computed on the
  * driver from the path list and joined in via a BROADCAST join on the
  * normalized source path — arbitrary driver-side path logic, no UDF in
  * the hot path, one tiny build side.
  *
  * 100 TB notes: the only shuffle is the pivot's group-by; its
  * cardinality is days × places × types (≈ millions), independent of
  * input rows. `coalesce(1)` is NOT applied by default — the
  * single-file output of the reference is a small-data convenience, the
  * `singleFileOutput` flag reproduces it for parity tests only.
  */
object WideTablePipeline {

  final case class Config(
      inputDir: String,
      outputDir: String,
      minRides: Long = 50L,
      maxFiles: Option[Int] = None,
      reportName: String = "report.json",
      singleFileOutput: Boolean = false)

  final case class Report(
      inputRowCount: Long,
      outputRowCount: Long,
      monthMismatchRows: Long,
      lowCountDropped: Long,
      badRowsIgnored: Long,
      skippedFiles: Seq[(String, String)],
      runTimeSeconds: Double)

  /** Composable core (no I/O): files → (wide table plan, observations,
    * skipped). The caller triggers an action, then reads the metrics.
    */
  final case class Planned(
      wide: DataFrame,
      quality: Observation,
      groups: Observation,
      skipped: Seq[(String, String)])

  def plan(spark: SparkSession, files: Seq[String], minRides: Long): Option[Planned] = {
    import spark.implicits._

    val result = Normalize.normalizedTrips(spark, files)
    result.trips.map { trips =>
      // Tiny (path → meta) table, broadcast onto the fact rows.
      val meta = files.map(PathMeta.fileMeta)
        .map(m => (Normalize.normPathKey(m.path), m.taxiType, m.expectedYear, m.expectedMonth))
        .toDF("src_path", "taxi_type", "exp_year", "exp_month")

      val coerced = trips
        .where(col("pickup_datetime").isNotNull) // errors="coerce" + dropna
        .join(broadcast(meta), Seq("src_path"))

      val quality = Observation("quality")
      val observed = coerced.observe(
        quality,
        count(lit(1)).as("input_rows"),
        sum(when(year(col("pickup_datetime")) =!= col("exp_year") ||
                 month(col("pickup_datetime")) =!= col("exp_month"), 1L)
          .otherwise(0L)).as("month_mismatch"))
        .withColumn("pickup_place", col("pickup_location"))

      val pivoted = HourPivot.pivot(
        observed, col("pickup_datetime"), Seq("taxi_type", "pickup_place"),
        minTotal = None, dateColName = "date")
        // canonical 27-column order (pivot_all_files.py:50-51, :334-339)
        .select(("taxi_type" +: "date" +: "pickup_place" +:
          HourPivot.hourCols).map(col): _*)

      val groups = Observation("groups")
      val withGroupCount = pivoted.observe(groups, count(lit(1)).as("n_groups"))

      val wide = withGroupCount
        .where(HourPivot.hourCols.map(col).reduce(_ + _) >= minRides)

      Planned(wide, quality, groups, result.skipped.map(s => (s.path, s.reason)))
    }
  }

  def run(spark: SparkSession, cfg: Config): Report = {
    val t0 = System.nanoTime()
    val all = Discovery.discoverParquet(spark, cfg.inputDir)
    val files = Discovery.selectTripFiles(all, cfg.maxFiles)
    val outPath = s"${cfg.outputDir}/wide_table.parquet"

    val report = plan(spark, files, cfg.minRides) match {
      case None =>
        // No usable files: write the canonical empty 27-col table
        // (pivot_all_files.py:317-321).
        import org.apache.spark.sql.types._
        val schema = StructType(
          StructField("taxi_type", StringType) ::
          StructField("date", DateType) ::
          StructField("pickup_place", StringType) ::
          HourPivot.hourCols.map(h => StructField(h, LongType)).toList)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
          .write.mode("overwrite").parquet(outPath)
        val skipped = files.map(f => (f, "undetectable or unreadable"))
        Report(0L, 0L, 0L, 0L, 0L, skipped, 0.0)
      case Some(p) =>
        val out = if (cfg.singleFileOutput) p.wide.coalesce(1) else p.wide
        out.write.mode("overwrite").parquet(outPath)
        val outputRows = spark.read.parquet(outPath).count()
        val q = p.quality.get
        val inputRows = q("input_rows").asInstanceOf[Long]
        val mismatch = q("month_mismatch") match {
          case null => 0L
          case x => x.asInstanceOf[Long]
        }
        val nGroups = p.groups.get("n_groups").asInstanceOf[Long]
        val dropped = nGroups - outputRows
        Report(inputRows, outputRows, mismatch, dropped,
          mismatch + dropped, p.skipped, 0.0)
    }
    val elapsed = (System.nanoTime() - t0) / 1e9
    val finalReport = report.copy(runTimeSeconds = elapsed)
    ReportSink.write(finalReport, s"${cfg.outputDir}/${cfg.reportName}")
    finalReport
  }
}
