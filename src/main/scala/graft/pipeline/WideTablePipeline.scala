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
      runTimeSeconds: Double,
      peakMemoryMb: Double = 0.0)

  /** Composable core (no I/O): files → (wide table plan, observations,
    * skipped). The caller triggers an action, then reads the metrics.
    */
  final case class Planned(
      wide: DataFrame,
      quality: Observation,
      groups: Observation,
      survivors: Observation,
      skipped: Seq[(String, String)])

  /** Above this many (dialect × taxi_type × month) combinations, fall
    * back from literal-constant scan groups to one scan per dialect +
    * broadcast metadata join — scan-group count is a planner/driver
    * cost, per-row join hashing is an executor cost; 64 groups is
    * comfortably cheap to plan while covering years of monthly files.
    */
  val maxConstantScanGroups = 64

  /** Expected-month window as [start, end) epoch-MICROS bounds (UTC,
    * matching the session timezone). The mismatch check is then two
    * long comparisons per row instead of two calendar decompositions
    * (`year(ts)`/`month(ts)` each re-derive the civil date per row).
    * (0,0) — month not inferrable from the path — yields the empty
    * window, so every row counts as a mismatch, the reference's
    * behavior (pivot_all_files.py:179-182); same for out-of-range
    * months a loose path regex might produce.
    */
  def monthBoundsUs(y: Int, m: Int): (Long, Long) =
    if (y == 0 || m < 1 || m > 12) (0L, 0L)
    else {
      val start = java.time.LocalDate.of(y, m, 1)
      (start.toEpochDay * 86400000000L,
        start.plusMonths(1).toEpochDay * 86400000000L)
    }

  def plan(spark: SparkSession, files: Seq[String], minRides: Long,
      maxConstGroups: Int = maxConstantScanGroups): Option[Planned] = {
    import spark.implicits._

    val t0 = System.nanoTime()
    def mark(name: String): Unit =
      if (sys.env.contains("GRAFT_PIPELINE_DEBUG"))
        System.err.println(f"[plan] $name at ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val (ok, skippedDet) = Normalize.detectDialects(spark, files)
    mark("detected")
    val metaOf = files.map(f => f -> PathMeta.fileMeta(f)).toMap
    val combos = ok
      .groupBy { case (dia, f) =>
        val m = metaOf(f)
        (dia, m.taxiType, m.expectedYear, m.expectedMonth)
      }
      .view.mapValues(_.map(_._2)).toSeq
      .sortBy(_._2.head)

    val tripsOpt =
      if (combos.isEmpty) None
      else if (combos.size <= maxConstGroups) {
        // constant metadata per scan group: no input_file_name(), no
        // join — rows carry three literals. Fastest path; measured
        // ~25% of pipeline time saved vs the join at 50M rows.
        // Group DataFrame construction pays a per-group FileIndex
        // listing (~0.25 s each) — driver-side and independent → build
        // them on a pool like the footer reads.
        val built = {
          import scala.concurrent.{Await, ExecutionContext, Future}
          import scala.concurrent.duration.Duration
          val pool = java.util.concurrent.Executors.newFixedThreadPool(
            math.min(16, combos.size))
          implicit val ec: ExecutionContext =
            ExecutionContext.fromExecutor(pool)
          try Await.result(Future.sequence(combos.map {
            case ((dia, t, y, m), paths) => Future {
              val (lo, hi) = monthBoundsUs(y, m)
              Normalize.readDialect(spark, dia, paths,
                constants = Seq(
                  "taxi_type" -> lit(t),
                  "exp_start_us" -> lit(lo),
                  "exp_end_us" -> lit(hi)),
                withSrcPath = false)
            }
          }), Duration.Inf)
          finally pool.shutdown()
        }
        Some(built.reduce(_.unionByName(_)))
      } else {
        // many combos: one scan per DIALECT + broadcast (path → meta)
        // join on the raw input_file_name value (keys enumerate every
        // spelling — no per-row path rewrite).
        val byDialect = ok.groupBy(_._1).view.mapValues(_.map(_._2)).toSeq
          .sortBy(_._2.head)
        val trips = byDialect
          .map { case (dia, paths) => Normalize.readDialect(spark, dia, paths) }
          .reduce(_.unionByName(_))
        val meta = files.map(PathMeta.fileMeta)
          .flatMap { m =>
            val (lo, hi) = monthBoundsUs(m.expectedYear, m.expectedMonth)
            Normalize.pathKeyVariants(m.path)
              .map(k => (k, m.taxiType, lo, hi))
          }
          .toDF("src_path", "taxi_type", "exp_start_us", "exp_end_us")
        Some(trips.join(broadcast(meta), Seq("src_path")))
      }

    mark("scans built")
    val result = Normalize.NormalizeResult(tripsOpt, skippedDet)
    result.trips.map { trips =>
      val coerced = trips
        .where(col("pickup_datetime").isNotNull) // errors="coerce" + dropna

      val quality = Observation("quality")
      val us = unix_micros(col("pickup_datetime")) // identity: ts IS micros
      val observed = coerced.observe(
        quality,
        count(lit(1)).as("input_rows"),
        sum(when(us < col("exp_start_us") || us >= col("exp_end_us"), 1L)
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

      val survivors = Observation("survivors")
      val wide = withGroupCount
        .where(HourPivot.hourCols.map(col).reduce(_ + _) >= minRides)
        // post-filter row count rides the write job — saves the
        // re-read-and-count pass over the output
        .observe(survivors, count(lit(1)).as("n_out"))

      Planned(wide, quality, groups, survivors,
        result.skipped.map(s => (s.path, s.reason)))
    }
  }

  /** Incremental/per-month mode: process each (year, month) file group
    * as its own plan writing `monthly/<yyyy>-<mm>`, then Combine the
    * materialized monthly wide tables into the final output. This is
    * the reference's month-ordered task layout (pivot_all_files.py:
    * 437-446) kept for incremental refresh — a new month's arrival
    * reprocesses ONE month + the cheap combine, not the whole corpus.
    * The single-plan `run` remains the default for full rebuilds.
    */
  def runIncremental(spark: SparkSession, cfg: Config): Report = {
    val t0 = System.nanoTime()
    val all = Discovery.discoverParquet(spark, cfg.inputDir)
    val files = Discovery.selectTripFiles(all, cfg.maxFiles)
    val byMonth = files.groupBy(f =>
      PathMeta.monthFromPath(f).getOrElse((0, 0))).toSeq.sortBy(_._1)

    var inputRows = 0L; var mismatch = 0L; var groups = 0L
    val skipped = Seq.newBuilder[(String, String)]
    val monthDirs = byMonth.flatMap { case ((y, m), monthFiles) =>
      plan(spark, monthFiles, minRides = 0L) match { // filter AFTER combine
        case Some(p) =>
          val dir = f"${cfg.outputDir}/monthly/$y%04d-$m%02d"
          p.wide.write.mode("overwrite").parquet(dir)
          val q = p.quality.get
          inputRows += q("input_rows").asInstanceOf[Long]
          mismatch += (q("month_mismatch") match {
            case null => 0L; case x => x.asInstanceOf[Long]
          })
          groups += p.groups.get("n_groups").asInstanceOf[Long]
          skipped ++= p.skipped
          Some(dir)
        case None =>
          skipped ++= monthFiles.map(f => (f, "undetectable or unreadable"))
          None
      }
    }

    val outPath = s"${cfg.outputDir}/wide_table.parquet"
    val monthly = monthDirs.map(spark.read.parquet(_))
    val outputRows = graft.ops.Combine
      .combineWideTables(monthly, minRides = Some(cfg.minRides)) match {
      case Some(combined) =>
        val out = if (cfg.singleFileOutput) combined.coalesce(1) else combined
        out.write.mode("overwrite").parquet(outPath)
        spark.read.parquet(outPath).count()
      case None => 0L
    }
    // dropped = pre-filter groups minus survivors (group keys are
    // disjoint across months only if months don't share dates; the
    // combine may merge, so recount the combined pre-filter groups)
    val preFilter = graft.ops.Combine
      .combineWideTables(monthDirs.map(spark.read.parquet(_)))
      .map(_.count()).getOrElse(0L)
    val dropped = preFilter - outputRows
    val report = Report(inputRows, outputRows, mismatch, dropped,
      mismatch + dropped, skipped.result(), (System.nanoTime() - t0) / 1e9,
      ReportSink.peakHeapMb())
    ReportSink.write(report, s"${cfg.outputDir}/${cfg.reportName}")
    report
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
        def mark(name: String): Unit =
          if (sys.env.contains("GRAFT_PIPELINE_DEBUG"))
            System.err.println(f"[pipeline] $name at ${(System.nanoTime() - t0) / 1e9}%.2f s")
        mark("planned")
        val out = if (cfg.singleFileOutput) p.wide.coalesce(1) else p.wide
        out.write.mode("overwrite").parquet(outPath)
        mark("written")
        val outputRows = p.survivors.get("n_out").asInstanceOf[Long]
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
    val finalReport = report.copy(runTimeSeconds = elapsed,
      peakMemoryMb = ReportSink.peakHeapMb())
    ReportSink.write(finalReport, s"${cfg.outputDir}/${cfg.reportName}")
    finalReport
  }
}
