package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.WideTablePipeline

/** End-to-end pipeline test over synthetic taxi files in the three
  * schema dialects the reference handles (SURVEY §5 / FIXTURES):
  * modern yellow (tpep + PULocationID int), legacy yellow (string
  * datetime + Start_Lat/Lon), FHV (epoch-millis + zone string).
  */
class WideTablePipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Session.builder("pipeline-test", "4").getOrCreate()

  private def tmpDir(): String =
    Files.createTempDirectory("graft_pipeline").toString

  /** hours: 60 rows in hour 8, 3 rows in hour 9 on 2023-01-15 (+ one
    * row in 2022-12 = month mismatch).
    */
  private def yellowRows: Seq[(Timestamp, Int)] = {
    val h8 = (1 to 60).map(i =>
      (Timestamp.valueOf(f"2023-01-15 08:${i % 60}%02d:00"), 132))
    val h9 = (1 to 3).map(i =>
      (Timestamp.valueOf(f"2023-01-15 09:0$i:00"), 132))
    val mismatch = Seq((Timestamp.valueOf("2022-12-31 23:59:00"), 132))
    h8 ++ h9 ++ mismatch
  }

  private def writeFixtures(dir: String): Unit = {
    import spark.implicits._
    // dialect 1: modern yellow — tpep timestamp + int location id
    yellowRows.toDF("tpep_pickup_datetime", "PULocationID")
      .coalesce(1).write.parquet(s"$dir/yellow_tripdata_2023-01.parquet")
    // dialect 2: legacy yellow — string datetime + lat/lon, 55 rows hour 7
    val legacy = (1 to 55).map(i =>
      (f"2009-03-02 07:${i % 60}%02d:00", 40.7215, -74.0051))
    legacy.toDF("Trip_Pickup_DateTime", "Start_Lat", "Start_Lon")
      .coalesce(1).write.parquet(s"$dir/yellow_tripdata_2009-03.parquet")
    // dialect 3: FHV — epoch millis + string zone, 52 rows hour 12
    val base = Timestamp.valueOf("2021-06-10 12:00:00").getTime
    val fhv = (1 to 52).map(i => (base + i * 1000L, "B00256"))
    fhv.toDF("request_datetime", "pickup_zone_id")
      .coalesce(1).write.parquet(s"$dir/fhv_tripdata_2021-06.parquet")
    // an undetectable file that must be skipped, not fatal
    Seq((1, "x")).toDF("a", "b")
      .coalesce(1).write.parquet(s"$dir/broken_tripdata_2021-01.parquet")
    // a non-tripdata file that must be filtered out
    Seq((1, "x")).toDF("a", "b")
      .coalesce(1).write.parquet(s"$dir/data_dictionary.parquet")
  }

  test("three dialects end-to-end: wide table content + report counters") {
    val in = tmpDir(); val out = tmpDir()
    writeFixtures(in)
    val report = WideTablePipeline.run(spark,
      WideTablePipeline.Config(in, out, minRides = 50L))

    // input rows: 64 yellow + 55 legacy + 52 fhv (broken file skipped)
    assert(report.inputRowCount == 64 + 55 + 52)
    assert(report.skippedFiles.map(_._1).exists(_.contains("broken_tripdata")))
    assert(report.skippedFiles.size == 1)
    // month mismatch: the single 2022-12 row in the 2023-01 file
    assert(report.monthMismatchRows == 1)

    val wide = spark.read.parquet(s"$out/wide_table.parquet")
    assert(wide.columns.toSeq ==
      Seq("taxi_type", "date", "pickup_place") ++ graft.ops.HourPivot.hourCols)

    val rows = wide.collect().map(r =>
      (r.getString(0), r.getDate(1).toString, r.getString(2))).toSet
    // yellow 2023-01-15: 63 rides (60+3) ≥ 50 → kept; mismatch row's
    // group (2022-12-31, 1 ride) dropped by min-rides
    assert(rows.contains(("yellow", "2023-01-15", "132")))
    // legacy: lat/lon bucket key, 55 ≥ 50 → kept
    assert(rows.contains(("yellow", "2009-03-02", "40.722_-74.005")) ||
           rows.contains(("yellow", "2009-03-02", "40.721_-74.005")))
    // fhv: 52 ≥ 50 → kept
    assert(rows.contains(("fhv", "2021-06-10", "B00256")))
    assert(rows.size == 3)
    // low-count dropped: the 2022-12-31 group
    assert(report.lowCountDropped == 1)
    assert(report.outputRowCount == 3)

    // hour columns: yellow row has 60 in hour_8, 3 in hour_9
    val y = wide.where(col("date") === "2023-01-15").collect()(0)
    assert(y.getLong(y.fieldIndex("hour_8")) == 60L)
    assert(y.getLong(y.fieldIndex("hour_9")) == 3L)
    assert(y.getLong(y.fieldIndex("hour_0")) == 0L)
  }

  test("metadata-join fallback path (combos > threshold) equals constant path") {
    // the join path is the 100 TB shape (years of monthly files exceed
    // maxConstantScanGroups); force it with maxConstGroups = 0 and pin
    // output equality against the constant-literal path
    val in = tmpDir()
    writeFixtures(in)
    val all = graft.ingest.Discovery.discoverParquet(spark, in)
    val files = graft.ingest.Discovery.selectTripFiles(all, None)
    val viaConst = WideTablePipeline.plan(spark, files, minRides = 0L).get
    val viaJoin = WideTablePipeline.plan(spark, files, minRides = 0L,
      maxConstGroups = 0).get
    val a = viaConst.wide.collect().map(_.toSeq).toSet
    val b = viaJoin.wide.collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
    // quality counters agree too (the mismatch bounds ride different
    // carriers: literals vs broadcast-joined columns)
    assert(viaConst.quality.get("input_rows") == viaJoin.quality.get("input_rows"))
    assert(viaConst.quality.get("month_mismatch") == viaJoin.quality.get("month_mismatch"))
  }

  test("min-rides filter honors threshold and empty input writes canonical schema") {
    val in = tmpDir(); val out = tmpDir()
    // only the undetectable file
    import spark.implicits._
    Seq((1, "x")).toDF("a", "b")
      .coalesce(1).write.parquet(s"$in/odd_tripdata_2021-01.parquet")
    val report = WideTablePipeline.run(spark,
      WideTablePipeline.Config(in, out, minRides = 50L))
    assert(report.inputRowCount == 0 && report.outputRowCount == 0)
    val wide = spark.read.parquet(s"$out/wide_table.parquet")
    assert(wide.columns.toSeq ==
      Seq("taxi_type", "date", "pickup_place") ++ graft.ops.HourPivot.hourCols)
    assert(wide.count() == 0)
  }

  test("incremental per-month mode produces the same wide table as single-plan") {
    val in = tmpDir(); val out1 = tmpDir(); val out2 = tmpDir()
    writeFixtures(in)
    val full = WideTablePipeline.run(spark,
      WideTablePipeline.Config(in, out1, minRides = 50L))
    val incr = WideTablePipeline.runIncremental(spark,
      WideTablePipeline.Config(in, out2, minRides = 50L))
    val a = spark.read.parquet(s"$out1/wide_table.parquet")
      .collect().map(_.toSeq).toSet
    val b = spark.read.parquet(s"$out2/wide_table.parquet")
      .collect().map(_.toSeq).toSet
    assert(a == b)
    assert(incr.inputRowCount == full.inputRowCount)
    assert(incr.monthMismatchRows == full.monthMismatchRows)
    assert(incr.outputRowCount == full.outputRowCount)
    // monthly intermediates exist per month key
    assert(new java.io.File(s"$out2/monthly").list().toSeq.sorted ==
      Seq("2009-03", "2021-06", "2023-01"))
  }

  test("corrupt parquet file is skipped with a reason, pipeline continues") {
    import spark.implicits._
    val in = tmpDir(); val out = tmpDir()
    // valid file
    (1 to 60).map(i => (Timestamp.valueOf(f"2023-01-15 08:${i % 60}%02d:00"), 5))
      .toDF("tpep_pickup_datetime", "PULocationID")
      .coalesce(1).write.parquet(s"$in/yellow_tripdata_2023-01.parquet")
    // garbage bytes with a .parquet name
    Files.write(java.nio.file.Paths.get(s"$in/green_tripdata_2023-02.parquet"),
      "not a parquet file at all".getBytes)
    val report = WideTablePipeline.run(spark,
      WideTablePipeline.Config(in, out, minRides = 1L))
    assert(report.inputRowCount == 60)
    assert(report.skippedFiles.exists { case (f, why) =>
      f.contains("green_tripdata") && why.startsWith("unreadable") })
    assert(spark.read.parquet(s"$out/wide_table.parquet").count() == 1)
  }

  test("double-typed location IDs format via long cast: 132.0 → \"132\"") {
    import spark.implicits._
    val in = tmpDir(); val out = tmpDir()
    val base = Timestamp.valueOf("2022-04-05 09:00:00").getTime
    (1 to 60).map(i => (base + i * 1000L, 132.0))
      .toDF("request_datetime", "PUlocationID")
      .coalesce(1).write.parquet(s"$in/fhv_tripdata_2022-04.parquet")
    WideTablePipeline.run(spark,
      WideTablePipeline.Config(in, out, minRides = 1L))
    val places = spark.read.parquet(s"$out/wide_table.parquet")
      .select("pickup_place").as[String].collect().toSeq
    // pinned spec (SURVEY §7.4 risk 1): numeric ids cast via LONG, so
    // the key is "132", never pandas-style "132.0"
    assert(places == Seq("132"))
  }

  test("unparseable datetime strings coerce to null and are dropped, not fatal") {
    import spark.implicits._
    val in = tmpDir(); val out = tmpDir()
    val rows = (1 to 55).map(i => (f"2009-03-02 07:${i % 60}%02d:00", 40.7, -74.0)) ++
      Seq(("not a date", 40.7, -74.0), ("", 40.7, -74.0))
    rows.toDF("Trip_Pickup_DateTime", "Start_Lat", "Start_Lon")
      .coalesce(1).write.parquet(s"$in/yellow_tripdata_2009-03.parquet")
    val report = WideTablePipeline.run(spark,
      WideTablePipeline.Config(in, out, minRides = 1L))
    // errors="coerce" semantics: bad rows nulled then dropped BEFORE
    // input_rows counting (pivot_all_files.py:150-157)
    assert(report.inputRowCount == 55)
    assert(report.outputRowCount == 1)
  }

  test("epoch-seconds FHV columns coerce via magnitude heuristic") {
    import spark.implicits._
    val in = tmpDir(); val out = tmpDir()
    val baseSec = Timestamp.valueOf("2021-06-10 15:00:00").getTime / 1000
    (1 to 60).map(i => (baseSec + i, "Z1"))
      .toDF("request_datetime", "pickup_zone_id")
      .coalesce(1).write.parquet(s"$in/fhv_tripdata_2021-06.parquet")
    val report = WideTablePipeline.run(spark,
      WideTablePipeline.Config(in, out, minRides = 1L))
    assert(report.inputRowCount == 60)
    val wide = spark.read.parquet(s"$out/wide_table.parquet")
    val r = wide.collect()(0)
    assert(r.getAs[java.sql.Date]("date").toString == "2021-06-10")
    assert(r.getAs[Long]("hour_15") == 60L)
  }
}
