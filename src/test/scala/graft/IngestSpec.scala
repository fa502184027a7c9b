package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.{PathMeta, SchemaDetector}
import graft.ingest.SchemaDetector.{LatLon, LocId}
import graft.util.SizeParser

/** Ports of the reference's pure-function unit tests
  * (/root/reference/pivot_and_boostrap/test_pivot_date_location_hour.py)
  * against our detectors/parsers.
  */
class IngestSpec extends AnyFunSuite {

  // --- pickup datetime detection (test file :37-55) ---
  test("s3 path handling: key variants, trip filter, month regex on URIs") {
    import graft.ingest.Normalize
    val p = "s3a://bucket/taxi/Dataset/yellow_tripdata_2023-01.parquet"
    // scheme + slash-run collapse to one canonical key
    assert(Normalize.normPathKey(p) == "/bucket/taxi/Dataset/yellow_tripdata_2023-01.parquet")
    assert(Normalize.normPathKey("s3://b/x.parquet") == Normalize.normPathKey("s3a://b/x.parquet"))
    val variants = Normalize.pathKeyVariants(p)
    assert(variants.contains(p) && variants.distinct == variants)
    // the discovery trip filter + path metadata work on URIs unchanged
    assert(PathMeta.monthFromPath(p).contains((2023, 1)))
    assert(PathMeta.taxiType(p) == "yellow")
  }

  test("detects exact datetime candidates") {
    assert(SchemaDetector.findPickupDatetime(
      Seq("tpep_pickup_datetime", "x")).contains("tpep_pickup_datetime"))
    assert(SchemaDetector.findPickupDatetime(
      Seq("lpep_pickup_datetime")).contains("lpep_pickup_datetime"))
    assert(SchemaDetector.findPickupDatetime(
      Seq("Trip_Pickup_DateTime")).contains("Trip_Pickup_DateTime"))
    assert(SchemaDetector.findPickupDatetime(
      Seq("request_datetime")).contains("request_datetime"))
  }

  test("candidate priority: pickup_datetime wins over request_datetime") {
    assert(SchemaDetector.findPickupDatetime(
      Seq("request_datetime", "pickup_datetime")).contains("pickup_datetime"))
  }

  test("case-insensitive match returns original casing") {
    assert(SchemaDetector.findPickupDatetime(
      Seq("TPEP_PICKUP_DATETIME")).contains("TPEP_PICKUP_DATETIME"))
  }

  test("fuzzy pickup+time match") {
    assert(SchemaDetector.findPickupDatetime(
      Seq("my_pickup_time_col")).contains("my_pickup_time_col"))
  }

  test("no datetime column → None") {
    assert(SchemaDetector.findPickupDatetime(Seq("a", "b", "dropoff_datetime")).isEmpty)
  }

  // --- pickup location detection (:57-69) ---
  test("detects location candidates with priority") {
    assert(SchemaDetector.findPickupLocation(
      Seq("PULocationID", "DOLocationID")).contains("PULocationID"))
    assert(SchemaDetector.findPickupLocation(
      Seq("pickup_zone_id")).contains("pickup_zone_id"))
    assert(SchemaDetector.findPickupLocation(Seq("DOLocationID")).isEmpty)
  }

  test("lat/lon pair fallback requires both") {
    assert(SchemaDetector.findLatLon(
      Seq("Start_Lat", "Start_Lon")).contains(("Start_Lat", "Start_Lon")))
    assert(SchemaDetector.findLatLon(
      Seq("pickup_latitude", "pickup_longitude"))
      .contains(("pickup_latitude", "pickup_longitude")))
    assert(SchemaDetector.findLatLon(Seq("Start_Lat")).isEmpty)
  }

  test("detect() precedence: location id over lat/lon; error when missing") {
    val d = SchemaDetector.detect(
      Seq("tpep_pickup_datetime", "PULocationID", "Start_Lat", "Start_Lon"))
    assert(d == Right(SchemaDetector.Detection("tpep_pickup_datetime", LocId("PULocationID"))))
    val d2 = SchemaDetector.detect(Seq("Trip_Pickup_DateTime", "Start_Lat", "Start_Lon"))
    assert(d2 == Right(SchemaDetector.Detection("Trip_Pickup_DateTime", LatLon("Start_Lat", "Start_Lon"))))
    assert(SchemaDetector.detect(Seq("tpep_pickup_datetime")).isLeft)
    assert(SchemaDetector.detect(Seq("PULocationID")).isLeft)
  }

  // --- path helpers (:75-99) ---
  test("taxi type from path: yellow/green/fhv precedence, else unknown") {
    assert(PathMeta.taxiType("yellow_tripdata_2023-01.parquet") == "yellow")
    assert(PathMeta.taxiType("/data/green_tripdata_2021-07.parquet") == "green")
    assert(PathMeta.taxiType("fhv_tripdata_2020-01.parquet") == "fhv")
    assert(PathMeta.taxiType("s3://bucket/fhvhv_tripdata_2022-03.parquet") == "fhv")
    assert(PathMeta.taxiType("mystery.parquet") == "unknown")
  }

  test("month from YYYY-MM filename") {
    assert(PathMeta.monthFromPath("yellow_tripdata_2023-01.parquet").contains((2023, 1)))
    assert(PathMeta.monthFromPath("green_tripdata_2009_7.parquet").contains((2009, 7)))
  }

  test("month from hive-style year=/month= path") {
    assert(PathMeta.monthFromPath("/data/year=2022/month=11/part.parquet").contains((2022, 11)))
  }

  test("hive-style wins over a YYYY-MM elsewhere in the path") {
    assert(PathMeta.monthFromPath("/archive-2001-01/year=2022/month=3/f.parquet")
      .contains((2022, 3)))
  }

  test("no month → None") {
    assert(PathMeta.monthFromPath("taxidata.parquet").isEmpty)
  }

  // --- size parsing (:176-182) ---
  test("size strings parse KiB-based") {
    assert(SizeParser.parse("200MB").contains(200L * 1024 * 1024))
    assert(SizeParser.parse("1.5GB").contains((1.5 * 1024 * 1024 * 1024).toLong))
    assert(SizeParser.parse("500K").contains(500L * 1024))
    assert(SizeParser.parse("12345").contains(12345L))
    assert(SizeParser.parse("nonsense").isEmpty)
  }
}
