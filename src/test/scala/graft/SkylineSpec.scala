package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Forecast, Skyline}

/** Hand-computed fixtures for the round-12 wave-1 operators: Pareto
  * frontier (2-D skyline) and the dyadic EWMA forecast band.
  */
class SkylineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Session.builder("skyline-test", "4").getOrCreate()
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("pareto frontier: per-cost collapse, strict domination, ties kept") {
    // (id, cost, benefit):
    //  1 (10,5)  dominated by 2 (same cost, more benefit)
    //  2 (10,7)  dominated by 3 (cheaper, same benefit)
    //  3 (8,7)   frontier; 5 is the identical point -> both kept
    //  4 (12,9)  frontier (highest benefit)
    //  5 (8,7)   frontier (tie of 3)
    //  6 (9,6)   dominated by 3 (8<9, 7>6)
    val df = Seq((1L, 10.0, 5), (2L, 10.0, 7), (3L, 8.0, 7),
      (4L, 12.0, 9), (5L, 8.0, 7), (6L, 9.0, 6))
      .toDF("id", "cost", "benefit")
    for (buckets <- Seq(1, 3, 64)) {
      val out = Skyline.paretoFrontier(df, "id", "cost", "benefit",
          buckets = buckets)
        .collect().map(_.getLong(0)).toSet
      assert(out == Set(3L, 4L, 5L), s"buckets=$buckets -> $out")
    }
  }

  test("pareto frontier: keyed variant isolates groups") {
    val df = Seq(("a", 1L, 10.0, 5), ("a", 2L, 11.0, 6),
      ("b", 3L, 10.0, 5), ("b", 4L, 9.0, 4))
      .toDF("g", "id", "cost", "benefit")
    val out = Skyline.paretoFrontier(df, "id", "cost", "benefit",
        keyCols = Seq("g"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSet
    // group a: both on frontier (2 costs more but yields more);
    // group b: 3 dominated? 4 is cheaper but lower benefit -> both stay
    assert(out == Set(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L)))
  }

  test("pareto frontier: single distinct cost / constant column edge") {
    val df = Seq((1L, 5.0, 1), (2L, 5.0, 9)).toDF("id", "cost", "benefit")
    val out = Skyline.paretoFrontier(df, "id", "cost", "benefit")
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(2L))
  }

  test("ewma band: dyadic weights, strict band, tomorrow includes today") {
    // key A, days 1..4 (day 3 absent -> 0 on the grid): 4, 2, 0, 8
    // L=2 (weights 2,1), band 50%:
    //  day2: num=4*2=8 den=2 c=2 -> 2e6*2 = 4e6 vs low thr 8*5e5=4e6:
    //        equality is NOT an alarm (strict comparison)
    //  day3: num=2*2+4=8 den=3 c=0 -> low
    //  day4: num=0*2+2=2 den=3 c=8 -> 24e6 > 2*1.5e6 -> high
    //  tomorrow: numn=8*2+0=16 denn=3 -> 16e6 div 3 = 5333333
    val rows = Seq.fill(4)(("A", ts("2024-01-01 01:00:00"))).take(4) ++
      Seq.fill(2)(("A", ts("2024-01-02 01:00:00"))) ++
      Seq.fill(8)(("A", ts("2024-01-04 01:00:00")))
    val out = Forecast.ewmaMonitor(rows.toDF("k", "ts"), "k", "ts",
        lags = 2, bandPpm = 500000L)
      .collect()
    assert(out.length == 1)
    val a = out.head
    assert(a.getLong(a.fieldIndex("n_days")) == 4L)
    assert(a.getLong(a.fieldIndex("n_high")) == 1L)
    assert(a.getLong(a.fieldIndex("n_low")) == 1L)
    assert(a.getString(a.fieldIndex("first_high_day")) == "2024-01-04")
    assert(a.getString(a.fieldIndex("first_low_day")) == "2024-01-03")
    assert(a.getLong(a.fieldIndex("ewma_next_x1e6")) == 5333333L)
  }

  test("pareto 3d: all three domination modes, ties kept, bucket-invariant") {
    // (id, cost, benefit, level) — minimize cost, maximize benefit,
    // minimize level:
    //  1 (10,5,1) dominated by 2 (same c/l, more b)
    //  2 (10,7,1) dominated by 5 (cheaper, equal b, equal l)
    //  3 (8,7,2)  dominated by 5 (equal c/b, lower level)
    //  4 (12,9,3) frontier (highest benefit)
    //  5 (8,7,1)  frontier; 7 is the identical point -> both kept
    //  6 (9,6,0)  frontier (only level-0 point; no l<=0 dominator)
    val df = Seq((1L, 10.0, 5, 1), (2L, 10.0, 7, 1), (3L, 8.0, 7, 2),
      (4L, 12.0, 9, 3), (5L, 8.0, 7, 1), (6L, 9.0, 6, 0), (7L, 8.0, 7, 1))
      .toDF("id", "cost", "benefit", "level")
    for (buckets <- Seq(1, 3, 64)) {
      val out = Skyline.paretoFrontier3D(df, "id", "cost", "benefit",
          "level", buckets = buckets)
        .collect().map(_.getLong(0)).toSet
      assert(out == Set(4L, 5L, 6L, 7L), s"buckets=$buckets -> $out")
    }
  }

  test("isotonic fit: pools the violating pair, weighted, monotone") {
    // bins 1..4 with rates 0, 1.0, 0.5, 1.0 (n=2 each): PAV pools
    // bins 2-3 to (2+1)/(2+2) = 0.75; hand-checked minimax values:
    //   bin1 -> 0, bin2 -> 750000, bin3 -> 750000, bin4 -> 1000000
    val bins = Seq((1L, 2L, 0L), (2L, 2L, 2L), (3L, 2L, 1L), (4L, 2L, 2L))
      .toDF("bin", "n_docs", "n_pos")
    val out = graft.ops.Calibration.isotonicFromBins(bins)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(r.fieldIndex("raw_ppm")),
          r.getLong(r.fieldIndex("fitted_ppm")))).toMap
    assert(out(1L) == (0L, 0L))
    assert(out(2L) == (1000000L, 750000L))
    assert(out(3L) == (500000L, 750000L))
    assert(out(4L) == (1000000L, 1000000L))
  }

  test("isotonic fit: already-monotone input is returned unchanged") {
    val bins = Seq((10L, 4L, 1L), (20L, 4L, 2L), (30L, 4L, 4L))
      .toDF("bin", "n_docs", "n_pos")
    val out = graft.ops.Calibration.isotonicFromBins(bins)
      .collect()
      .map(r => (r.getLong(r.fieldIndex("raw_ppm")),
        r.getLong(r.fieldIndex("fitted_ppm"))))
    assert(out.forall { case (raw, fit) => raw == fit })
  }

  test("ewma band: first day is unscored (den=0), flat series never alarms") {
    // constant 3/day over 5 days: every scored day sits exactly on the
    // forecast -> zero alarms at any band; tomorrow's forecast = 3e6
    val rows = (1 to 5).flatMap(d =>
      Seq.fill(3)(("B", ts(f"2024-02-0$d%d 01:00:00"))))
    val out = Forecast.ewmaMonitor(rows.toDF("k", "ts"), "k", "ts",
        lags = 4, bandPpm = 100000L).collect().head
    assert(out.getLong(out.fieldIndex("n_high")) == 0L)
    assert(out.getLong(out.fieldIndex("n_low")) == 0L)
    assert(out.isNullAt(out.fieldIndex("first_high_day")))
    assert(out.getLong(out.fieldIndex("ewma_next_x1e6")) == 3000000L)
  }
}
