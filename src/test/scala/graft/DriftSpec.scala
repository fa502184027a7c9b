package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Profiling

/** Hand-computed fixtures for the two-sample drift tests (KS and
  * Mann–Whitney U) plus the bounded-domain guard added in r15: the
  * exact window fold is distribution-sized only while the value
  * domain is bounded, so past `domainCap` distinct values the call
  * must THROW toward [[Profiling.ksDriftBucketed]] instead of paying
  * a corpus-sized per-group window sort.
  */
class DriftSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Session.builder("drift-test", "4").getOrCreate()
  import spark.implicits._

  // A = {1, 2, 3}, B = {2, 3, 3, 4}: at v = 1, 2, 3, 4 the rational
  // gaps |ca·tb − cb·ta| are 4, 5, 3, 0 → ks_num = 5, D = 5/12.
  test("ksDrift: exact rational D on a hand fixture, nulls dropped") {
    val df = Seq(
      (Some(1.0), true), (Some(2.0), true), (Some(3.0), true),
      (Some(2.0), false), (Some(3.0), false), (Some(3.0), false),
      (Some(4.0), false),
      // null measurements must not shift any cumulative count
      (None: Option[Double], true), (None: Option[Double], false))
      .toDF("v", "p").withColumn("g", lit("x"))
    val out = Profiling.ksDrift(df, Seq("g"), col("v"), col("p"))
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_a") == 3L)
    assert(r.getAs[Long]("n_b") == 4L)
    assert(r.getAs[Long]("ks_num") == 5L)
    assert(r.getAs[Double]("ks") == 5.0 / 12.0)
  }

  test("mannWhitneyU: midrank ties exact, nulls dropped") {
    // A = {1, 3}, B = {2, 3}: pooled ranks 1,2,(3,4 tied → midrank 3.5)
    // R_a = 1 + 3.5 = 4.5 → 2·R_a = 9; 2·U_a = 9 − 2·3 = 3;
    // auc = 3 / (2·2·2) = 0.375 = P(A>B) + P(=)/2 = (1 + 0.5·1)/4? —
    // pairs: (1,2)<, (1,3)<, (3,2)>, (3,3)= → U_a = 1 + 0.5 = 1.5 ✓
    val df = Seq(
      (Some(1.0), true), (Some(3.0), true),
      (Some(2.0), false), (Some(3.0), false),
      (None: Option[Double], false))
      .toDF("v", "p").withColumn("g", lit("x"))
    val r = Profiling.mannWhitneyU(df, Seq("g"), col("v"), col("p"))
      .collect().head
    assert(r.getAs[Long]("n_a") == 2L)
    assert(r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Long]("u2_a") == 3L)
    assert(r.getAs[Double]("auc_ab") == 0.375)
  }

  test("cvmDrift: exact integrated-square statistic on the KS fixture") {
    // same A/B as the KS test: gaps D_v = 4, 5, 3, 0 with pooled
    // multiplicities m_v = 1, 2, 3, 1 → cvm_num = 16 + 50 + 27 + 0 =
    // 93; denominator 3·4·7² = 588
    val df = Seq(
      (Some(1.0), true), (Some(2.0), true), (Some(3.0), true),
      (Some(2.0), false), (Some(3.0), false), (Some(3.0), false),
      (Some(4.0), false),
      (None: Option[Double], true))
      .toDF("v", "p").withColumn("g", lit("x"))
    val r = Profiling.cvmDrift(df, Seq("g"), col("v"), col("p"))
      .collect().head
    assert(r.getAs[Long]("n_a") == 3L)
    assert(r.getAs[Long]("n_b") == 4L)
    assert(r.getAs[java.math.BigDecimal]("cvm_num").longValueExact == 93L)
    assert(r.getAs[Double]("cvm") == 93.0 / 588.0)
  }

  test("wassersteinDrift: exact CDF-area distance, single-valued group survives") {
    // same A/B: segments (v → v⁺) × |D| are 1·4, 1·5, 1·3 → w1_num =
    // 12; w1 = 12 / (1 · 3·4) = 1.0 (by hand: ∫|F_a−F_b| =
    // 1/3 + 5/12 + 1/4 = 1)
    val df = Seq(
      (Some(1L), true, "x"), (Some(2L), true, "x"), (Some(3L), true, "x"),
      (Some(2L), false, "x"), (Some(3L), false, "x"),
      (Some(3L), false, "x"), (Some(4L), false, "x"),
      (None: Option[Long], true, "x"),
      // group y: every row holds ONE value — W1 must be an honest 0,
      // not a vanished group
      (Some(7L), true, "y"), (Some(7L), false, "y"))
      .toDF("v", "p", "g")
    val out = Profiling.wassersteinDrift(df, Seq("g"), col("v"),
      col("p")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("x").getAs[Double]("w1") == 1.0)
    assert(out("x").getAs[java.math.BigDecimal]("w1_num")
      .longValueExact == 12L)
    assert(out("y").getAs[Double]("w1") == 0.0)
    // scale divides the final statistic only: values shipped ×100
    // with scale=100 give the identical answer
    val scaled = Profiling.wassersteinDrift(
      df.withColumn("v", col("v") * 100), Seq("g"), col("v"),
      col("p"), scale = 100L).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("w1")).toMap
    assert(scaled("x") == 1.0 && scaled("y") == 0.0)
  }

  test("domain guard: high-cardinality continuous values throw toward ksDriftBucketed") {
    // 5000 distinct doubles — far past a domainCap of 1000: the exact
    // fold must refuse rather than build a 5000-row-per-group window
    val wide = spark.range(5000)
      .select((col("id") % 2 === 0).as("p"),
        (col("id").cast("double") + lit(0.25)).as("v"))
      .withColumn("g", lit("x"))
    val e = intercept[IllegalStateException] {
      Profiling.ksDrift(wide, Seq("g"), col("v"), col("p"),
        domainCap = 1000L)
    }
    assert(e.getMessage.contains("ksDriftBucketed"))
    val e2 = intercept[IllegalStateException] {
      Profiling.mannWhitneyU(wide, Seq("g"), col("v"), col("p"),
        domainCap = 1000L)
    }
    assert(e2.getMessage.contains("ksDriftBucketed"))
    // the bucketed variant runs on the same frame with state bounded
    // by construction, and equals ksDrift on the pre-bucketed column
    val bucketed = Profiling.ksDriftBucketed(wide, Seq("g"), col("v"),
      col("p"), buckets = 16).collect().head
    val mn = 0.25
    val width = (4999.25 - mn) / 16
    val manual = Profiling.ksDrift(
      wide.withColumn("b",
        least(lit(15L), floor((col("v") - lit(mn)) / lit(width)))),
      Seq("g"), col("b"), col("p")).collect().head
    assert(bucketed.getAs[Long]("ks_num") == manual.getAs[Long]("ks_num"))
    assert(bucketed.getAs[Long]("n_a") == 2500L)
    assert(bucketed.getAs[Long]("n_b") == 2500L)
  }

  test("ksDriftBucketed: constant column lands in one bin with D = 0") {
    val const = Seq((1.0, true), (1.0, false), (1.0, true))
      .toDF("v", "p").withColumn("g", lit("x"))
    val r = Profiling.ksDriftBucketed(const, Seq("g"), col("v"),
      col("p"), buckets = 8).collect().head
    assert(r.getAs[Long]("ks_num") == 0L)
    assert(r.getAs[Double]("ks") == 0.0)
  }

  test("tvdDrift: exact mass-moved fraction, one-sided categories, nulls dropped") {
    // A = {x, x, y}, B = {y, z}: p_a = (2/3, 1/3, 0), p_b = (0, ½, ½)
    // → TVD = ½(2/3 + 1/6 + 1/2) = 2/3. Integer terms |na·tb − nb·ta|:
    // x: |2·2 − 0·3| = 4, y: |1·2 − 1·3| = 1, z: |0·2 − 1·3| = 3 →
    // num = 8, tvd = 8 / (2·3·2). The one-sided categories (x only in
    // A, z only in B) contribute their full mass with no smoothing.
    val df = Seq(
      (Some("x"), true), (Some("x"), true), (Some("y"), true),
      (Some("y"), false), (Some("z"), false),
      (None: Option[String], true), (None: Option[String], false))
      .toDF("v", "p").withColumn("g", lit("s"))
    val r = Profiling.tvdDrift(df, Seq("g"), col("v"), col("p"))
      .collect().head
    assert(r.getAs[Long]("n_a") == 3L)
    assert(r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Double]("tvd") == 8.0 / 12.0)
  }

  test("kuiperDrift: keeps both excursions and is invariant to the cyclic cut") {
    // A = {1, 4}, B = {2, 3} on a 4-value circle: gaps D_v =
    // ca·tb − cb·ta over v = 1..4 are 2, 0, −2, 0 → D⁺ = D⁻ = 2,
    // V = 4/4 = 1.0 while KS keeps only one excursion (D = 2/4).
    val df = Seq((1, true), (4, true), (2, false), (3, false))
      .toDF("v", "p").withColumn("g", lit("s"))
    val r = Profiling.kuiperDrift(df, Seq("g"), col("v"), col("p"))
      .collect().head
    assert(r.getAs[Long]("dplus_num") == 2L)
    assert(r.getAs[Long]("dminus_num") == 2L)
    assert(r.getAs[Long]("kuiper_num") == 4L)
    assert(r.getAs[Double]("kuiper") == 1.0)
    val ks = Profiling.ksDrift(df, Seq("g"), col("v"), col("p"))
      .collect().head
    assert(ks.getAs[Double]("ks") == 0.5, "fixture must split its evidence for KS")
    // rotate the cut: v' = (v mod 4) + 1 relabels where the circle is
    // cut. V_num = max(D) − min(D) is invariant under the rotation
    // (cumsums restart, shifting every gap by a constant); KS is not.
    val rot = df.withColumn("v", (col("v") % 4) + 1)
    val r2 = Profiling.kuiperDrift(rot, Seq("g"), col("v"), col("p"))
      .collect().head
    assert(r2.getAs[Long]("kuiper_num") == 4L, "V changed under the cut rotation")
    val ks2 = Profiling.ksDrift(rot, Seq("g"), col("v"), col("p"))
      .collect().head
    assert(ks2.getAs[Double]("ks") == 1.0,
      "rotation should have concentrated KS's single excursion")
  }

  test("ksDriftTimeseries: window boundaries exact, empty-reference rows emit nothing") {
    // group x: v=1 on days 1–7, v=2 on days 8–15. Eval days start at
    // d0+13 = day 14 (earlier days have a half-filled window).
    //   day 14: ref = days 1–7 (all v=1), cur = days 8–14 (all v=2)
    //           → full separation, ks = 1 (num 49)
    //   day 15: ref = days 2–8 (six v=1, one v=2), cur = days 9–15
    //           → gap at v=1 is |6·7 − 0·7| = 42, ks = 6/7
    // group y exists only on days 14–15: its reference windows are
    // EMPTY → no verdict rows at all (not a NaN/NULL 0/0).
    val rows =
      (1 to 7).map(d => ("x", f"2024-01-$d%02d", 1.0)) ++
        (8 to 15).map(d => ("x", f"2024-01-$d%02d", 2.0)) ++
        Seq(("y", "2024-01-14", 9.0), ("y", "2024-01-15", 9.0))
    val df = rows.toDF("g", "day", "v")
      .withColumn("day", to_date(col("day")))
    val out = Profiling.ksDriftTimeseries(df, Seq("g"), col("v"),
      col("day"), refDays = 7, curDays = 7).collect()
    assert(out.forall(_.getString(0) == "x"),
      "empty-reference group y must emit nothing")
    val byDay = out.map(r =>
      r.getDate(1).toString -> (r.getAs[Long]("ks_num"),
        r.getAs[Double]("ks"))).toMap
    assert(byDay.keySet == Set("2024-01-14", "2024-01-15"),
      s"eval days wrong: ${byDay.keySet}")
    assert(byDay("2024-01-14") == ((49L, 1.0)))
    assert(byDay("2024-01-15") == ((42L, 6.0 / 7.0)))
  }

  test("withKsAlarm: rejection decision is exact integer arithmetic") {
    // full separation at n = 7 vs 7: ks_num = 49, and
    // 49²·20000 = 48,020,000 > 36889·7·7·14 = 25,305,854 → alarm
    val sep = Seq.tabulate(7)(i => (i + 1.0, true)) ++
      Seq.tabulate(7)(i => (i + 8.0, false))
    val a = Profiling.withKsAlarm(
      Profiling.ksDrift(sep.toDF("v", "p").withColumn("g", lit("x")),
        Seq("g"), col("v"), col("p"))).collect().head
    assert(a.getAs[Boolean]("alarm"))
    // identical distributions: ks_num = 0 → never alarms
    val same = Seq((1.0, true), (2.0, true), (1.0, false), (2.0, false))
    val b = Profiling.withKsAlarm(
      Profiling.ksDrift(same.toDF("v", "p").withColumn("g", lit("x")),
        Seq("g"), col("v"), col("p"))).collect().head
    assert(!b.getAs[Boolean]("alarm"))
  }

  test("runKsAppended: reference static, current grows, D updates on live state") {
    val out = graft.streaming.StreamingForecast
      .runKsAppended(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getAs[Long]("wave"), r.getAs[String]("event_type")) ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Double]("ks")))
      .toMap
    val types = out.keys.map(_._2).toSet
    assert(out.keys.map(_._1).toSet == Set(1L, 2L))
    types.foreach { t =>
      val (na1, nb1, _) = out((1L, t))
      val (na2, nb2, _) = out((2L, t))
      // the reference window all arrived in batch 0 — n_a is final
      assert(na1 == na2, s"$t: reference population changed across waves")
      // wave 2 appended current rows onto live state
      assert(nb2 > nb1, s"$t: current population did not grow")
    }
    // the statistic provably updated for at least one type
    assert(types.exists(t => out((1L, t))._3 != out((2L, t))._3),
      "no type's D moved when the second wave landed")
  }
}
