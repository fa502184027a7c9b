package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Association, Privacy, Profiling, Resample}

/** Unit specs for the round-10 curation/DQ operators — hand-computed
  * fixtures; cross-engine value parity is the oracle gate's job.
  */
class CurationOpsSpec extends AnyFunSuite {
  lazy val spark = Session.builder("curation-ops-test", "4").getOrCreate()
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("pairLift: hand-computed support/confidence/lift, a-priori prune") {
    // baskets: {a,b,c} {a,b} {a,c} {b,c} {a} + singleton-only item d
    val rows = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c"),
      (4L, "b"), (4L, "c"),
      (5L, "a"), (5L, "d"))
    val out = Association.pairLift(rows.toDF("g", "i"), "g", "i",
        minItemCount = 2L, minPairCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6))).toMap
    // n=5 baskets; c_a=4, c_b=3, c_c=3; ab=2, ac=2, bc=2; d dropped
    // (c_d=1 < minItemCount) so (a,d) never reaches the pair join
    assert(out.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    val (nab, na, nb, lift, conf) = out(("a", "b"))
    assert((nab, na, nb) == (2L, 4L, 3L))
    assert(lift == (2.0 * 5) / (4.0 * 3) && conf == 2.0 / 4)
    assert(out(("b", "c"))._4 == (2.0 * 5) / (3.0 * 3))
  }

  test("k-anonymity: audit flags sub-k cohorts; suppression nulls only them") {
    val rows = Seq(
      (1L, "US", "A"), (2L, "US", "A"), (3L, "US", "A"),
      (4L, "DE", "B"), (5L, "DE", "B"),
      (6L, "FR", "C"),
      (7L, null, "C"))
    val df = rows.toDF("id", "country", "seg")
    val audit = Privacy.kAnonymityAudit(df, Seq("country", "seg"), k = 3L)
      .collect().map(r => (r.get(0), r.getString(1)) ->
        (r.getLong(2), r.getInt(3))).toMap
    assert(audit(("US", "A")) == ((3L, 1)))
    assert(audit(("DE", "B")) == ((2L, 0)))
    assert(audit(("FR", "C")) == ((1L, 0)))
    assert(audit((null, "C")) == ((1L, 0)), "NULL QID is a cohort too")
    val sup = Privacy.suppressBelowK(df, Seq("country", "seg"), k = 3L)
      .collect().map(r => r.getLong(0) -> (r.get(1), r.get(2))).toMap
    assert(sup.size == rows.size, "row counts intact")
    assert(sup(1L) == (("US", "A")), "safe cohort untouched")
    assert(sup(4L) == ((null, null)) && sup(6L) == ((null, null)))
    assert(sup(7L) == ((null, null)), "null-QID sub-k cohort suppressed")
  }

  test("columnProfile + profileDrift: nulls, distincts, delta trees") {
    val v1 = Seq((1L, Some("x")), (2L, Some("y")), (3L, None))
      .toDF("id", "s")
    val v2 = Seq((1L, Some("x")), (2L, None), (3L, None), (4L, None))
      .toDF("id", "s")
    val p = Profiling.columnProfile(v1, Seq("id", "s"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(p("id") == ((3L, 0L, 3L)) && p("s") == ((3L, 1L, 2L)))
    val d = Profiling.profileDrift(v1, v2, Seq("s"))
      .collect().head
    // null rate 1/3 -> 3/4; distinct 2 -> 1
    assert(d.getAs[Long]("n_nulls_v2") == 3L)
    assert(d.getAs[Double]("null_rate_delta") == 3.0 / 4 - 1.0 / 3)
    assert(d.getAs[Double]("distinct_ratio") == 0.5)
  }

  test("keySkewAudit: hand-checked gini, max and decile shares") {
    // 10 keys, counts 1..10: T=55, S1=sum(i*i)=385
    // gini = (2*385 - 11*55) / (10*55) = 165/550 = 0.3
    // top decile = ceil(10/10)=1 key -> the count-10 key -> 10/55
    val df = (1 to 10).flatMap(k => Seq.fill(k)(k.toLong)).toDF("user")
    val r = graft.ops.Profiling.keySkewAudit(df, "user").head()
    assert(r.getLong(0) == 10L && r.getLong(1) == 55L)
    assert(r.getDouble(2) == 10.0 / 55)
    assert(r.getDouble(3) == 10.0 / 55)
    assert(r.getDouble(4) == 0.3)

    // uniform: gini exactly 0; 4 keys -> decile still 1 key -> 1/4
    val u = (1 to 4).flatMap(k => Seq.fill(5)(k.toLong)).toDF("user")
    val ru = graft.ops.Profiling.keySkewAudit(u, "user").head()
    assert(ru.getDouble(4) == 0.0)
    assert(ru.getDouble(3) == 0.25)
  }

  test("rollingQuantile: trailing-window exact median, spine days, type-1 rank") {
    // one key; days 0,1,3 with values — window 2 days
    val rows = Seq(
      (0L, 10), (0L, 20),          // day 0
      (1L, 30),                    // day 1
      (3L, 40), (3L, 50), (3L, 60) // day 3
    ).map { case (d, v) => ("k", d, v) }
    val out = Resample.rollingQuantile(rows.toDF("key", "d", "v"),
        Seq("key"), col("d"), col("v"), windowDays = 2, num = 1L, den = 2L)
      .collect().map(r => r.getLong(1) -> (r.getInt(2), r.getLong(3))).toMap
    // anchors = observed days only (0,1,3): day0 sees {10,20} -> lower
    // median 10 of n=2; day1 sees {10,20,30} -> 20; day3 sees only its
    // own {40,50,60} -> 50 (day1 is outside the 2-day window)
    assert(out(0L) == ((10, 2L)))
    assert(out(1L) == ((20, 3L)))
    assert(out(3L) == ((50, 3L)))
    assert(!out.contains(2L), "unobserved days are not anchors")
    // p=1 (max) and p small (min) degenerate correctly
    val mx = Resample.rollingQuantile(rows.toDF("key", "d", "v"),
        Seq("key"), col("d"), col("v"), windowDays = 2, num = 1L, den = 1L)
      .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
    assert(mx(1L) == 30 && mx(3L) == 60)
  }

  test("golden record: mode per attr, deterministic ties, all-null attr stays null") {
    import graft.ops.GoldenRecord
    val rows = Seq(
      (1L, 10L, Some("a"), Some(5)),
      (1L, 11L, Some("b"), Some(5)),
      (1L, 12L, Some("b"), None),
      (2L, 20L, Some("x"), None),
      (2L, 21L, Some("y"), None)) // x/y tie -> smallest wins
      .toDF("k", "id", "s", "v")
    val out = GoldenRecord.consolidate(rows.toDF, Seq("k"), "id",
        Seq("s", "v"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.get(3), r.get(4))).toMap
    assert(out(1L) == ((10L, 3L, "b", 5)))
    assert(out(2L) == ((20L, 2L, "x", null)),
      "tie to smallest value; all-null attribute yields NULL")
  }

  test("eventPaths: sliding windows per key, min-count floor") {
    import graft.ops.Transitions
    val rows = Seq(
      (1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"), (1L, 3L, 3L, "c"),
      (1L, 4L, 4L, "a"), (1L, 5L, 5L, "b"), (1L, 6L, 6L, "c"),
      (2L, 1L, 7L, "a"), (2L, 2L, 8L, "b"), (2L, 3L, 9L, "c"),
      (2L, 4L, 10L, "z")) // a>b>c x3, b>c>a, c>a>b, b>c>z
      .toDF("k", "ts", "tie", "t")
    val out = Transitions.eventPaths(rows.toDF, "k", "ts", "tie", "t",
        len = 3, minCount = 2L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a>b>c" -> 3L), out.toString)
  }

  test("rollingQuantileFromDaily equals rollingQuantile on a prebuilt distribution") {
    val rows = Seq(("k", 0L, 5), ("k", 0L, 5), ("k", 1L, 7))
      .toDF("key", "d", "v")
    val direct = Resample.rollingQuantile(rows, Seq("key"), col("d"),
      col("v"), 2, 1L, 2L).collect().map(_.toSeq).toSet
    val daily = rows.select(col("key"), col("d").as("__day"),
        col("v").as("__v"))
      .groupBy("key", "__day", "__v").agg(count(lit(1)).as("__n"))
    val fromDaily = Resample.rollingQuantileFromDaily(daily, Seq("key"),
      2, 1L, 2L).collect().map(_.toSeq).toSet
    assert(direct == fromDaily)
  }
}
