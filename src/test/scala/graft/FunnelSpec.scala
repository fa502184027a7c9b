package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Funnel

class FunnelSpec extends AnyFunSuite {

  test("daily growth: new/returning split, gap day zeros, cumulative carries") {
    val spark2 = Session.builder("funnel-growth", "4").getOrCreate()
    import spark2.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // u1 d1+d3, u2 d1, u3 d3; day 2 silent
    val ev = Seq((1L, ts("2024-06-01 01:00:00")),
      (1L, ts("2024-06-03 01:00:00")), (2L, ts("2024-06-01 02:00:00")),
      (3L, ts("2024-06-03 02:00:00"))).toDF("user_id", "ts")
    val out = graft.ops.Funnel.dailyGrowth(ev, "ts", "user_id")
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("2024-06-01") == (2L, 2L, 0L, 2L))
    assert(out("2024-06-02") == (0L, 0L, 0L, 2L))
    assert(out("2024-06-03") == (2L, 1L, 1L, 3L))
  }
  lazy val spark: SparkSession = Session.builder("funnel-test", "4").getOrCreate()
  import spark.implicits._

  private def ev(rows: (Long, Long, String)*) =
    rows.toDF("user_id", "ts", "event_type")

  test("funnel: first-touch anchoring, strict order, window cap") {
    val events = ev(
      // user 1: clean conversion view(10) -> click(20) -> purchase(30)
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // user 2: click BEFORE the first view never counts; later click
      // at the same second as the view fails the strict > test
      (2L, 5L, "click"), (2L, 10L, "view"), (2L, 10L, "click"),
      // user 3: FIRST view at 10 converts nothing inside the window;
      // the second view at 500 would have converted — first-touch
      // says not converted past step 1 (click at 510 is outside
      // 10+100, purchase exists only after that click)
      (3L, 10L, "view"), (3L, 500L, "view"),
      (3L, 510L, "click"), (3L, 520L, "purchase"),
      // user 4: steps out of order (purchase before click)
      (4L, 10L, "view"), (4L, 20L, "purchase"), (4L, 30L, "click"),
      // user 5: no view at all -> not in the funnel
      (5L, 10L, "click"), (5L, 20L, "purchase"))
    val per = Funnel.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), windowSec = 100L)
      .collect().map(r => r.getLong(0) ->
        (r.get(1), r.get(2), r.get(3), r.getInt(4))).toMap
    assert(per(1L) == (10L, 20L, 30L, 3))
    assert(per(2L) == (10L, null, null, 1))
    assert(per(3L) == (10L, null, null, 1))
    // user 4 reaches click (30 > 10, inside window); no purchase AFTER it
    assert(per(4L) == (10L, 30L, null, 2))
    assert(!per.contains(5L))

    val summary = Funnel.funnelSummary(events, "user_id", "ts",
        "event_type", Seq("view", "click", "purchase"), windowSec = 100L)
      .collect().map(r => r.getInt(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(summary == Map(1 -> ("view", 4L), 2 -> ("click", 2L),
      3 -> ("purchase", 1L)))
  }

  test("cohort retention: weekly cohorts with offsets, distinct users per cell") {
    val wk = 604800L
    val events = ev(
      // user 1: first week 0, active weeks 0 and 2 (twice — distinct)
      (1L, 100L, "view"), (1L, 2 * wk + 1, "view"), (1L, 2 * wk + 2, "view"),
      // user 2: first week 0, only week 0
      (2L, 200L, "view"),
      // user 3: first week 1, active weeks 1 and 2
      (3L, wk + 5, "view"), (3L, 2 * wk + 5, "view"))
    val got = Funnel.cohortRetention(events, "user_id", "ts")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == Map((0L, 0) -> 2L, (0L, 2) -> 1L,
      (1L, 0) -> 1L, (1L, 1) -> 1L))
  }

  test("event transitions: adjacent pairs per user, row-normalized") {
    // user 1: a,b,c,a  -> a→b, b→c, c→a ; user 2: a,c -> a→c
    val ev2 = Seq(
      (1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"), (1L, 3L, 3L, "c"),
      (1L, 4L, 4L, "a"), (2L, 1L, 5L, "a"), (2L, 2L, 6L, "c"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = graft.ops.Transitions.eventTransitions(
        ev2, "user_id", "ts", "event_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got == Map(
      ("a", "b") -> (1L, 2L, 0.5), ("a", "c") -> (1L, 2L, 0.5),
      ("b", "c") -> (1L, 1L, 1.0), ("c", "a") -> (1L, 1L, 1.0)))
    // a user's LAST event contributes no transition (no wraparound):
    // 6 events, 2 users -> 4 transitions
    assert(got.values.map(_._1).sum == 4L)
  }
}
