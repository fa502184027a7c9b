package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Scd2

class Scd2Spec extends AnyFunSuite {
  lazy val spark = Session.builder("scd2-test", "4").getOrCreate()
  import spark.implicits._

  private def cl(rows: (Long, Long, Long, String)*): DataFrame =
    rows.toDF("k", "ts", "tie", "v")

  private def history(df: DataFrame) =
    Scd2.historyFromChangeLog(df, Seq("k"), "ts", "tie", Seq("v"))

  private def rows(df: DataFrame): Set[(Long, String, Long, Any, Boolean)] =
    df.collect().map(r => (r.getLong(0), r.getString(1),
      r.getLong(2), r.get(3), r.getBoolean(4))).toSet

  test("history: run collapse, valid_to chaining, is_current") {
    val h = rows(history(cl(
      // key 1: x,x,y,y,x -> three versions (repeat values collapse,
      // a RETURN to x opens a new version, not a merge)
      (1L, 1L, 0L, "x"), (1L, 2L, 1L, "x"), (1L, 5L, 2L, "y"),
      (1L, 7L, 3L, "y"), (1L, 9L, 4L, "x"),
      // key 2: single row -> one open version
      (2L, 4L, 0L, "a"))))
    assert(h == Set(
      (1L, "x", 1L, 5L, false),
      (1L, "y", 5L, 9L, false),
      (1L, "x", 9L, null, true),
      (2L, "a", 4L, null, true)))
  }

  test("history: equal-ts rows ordered by the tiebreaker") {
    val h = rows(history(cl(
      (1L, 1L, 2L, "b"), (1L, 1L, 1L, "a"))))
    // tie=1 ('a') precedes tie=2 ('b') at the same instant
    assert(h == Set(
      (1L, "a", 1L, 1L, false),
      (1L, "b", 1L, null, true)))
  }

  test("history: NULL attributes compare null-safely") {
    val rowsIn = Seq[(Long, Long, Long, String)](
      (1L, 1L, 0L, null), (1L, 2L, 1L, null), (1L, 3L, 2L, "z"))
      .toDF("k", "ts", "tie", "v")
    val h = history(rowsIn).collect()
      .map(r => (r.get(1), r.getLong(2), r.get(3))).toSet
    // the two NULLs are ONE run, not two
    assert(h == Set((null, 1L, 3L), ("z", 3L, null)))
  }

  test("apply: merge equals rebuild, open runs extend across the cut") {
    val full = cl(
      // key 1 changes across the cut
      (1L, 1L, 0L, "x"), (1L, 3L, 1L, "y"), (1L, 8L, 2L, "z"),
      // key 2's value is UNCHANGED across the cut: apply must extend
      // the open interval (valid_from stays 2), not version it
      (2L, 2L, 0L, "a"), (2L, 9L, 1L, "a"),
      // key 3 exists only before the cut
      (3L, 1L, 0L, "q"),
      // key 4 is born after the cut
      (4L, 7L, 0L, "n"))
    val base = full.where($"ts" < 5)
    val delta = full.where($"ts" >= 5)
    val merged = Scd2.applyChanges(history(base), delta,
      Seq("k"), "ts", "tie", Seq("v"))
    assert(rows(merged) == rows(history(full)))
    // and the unchanged-key extension specifically:
    assert(rows(merged).contains((2L, "a", 2L, null, true)))
  }

  test("point-in-time join: boundary picks the new version, pre-history facts stay null") {
    val h = history(cl(
      (1L, 5L, 0L, "x"), (1L, 9L, 1L, "y")))
    val facts = Seq((1L, 10L, 3L), (1L, 11L, 5L), (1L, 12L, 7L),
      (1L, 13L, 9L), (1L, 14L, 20L), (2L, 15L, 5L))
      .toDF("k", "fact_id", "ts")
    val out = Scd2.pointInTimeJoin(facts, h, Seq("k"), "ts", Seq("v"))
      .collect().map(r => r.getLong(1) -> (r.get(3), r.get(4))).toMap
    assert(out(10L) == ((null, null)), "fact before first version")
    assert(out(11L) == (("x", 5L)), "boundary ts joins the version starting there")
    assert(out(12L) == (("x", 5L)))
    assert(out(13L) == (("y", 9L)), "boundary ts picks the NEW version")
    assert(out(14L) == (("y", 9L)), "open interval matches")
    assert(out(15L) == ((null, null)), "unknown key keeps nulls")
    // at most one match per fact — no fan-out
    assert(Scd2.pointInTimeJoin(facts, h, Seq("k"), "ts", Seq("v"))
      .count() == facts.count())
  }

  test("apply: late/backfilled rows trip the append-only guard") {
    val h = history(cl((1L, 5L, 0L, "x"), (1L, 9L, 1L, "y")))
    // open interval of key 1 starts at ts=9; a row at ts=9 (equal) or
    // ts=3 (before) violates the strictly-later contract and would
    // silently corrupt the merge — the guard must abort instead
    Seq(9L, 3L).foreach { ts =>
      val e = intercept[IllegalArgumentException] {
        Scd2.applyChanges(h, cl((1L, ts, 7L, "z")),
          Seq("k"), "ts", "tie", Seq("v"))
      }
      assert(e.getMessage.contains("open valid_from"), e.getMessage)
    }
    // strictly-later rows pass, and enforcement can be waived
    assert(rows(Scd2.applyChanges(h, cl((1L, 10L, 7L, "z")),
      Seq("k"), "ts", "tie", Seq("v")))
      .contains((1L, "z", 10L, null, true)))
    Scd2.applyChanges(h, cl((1L, 3L, 7L, "z")),
      Seq("k"), "ts", "tie", Seq("v"), enforceAppendOnly = false).collect()
  }
}
