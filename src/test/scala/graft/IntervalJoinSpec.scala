package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.IntervalJoin

class IntervalJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession =
    Session.builder("interval-test", "4").getOrCreate()
  import spark.implicits._

  private def pairs(cellWidth: Long,
      rows: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] = {
    val df = rows.toDF("id", "s", "e")
    IntervalJoin.selfOverlap(df, Seq("id"), "s", "e", cellWidth)
      .collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Long]("overlap"))).toSet
  }

  test("overlap, containment, point contact, disjoint") {
    val out = pairs(10L, Seq(
      (1L, 0L, 10L),   // overlaps 2 on [5,10], touches 3 at 10... no: 3 starts 10
      (2L, 5L, 14L),   // contained-overlap with 1 and 3
      (3L, 10L, 30L),  // point contact with 1 at t=10
      (4L, 40L, 45L))) // disjoint from all
    assert(out == Set(
      (1L, 2L, 5L),   // [5,10]
      (1L, 3L, 0L),   // point contact → overlap 0
      (2L, 3L, 4L)))  // [10,14]
  }

  test("pairs spanning many shared cells are emitted exactly once") {
    // Two long intervals sharing 5 cells of width 10 — the
    // greatest-starts attribution cell must dedupe without a distinct.
    val out = pairs(10L, Seq((7L, 0L, 49L), (9L, 3L, 52L)))
    assert(out == Set((7L, 9L, 46L))) // [3,49]
  }

  test("identity tuple orders pairs and excludes self") {
    val df = Seq((1L, 1L, 0L, 9L), (1L, 2L, 5L, 9L), (2L, 1L, 6L, 9L))
      .toDF("u", "s_id", "s", "e")
    val out = IntervalJoin
      .selfOverlap(df, Seq("u", "s_id"), "s", "e", 100L)
      .collect()
      .map(r => ((r.getAs[Long]("a_u"), r.getAs[Long]("a_s_id")),
        (r.getAs[Long]("b_u"), r.getAs[Long]("b_s_id")))).toSet
    // every unordered pair once, a < b lexicographically, no (x, x)
    assert(out == Set(
      ((1L, 1L), (1L, 2L)), ((1L, 1L), (2L, 1L)), ((1L, 2L), (2L, 1L))))
  }

  test("cell width does not change the answer") {
    val rows = (0L until 40L).map(i => (i, i * 3L, i * 3L + 7L))
    assert(pairs(5L, rows) == pairs(64L, rows))
  }
}
