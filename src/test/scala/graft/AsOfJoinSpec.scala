package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Session.builder("asof-test", "4").getOrCreate()
  import spark.implicits._

  test("as-of picks most recent right row at or before left ts, per key") {
    val trades = Seq((1L, 100L, "t1"), (1L, 205L, "t2"), (2L, 150L, "t3"))
      .toDF("k", "ts", "trade")
    val quotes = Seq((1L, 90L, 10.0), (1L, 100L, 11.0), (1L, 200L, 12.0),
      (2L, 500L, 99.0))
      .toDF("k", "qts", "price")
    val out = AsOfJoin.asOf(trades, quotes, Seq("k"),
        leftTs = "ts", rightTs = "qts", rightPayload = Map("price" -> "quote"))
      .collect().map(r => r.getAs[String]("trade") ->
        Option(r.getAs[java.lang.Double]("quote"))).toMap
    assert(out("t1").contains(11.0)) // equal ts inclusive: 100 matches 100
    assert(out("t2").contains(12.0)) // most recent ≤ 205 is 200
    assert(out("t3").isEmpty)        // only future quote for key 2 → null
  }

  test("left rows and columns are preserved (left-outer semantics)") {
    val left = Seq((1L, 10L, "x")).toDF("k", "ts", "payload")
    val right = Seq((9L, 5L, 1.0)).toDF("k", "qts", "v")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "ts", "qts",
      Map("v" -> "v_asof"))
    assert(out.columns.toSeq == Seq("k", "ts", "payload", "v_asof"))
    val r = out.collect()(0)
    assert(r.getAs[String]("payload") == "x" && r.isNullAt(3))
  }
}
