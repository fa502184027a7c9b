package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Conformal, Sampling}

class ConformalSpec extends AnyFunSuite {
  lazy val spark: SparkSession =
    Session.builder("conformal-test", "4").getOrCreate()
  import spark.implicits._

  test("threshold is the ceil((n+1)cov)-th order statistic, per group") {
    // group a: scores 1..10 (n=10) → k = ceil(11·0.9) = 10 → qhat = 10
    // group b: scores 1..4  (n=4)  → k = ceil(5·0.9)  = 5 > n → NULL
    // group c: ties — 1,2,2,2,3 (n=5) → k = ceil(6·0.9) = 6 > n → NULL;
    //   at cov 1/2: k = 3 → smallest v with cum ≥ 3 is 2
    val cal = ((1 to 10).map(v => ("a", v.toLong)) ++
      (1 to 4).map(v => ("b", v.toLong)) ++
      Seq(1L, 2L, 2L, 2L, 3L).map(("c", _))).toDF("g", "s")
    val t90 = Conformal.threshold(cal, Seq("g"), "s", 9, 10).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)))).toMap
    assert(t90("a") == (10L, Some(10L)))
    assert(t90("b") == (4L, None))
    assert(t90("c") == (5L, None))
    val t50 = Conformal.threshold(cal, Seq("g"), "s", 1, 2).collect()
      .map(r => r.getString(0) -> Option(r.get(2))).toMap
    assert(t50("c").contains(2L)) // tie rule: smallest v with cum ≥ k
    assert(t50("a").contains(6L)) // k = ceil(11/2) = 6
  }

  test("coverage counts test scores at or below qhat, one division") {
    val cal = (1 to 9).map(v => ("g", v.toLong)).toDF("g", "s")
    val thr = Conformal.threshold(cal, Seq("g"), "s", 9, 10) // k=9 → 9
    val test = Seq(3L, 9L, 10L, 12L).map(("g", _)).toDF("g", "s")
    val r = Conformal.coverage(test, thr, Seq("g"), "s").collect()(0)
    assert(r.getAs[Long]("n_test") == 4L)
    assert(r.getAs[Long]("n_covered") == 2L) // 3 and 9 (≤ inclusive)
    assert(r.getAs[Double]("coverage") == 0.5)
  }

  test("purged time folds: roles are exact at the block boundaries") {
    // ts 0..99, k = 2 → width 50: blocks [0,49], [50,99];
    // horizon 10, embargo 5.
    val df = (0L to 99L).map(t => (t, t)).toDF("id", "ts")
    val out = Sampling.purgedTimeFolds(df, "id", "ts", 10L, 2, 5L)
      .collect()
      .map(r => (r.getAs[Int]("fold"), r.getAs[Long]("id")) ->
        r.getAs[String]("role")).toMap
    // fold 0 (block [0,49]): ts 0..49 test; ts 50..54 embargoed
    // (purged), ts ≥ 55 train; nothing trains before a leading block.
    assert(out((0, 25L)) == "test" && out((0, 49L)) == "test")
    assert(out((0, 54L)) == "purged" && out((0, 55L)) == "train")
    // fold 1 (block [50,99]): ts+10 < 50 → train up to 39; 40..49 is
    // the horizon purge zone even though those ts sit in block 0.
    assert(out((1, 39L)) == "train" && out((1, 40L)) == "purged")
    assert(out((1, 49L)) == "purged" && out((1, 50L)) == "test")
    assert(out((1, 99L)) == "test")
  }
}
