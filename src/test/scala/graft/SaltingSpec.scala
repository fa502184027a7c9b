package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Salting

class SaltingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Session.builder("salt-test", "4").getOrCreate()
  import spark.implicits._

  // one hot key with 10k rows + long tail
  private def skewed = ((1 to 10000).map(i => ("hot", i.toLong)) ++
    (1 to 100).map(i => (s"k$i", i.toLong))).toDF("k", "v")

  test("salted count equals direct count") {
    val direct = skewed.groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Salting.saltedCount(skewed, Seq("k"), 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
  }

  test("fully identical duplicate rows spread across salt buckets") {
    // 10k IDENTICAL rows — a content-derived salt sends them all to one
    // bucket; the per-row salt must spread them near-uniformly
    val dups = Seq.fill(10000)(("hot", 1L)).toDF("k", "v")
    val perBucket = Salting.saltedCount(dups, Seq("k"), 16)
    assert(perBucket.collect().map(r => r.getLong(1)).sum == 10000L)
    val partials = dups.withColumn("__salt",
        pmod(monotonically_increasing_id(), lit(16L)))
      .groupBy("__salt").count().collect().map(_.getLong(1))
    assert(partials.length == 16, s"all 16 buckets populated: ${partials.toSeq}")
    assert(partials.max <= 10000 / 16 + 16, s"near-uniform: ${partials.toSeq}")
  }

  test("salted join equals plain join, inner and left, duplicates intact") {
    // hot key 1 dominates the fact side; dim has extra + missing keys
    val fact = (Seq.fill(5000)((1L, "hot")) ++
      (2L to 50L).map(i => (i, s"row$i")) :+ ((99L, "orphan")))
      .toDF("k", "payload")
    val dim = ((1L to 40L).map(i => (i, s"dim$i")) :+ ((77L, "unused")))
      .toDF("k", "attr")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    for (jt <- Seq("inner", "left")) {
      val salted = Salting.saltedJoin(fact, dim, "k", 8, jt)
      val plain = fact.join(dim, Seq("k"), jt)
      assert(canon(salted) == canon(plain), s"joinType=$jt")
    }
    // hot key spread: the salted inner join's fact-side rows for key 1
    // must not collapse into a single (k, salt) group
    val spread = fact.withColumn("__salt",
        pmod(monotonically_increasing_id(), lit(8L)))
      .where($"k" === 1L).groupBy("__salt").count().count()
    assert(spread == 8L)
  }

  test("salted sum/max equals direct; two shuffles in plan") {
    val salted = Salting.saltedAgg(skewed, Seq("k"), 16,
      Seq(sum($"v").as("s"), max($"v").as("m")),
      Seq(sum($"s").as("s"), max($"m").as("m")))
    val direct = skewed.groupBy("k").agg(sum($"v").as("s"), max($"v").as("m"))
    val a = salted.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val b = direct.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(a == b)
    // AQE's toString prints Final and Initial plans; count the final only
    val plan = salted.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2, plan)
  }
}
