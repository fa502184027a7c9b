package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Ranking, Segmentation}

class RankingSpec extends AnyFunSuite {
  lazy val spark = Session.builder("ranking-test", "4").getOrCreate()
  import spark.implicits._

  test("globalRank equals the single-window row_number on a total order") {
    val df = (1 to 997).map(i => ((i * 7919) % 1000, i.toLong))
      .toDF("v", "id")
    val got = Ranking.globalRank(df, Seq(col("v"), col("id")), "r")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = df.collect().map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(identity).zipWithIndex
      .map { case (k, i) => k -> (i + 1L) }.toMap
    assert(got == want)
  }

  test("globalRankLean equals the single-window row_number on a total order") {
    val df = (1 to 997).map(i => ((i * 7919) % 1000, i.toLong))
      .toDF("v", "id").repartition(7)
    val got = Ranking.globalRankLean(df, Seq(col("v"), col("id")), "r")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = df.collect().map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(identity).zipWithIndex
      .map { case (k, i) => k -> (i + 1L) }.toMap
    assert(got == want)
  }

  test("globalRankLean: null sort-key fields rank nulls-first, like the window") {
    // nulls in the SECOND key — bucket assignment (struct compare vs the
    // literal bounds) and the within-bucket window must agree on where
    // nulls order, or ranks break at a bucket boundary
    val rows = (1 to 400).map { i =>
      val v = (i * 31) % 20
      val s: java.lang.Long = if (i % 5 == 0) null else ((i * 17) % 100).toLong
      (v, s, i.toLong)
    }
    val df = rows.toDF("v", "s", "id").repartition(5)
    val got = Ranking.globalRankLean(df,
      Seq(col("v"), col("s"), col("id")), "r", buckets = 8)
      .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
    val want = rows.sortBy { case (v, s, id) =>
      (v, if (s == null) Long.MinValue else s.toLong, id)
    }.zipWithIndex.map { case ((_, _, id), i) => id -> (i + 1L) }.toMap
    assert(got == want)
  }

  test("globalRankLean: all-tied leading key still a correct permutation") {
    val df = (1 to 300).map(i => (1, i.toLong)).toDF("v", "id")
    val r = Ranking.globalRankLean(df, Seq(col("v"), col("id")), "r",
      buckets = 6)
      .collect().map(x => x.getLong(1) -> x.getLong(2)).toMap
    assert((1 to 300).forall(i => r(i.toLong) == i.toLong))
  }

  test("equi-depth scores: sizes within 1, ordered by rank") {
    val n = 23
    val df = (1 to n).map(_.toLong).toDF("id")
    val scored = Ranking.globalRank(df, Seq(col("id")), "r")
      .select(col("id"),
        Ranking.equiDepthScore(col("r"), lit(n.toLong), 5).as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val sizes = scored.values.groupBy(identity).map { case (k, v) => k -> v.size }
    assert(sizes.keySet == Set(1, 2, 3, 4, 5))
    assert(sizes.values.max - sizes.values.min <= 1)
    // monotone: a higher id (higher rank) never gets a lower score
    assert(scored.toSeq.sortBy(_._1).map(_._2).sliding(2)
      .forall(p => p.head <= p.last))
  }

  test("rfm: hand-checked scores on a 5-user base") {
    import java.sql.Timestamp
    def t(s: Long) = new Timestamp(s * 1000L)
    // users 1..5: freq 1..5 (user u has u events), last ts = 100*u,
    // value 10*u per event -> every axis ranks users 1<2<3<4<5
    val ev = (1L to 5L).flatMap(u => (1L to u).map(i =>
      (u, t(100L * u - i + 1), 10.0 * u))).toDF("user_id", "ts", "value")
    val out = Segmentation.rfmSegments(ev, "user_id", "ts", "value", 5)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(3), r.getInt(4), r.getInt(5), r.getString(6))).toMap
    (1 to 5).foreach { u =>
      assert(out(u.toLong) == (u, u, u, s"$u-$u-$u"))
    }
  }
}
