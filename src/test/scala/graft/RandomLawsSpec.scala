package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Calibration, Resample, Skyline}
import graft.text.Dedup

/** Seeded randomized laws: each round-12 operator with non-obvious
  * pruning/decomposition is replayed against a brute-force reference
  * on random inputs (few seeds, real Spark jobs — the ScalaCheck
  * 100-trial style is for driver-side pure logic; these laws each
  * cost a cluster job per trial).
  */
class RandomLawsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Session.builder("laws-test", "4").getOrCreate()
  import spark.implicits._

  test("skyline 2d == brute dominance filter on random points") {
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val pts = (1L to 60L).map(i =>
        (i, (rnd.nextInt(20) * 5).toDouble, rnd.nextInt(12)))
      val brute = pts.filter { case (_, c, b) =>
        !pts.exists { case (_, c2, b2) =>
          c2 <= c && b2 >= b && (c2 < c || b2 > b) }
      }.map(_._1).toSet
      val out = Skyline.paretoFrontier(
          pts.toDF("id", "cost", "benefit"), "id", "cost", "benefit",
          buckets = 1 + rnd.nextInt(8))
        .collect().map(_.getLong(0)).toSet
      assert(out == brute, s"seed=$seed")
    }
  }

  test("skyline 3d == brute dominance filter on random points") {
    for (seed <- Seq(3, 11, 99)) {
      val rnd = new scala.util.Random(seed)
      val pts = (1L to 80L).map(i =>
        (i, (rnd.nextInt(15) * 3).toDouble, rnd.nextInt(10), rnd.nextInt(4)))
      val brute = pts.filter { case (_, c, b, l) =>
        !pts.exists { case (_, c2, b2, l2) =>
          c2 <= c && b2 >= b && l2 <= l && (c2 < c || b2 > b || l2 < l) }
      }.map(_._1).toSet
      val out = Skyline.paretoFrontier3D(
          pts.toDF("id", "cost", "benefit", "level"), "id", "cost",
          "benefit", "level", buckets = 1 + rnd.nextInt(6))
        .collect().map(_.getLong(0)).toSet
      assert(out == brute, s"seed=$seed")
    }
  }

  test("prefix jaccard join == brute on random shingle corpora") {
    val vocab = ('a' to 'p').map(_.toString)
    for (seed <- Seq(5, 23)) {
      val rnd = new scala.util.Random(seed)
      // docs of 6..14 tokens from a 16-token vocab: dense similarity
      val docs = (1L to 25L).map(i =>
        (i, Seq.fill(6 + rnd.nextInt(9))(
          vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      def sh(t: String) =
        t.split("\\s+").sliding(3).map(_.mkString(" ")).toSet
      for ((tn, td) <- Seq((1, 2), (2, 3))) {
        val brute = (for {
          (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
          j = {
            val (a, b) = (sh(ta), sh(tb))
            (a & b).size.toDouble / (a | b).size
          } if j >= tn.toDouble / td
        } yield (ia, ib)).toSet
        val out = Dedup.prefixFilterNearDups(
            docs.toDF("doc_id", "text"), "doc_id", "text", tn, td)
          .select("id_a", "id_b").as[(Long, Long)].collect().toSet
        assert(out == brute, s"seed=$seed t=$tn/$td")
      }
    }
  }

  test("rolling distinct == brute window scan on random activity") {
    for (seed <- Seq(2, 13)) {
      val rnd = new scala.util.Random(seed)
      val acts = (1 to 120).map { _ =>
        ("k", java.sql.Timestamp.valueOf(
          f"2024-05-${1 + rnd.nextInt(20)}%02d 0${rnd.nextInt(9)}:00:00"),
          rnd.nextInt(8).toLong)
      }
      val days = acts.map(_._2.toLocalDateTime.toLocalDate).distinct.sorted
      val (lo, hi) = (days.head, days.last)
      val w = 1 + rnd.nextInt(5)
      val brute = Iterator.iterate(lo)(_.plusDays(1))
        .takeWhile(!_.isAfter(hi)).map { d =>
          d.toString -> acts.filter { case (_, ts, _) =>
            val ad = ts.toLocalDateTime.toLocalDate
            !ad.isAfter(d) && ad.isAfter(d.minusDays(w))
          }.map(_._3).distinct.size.toLong
        }.toMap
      val out = Resample.rollingDistinct(
          acts.toDF("k", "ts", "u"), "k", "ts", "u", w)
        .collect().map(r => r.getDate(1).toString -> r.getLong(2)).toMap
      assert(out == brute, s"seed=$seed w=$w")
    }
  }

  test("isotonic fit == brute minimax and is monotone (mod 1ppm floors)") {
    for (seed <- Seq(4, 17, 31)) {
      val rnd = new scala.util.Random(seed)
      val bins = (1L to (3 + rnd.nextInt(8))).map(b =>
        (b, 1L + rnd.nextInt(9), rnd.nextInt(10).toLong))
        .map { case (b, n, p) => (b, n, math.min(n, p)) }
      def rate(i: Int, j: Int): Long = {
        val slice = bins.slice(i, j + 1)
        1000000L * slice.map(_._3).sum / slice.map(_._2).sum
      }
      val brute = bins.indices.map { k =>
        (0 to k).map(i => (k until bins.size)
          .map(j => rate(i, j)).min).max
      }
      val out = Calibration.isotonicFromBins(
          bins.toDF("bin", "n_docs", "n_pos"))
        .collect().sortBy(_.getLong(0))
        .map(r => r.getLong(r.fieldIndex("fitted_ppm")))
      assert(out.toSeq == brute.toSeq, s"seed=$seed bins=$bins")
    }
  }
}
