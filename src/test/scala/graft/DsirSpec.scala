package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sampling
import graft.text.Dsir

class DsirSpec extends AnyFunSuite {
  lazy val spark: SparkSession =
    Session.builder("dsir-test", "4").getOrCreate()
  import spark.implicits._

  // (id, lang, text): en is the target slice; doc 4 shares the
  // target's vocabulary, doc 5 is pure off-target vocabulary.
  private val docs = Seq(
    (1L, "en", "alpha beta alpha"),
    (2L, "en", "alpha gamma"),
    (3L, "de", "alpha zeta"),
    (4L, "de", "alpha beta gamma"),
    (5L, "de", "omega psi chi omega"),
    (6L, "de", "   ")).toDF("doc_id", "lang", "text")

  private lazy val model = Dsir.importanceModel(
    docs.where(col("lang") === "en"), docs, "text", 64)
  private lazy val w = Dsir.weights(docs, "doc_id", "text", model, 64)

  test("model replays the exact BigInt ratio formula") {
    // Recompute ratios independently from raw token→bucket counts.
    def bucket(t: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 13), 16) % 64
    }
    val all = Seq("alpha", "beta", "alpha", "alpha", "gamma", "alpha",
      "zeta", "alpha", "beta", "gamma", "omega", "psi", "chi", "omega")
    val tgt = Seq("alpha", "beta", "alpha", "alpha", "gamma")
    val rc = all.groupBy(bucket).view.mapValues(_.size).toMap
    val tc = tgt.groupBy(bucket).view.mapValues(_.size).toMap
    val (bigT, bigR) = (BigInt(tgt.size + 64), BigInt(all.size + 64))
    val expected = rc.map { case (b, rn) =>
      b -> (BigInt(tc.getOrElse(b, 0) + 1) * bigR * 1000000 /
        (BigInt(rn + 1) * bigT)).toLong
    }
    val got = model.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("weights rank target-affine docs above off-target docs") {
    val byId = w.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("weight_ppm"))).toMap
    assert(!byId.contains(6L)) // blank doc excluded
    assert(byId(4L)._1 == 3L)
    // doc 4 shares every token with the target; doc 5 shares none.
    assert(byId(4L)._2 > byId(5L)._2)
    // target members themselves score at least as high as off-target.
    assert(byId(1L)._2 > byId(5L)._2)
  }

  test("systematic resample draws exactly n with ∝-weight counts") {
    val pool = Seq((1L, 70L), (2L, 20L), (3L, 10L), (4L, 0L))
      .toDF("id", "wt")
    val out = Sampling.systematicResample(pool, "id", "wt", n = 10)
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("weight"),
        r.getAs[Long]("times_drawn")))
    // line order is (id % 256, id) → 1:[0,70) 2:[70,90) 3:[90,100);
    // points u_j = (2j+1)*5 = 5,15,…,95 → 7 in doc1, 2 in doc2, 1 in doc3.
    assert(out.toSet == Set((1L, 70L, 7L), (2L, 20L, 2L), (3L, 10L, 1L)))
    assert(out.map(_._3).sum == 10L) // zero-weight row never drawn
  }
}
