package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Collocations

class CollocationsSpec extends AnyFunSuite {
  lazy val spark: SparkSession =
    Session.builder("colloc-test", "4").getOrCreate()
  import spark.implicits._

  test("lift replays the staged ppm formula; min support prunes") {
    // "a b" 3×, "a c" 1×, "c a" 2× → B = 6 bigrams.
    // marginals: n_x(a)=4, n_x(c)=2; n_y(b)=3, n_y(c)=1, n_y(a)=2.
    val docs = Seq("a b", "a b", "a b", "a c", "c a", "c a")
      .toDF("text")
    val out = Collocations.topCollocations(docs, "text",
        minCount = 2L, topK = 10)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_xy"), r.getAs[Long]("n_x"),
          r.getAs[Long]("n_y"), r.getAs[Long]("lift_ppm"))).toMap
    // (a,b): ((3·1e6 div 4)·6) div 3 = (750000·6) div 3 = 1500000
    assert(out(("a", "b")) == (3L, 4L, 3L, 1500000L))
    // (c,a): ((2·1e6 div 2)·6) div 2 = 3000000
    assert(out(("c", "a")) == (2L, 2L, 2L, 3000000L))
    // (a,c) has n_xy = 1 < minCount → pruned
    assert(!out.contains(("a", "c")) && out.size == 2)
  }

  test("ordering is lift desc with (w1, w2) tiebreak and topK caps") {
    val docs = Seq.fill(5)("x y").toDF("text")
      .union(Seq.fill(5)("p q").toDF("text"))
    val out = Collocations.topCollocations(docs, "text", 2L, 1)
      .collect()
    assert(out.length == 1)
    // equal lift (symmetric corpus) → lexicographic (w1, w2): p q first
    assert(out(0).getString(0) == "p" && out(0).getString(1) == "q")
  }

  test("textrank: hand-computed star-graph trajectory, stopwords dropped") {
    // edges (symmetric distinct): alpha-beta, beta-gamma, beta-delta;
    // doc 3 contributes only stopword pairs -> filtered out entirely.
    // outdeg: beta 3, others 1. teleport 150000, damping 85/100:
    //  r1: beta = 150000 + (3e6*85) div 100 = 2700000
    //      leaf = 150000 + ((1e6 div 3)*85) div 100 = 433333
    //  r2: beta = 150000 + (3*433333*85) div 100 = 1254999
    //      leaf = 150000 + ((2700000 div 3)*85) div 100 = 915000
    //  r3: beta = 150000 + (3*915000*85) div 100 = 2483250
    //      leaf = 150000 + ((1254999 div 3)*85) div 100 = 505583
    val docs = Seq("alpha beta gamma", "alpha beta delta", "the alpha the")
      .toDF("text")
    val out = Collocations.textRankKeywords(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.size == 4 && !out.contains("the"))
    assert(out("beta") == 2483250L)
    assert(out("alpha") == 505583L)
    assert(out("gamma") == 505583L && out("delta") == 505583L)
  }
}
