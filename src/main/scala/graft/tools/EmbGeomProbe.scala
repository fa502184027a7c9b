package graft.tools

import org.apache.spark.sql.functions._

import graft.sim.Similarity
import graft.sources.Tables

/** Dev probe: embedding-corpus geometry — corpus sizes per SF, cosine
  * of query 0's exact top-k (how similar are "neighbours" really?),
  * and IVF nProbe needed for full top-k recall.
  */
object EmbGeomProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Session.builder("emb-geom-probe", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(spark)
    val cos = graft.functions.VectorFunctions.q_vec_cosine _
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1").foreach { d =>
      val emb = Tables.embeddings(spark, d)
      val n = emb.count()
      val topk = Similarity.topKByQueryId(emb, "vec_id", "embedding",
        queryId = 0L, k = 20, scoreFn = cos).collect()
      val scores = topk.map(_.getDouble(1))
      println(f"[$d] n=$n top20 cos max=${scores.head}%.3f " +
        f"min=${scores.last}%.3f ids=${topk.take(5).map(_.getLong(0)).mkString(",")}")
      val exact = topk.map(_.getLong(0)).toSet
      Seq(4, 6, 8, 10, 12).foreach { nProbe =>
        val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", 0L, 20,
          nCells = 16, nProbe = nProbe, scoreFn = cos).collect()
          .map(_.getLong(0)).toSet
        print(s" ivf(nProbe=$nProbe)=${(exact & ivf).size}")
      }
      println()
      // distribution: how many pairs above cos thresholds in the %5 slice
      val sample = emb.where(col("vec_id") % 5 === 0)
      Seq(0.35, 0.5, 0.7, 0.8).foreach { t =>
        val c = Similarity.nearDupPairs(sample, "vec_id", "embedding", t).count()
        print(s" pairs(cos>=$t)=$c")
      }
      println()
    }
    spark.stop()
  }
}
