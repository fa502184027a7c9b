package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorMeanAggregator
import graft.sim.Similarity
import graft.sources.Tables

class VectorMeanSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Session.builder("vmean-test", "4").getOrCreate()
  import spark.implicits._

  test("vec_mean: exact quantized mean, order-independent") {
    val df = Seq(
      (0, Array(1.0f, 2.0f)), (0, Array(3.0f, 4.0f)), (1, Array(-1.0f, 0.5f)))
      .toDF("label", "v")
    val out = df.groupBy(col("label"))
      .agg(VectorMeanAggregator.vec_mean(col("v")).as("c"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(out(0) == Seq(2.0, 3.0))
    assert(out(1) == Seq(-1.0, 0.5))
    // order independence: repartition shuffles merge order
    val out2 = df.repartition(7).groupBy(col("label"))
      .agg(VectorMeanAggregator.vec_mean(col("v")).as("c"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(out == out2)
  }

  test("vec_mean agrees with the exploded labelCentroids operator") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val viaAgg = emb.groupBy(col("label"))
      .agg(VectorMeanAggregator.vec_mean(col("embedding")).as("c"))
      .select(col("label"), posexplode(col("c")))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val viaExplode = Similarity.labelCentroids(emb, "label", "embedding")
      .collect().map(r =>
        (r.getInt(0), r.getInt(1)) -> r.getAs[Double]("centroid")).toMap
    assert(viaAgg.size == viaExplode.size)
    viaExplode.foreach { case (k, v) => assert(viaAgg(k) == v, s"at $k") }
  }
}
