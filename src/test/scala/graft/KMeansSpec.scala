package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.KMeans
import graft.sources.Tables

class KMeansSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Session.builder("kmeans-test", "4").getOrCreate()
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  private def vecDf(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")

  test("fit separates two well-separated blobs") {
    // two tight clusters around (10,0) and (0,10); seeds 0 and 1 land
    // one in each blob, so 2 iterations nail the partition
    val data = vecDf(Seq(
      0L -> Seq(10f, 0f), 2L -> Seq(11f, 1f), 4L -> Seq(9f, -1f),
      1L -> Seq(0f, 10f), 3L -> Seq(1f, 11f), 5L -> Seq(-1f, 9f)))
    val out = KMeans.fit(data, "vec_id", "embedding", k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out(0L) == out(2L) && out(2L) == out(4L))
    assert(out(1L) == out(3L) && out(3L) == out(5L))
    assert(out(0L) != out(1L))
  }

  test("equidistant point breaks ties to the smaller cluster id") {
    val data = vecDf(Seq(
      0L -> Seq(-2f, 0f), 1L -> Seq(2f, 0f), 2L -> Seq(0f, 0f)))
    val base = data.select(col("vec_id"), KMeans.quantize(col("embedding")).as("__qv"))
    val cents = KMeans.initCentroids(data, "vec_id", "embedding", 2)
    val assigned = KMeans.assign(base, cents)
      .select("vec_id", "cluster")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(assigned(2L) == 0) // tie between cluster 0 and 1 → 0
  }

  test("assignment pass is map-side only (no exchange)") {
    val emb = Tables.embeddings(spark, sf)
    val base = emb.select(col("vec_id"), KMeans.quantize(col("embedding")).as("__qv"))
    val cents = KMeans.initCentroids(emb, "vec_id", "embedding", 8)
    val plan = KMeans.assign(base, cents).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment should not shuffle:\n$plan")
  }

  test("centroid update is floor-of-mean and drops empty clusters") {
    val data = vecDf(Seq(0L -> Seq(0f, 0f), 1L -> Seq(1f, 1f)))
    val base = data.select(col("vec_id"), KMeans.quantize(col("embedding")).as("__qv"))
    // both rows assigned to cluster 0 → cluster 1 empty after update
    val assigned = base.withColumn("cluster", lit(0))
    val cents = KMeans.updateCentroids(assigned, dim = 2)
    assert(cents.ids == Seq(0))
    // mean of (0, 10000) = 5000 exactly
    assert(cents.cells.head.toSeq == Seq(5000L, 5000L))
  }

  test("balanced sample caps every cluster at m") {
    val out = KMeans.balancedSample(Tables.embeddings(spark, sf),
      "vec_id", "embedding", k = 8, iters = 2, m = 5)
    val sizes = out.groupBy("cluster").count().collect().map(_.getLong(1))
    assert(sizes.forall(_ <= 5))
    assert(out.select(max(col("rank"))).head().getInt(0) <= 5)
  }
}
