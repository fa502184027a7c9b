package graft.tools

import org.apache.spark.sql.functions._

import graft.{Session, SparkEntry}
import graft.sim.RandomProjection
import graft.sources.Tables

/** Measures the candidate-recall operating point of the JL
  * random-projection ANN on the actual test corpora: for each SF and
  * nProj, the projected-distance rank of the WORST true-top-20
  * neighbour — the minimum candidate count C for complete recall.
  *
  * Usage: runMain graft.tools.RpProbe
  */
object RpProbe {
  def main(args: Array[String]): Unit = {
    val spark = Session.builder("rp-probe", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1");
         nProj <- Seq(16, 32, 48)) {
      val d = s"/root/testdata/$sf"
      val emb = Tables.embeddings(spark, d)
      val n = emb.count()
      val proj = emb.select(col("vec_id"), col("embedding"),
        RandomProjection.project(col("embedding"), nProj, 64).as("p"))
      val q = proj.where(col("vec_id") === 0L)
        .select(col("embedding").as("qv"), col("p").as("qp"))
      val ranked = proj.where(col("vec_id") =!= 0L)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          RandomProjection.projDist2(col("p"), col("qp")).as("pd2"),
          graft.functions.VectorFunctions
            .q_vec_cosine(col("embedding"), col("qv")).as("cos"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("pd2").asc, col("vec_id"))
      val withRank = ranked.withColumn("prank", row_number().over(w))
      val worst = withRank
        .orderBy(col("cos").desc, col("vec_id")).limit(20)
        .agg(max(col("prank"))).head().getInt(0)
      println(s"[rp] $sf n=$n nProj=$nProj worstTrueTop20ProjRank=$worst")
    }
    spark.stop()
  }
}
