package graft.tools

import org.apache.spark.sql.functions._

import graft.{Session, sources}
import graft.sim.Similarity

/** Operating-point probe for the appended served-IVF exhibit: for each
  * (append modulus, nProbe), build the index on the base slice, append
  * the rest against frozen centroids, serve top-20, and report how
  * many of the exact brute-force top-20 the probe recovers. Picks the
  * declared operating point from measurement instead of hope.
  */
object IvfAppendProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Session.get("ivf-append-probe")
    graft.functions.VectorFunctions.register(spark)
    val emb = sources.Tables.embeddings(spark, sfDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val qvec = emb.where(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0).toArray
    val exact = Similarity.topKByQueryId(emb, "vec_id", "embedding", 0L, 20,
      Similarity.quantizedCosine).collect().map(_.getLong(0)).toSet

    for (m <- Seq(4, 10); nProbe <- Seq(13, 14, 15, 16)) {
      val dir = java.nio.file.Files.createTempDirectory("ivf_probe")
        .toString + s"/idx_$m"
      Similarity.buildAndWriteIvfIndex(
        emb.where(col("vec_id") % m =!= 0), "embedding", dir, nCells = 16)
      Similarity.appendToIvfIndex(
        emb.where(col("vec_id") % m === 0), "embedding", dir)
      val index = Similarity.readIvfIndex(spark, dir)
      val got = Similarity.ivfSearchVec(index, "vec_id", "embedding", qvec,
        k = 20, nProbe = nProbe, excludeId = Some(0L))
        .collect().map(_.getLong(0)).toSet
      println(s"[probe] mod=$m nProbe=$nProbe recovered=${(got & exact).size}/20")
    }
    spark.stop()
  }
}
