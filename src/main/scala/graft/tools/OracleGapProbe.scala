package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sim.Similarity
import graft.sources.Tables
import graft.text.Dedup

/** Dev probe: measures whether each approximate operator's output at
  * its declared operating point EQUALS the exact result the DuckDB
  * oracle computes — the precondition for promoting the remaining
  * rows-only queries to full oracle-hash checks.
  *
  * For each SF dir: LSH/IVF top-k ID recall vs exact quantized top-k;
  * LSH embedding near-dup pair set (sampled slice) vs exact all-pairs;
  * simhash candidate recall vs the exact j>=0.5 pair set.
  */
object OracleGapProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Session.builder("oracle-gap-probe", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(spark)
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    dirs.foreach { d => probe(spark, d) }
    spark.stop()
  }

  private def idSet(df: DataFrame): Set[Long] =
    df.select(col("vec_id")).collect().map(_.getLong(0)).toSet

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def probe(spark: SparkSession, d: String): Unit = {
    val emb = Tables.embeddings(spark, d)
    val docs = Tables.documents(spark, d)
    val cos = graft.functions.VectorFunctions.q_vec_cosine _

    val exactTopK = idSet(Similarity.topKByQueryId(emb, "vec_id", "embedding",
      queryId = 0L, k = 20, scoreFn = cos))
    val lshTopK = idSet(Similarity.lshTopK(emb, "vec_id", "embedding",
      queryId = 0L, k = 20, numPlanes = 32, bands = 8))
    val ivfTopK = idSet(Similarity.ivfTopK(emb, "vec_id", "embedding",
      queryId = 0L, k = 20, nCells = 16, nProbe = 4, scoreFn = cos))
    println(s"[$d] lsh_topk overlap=${(exactTopK & lshTopK).size}/20 " +
      s"ivf_topk overlap=${(exactTopK & ivfTopK).size}/20")

    val sample = emb.where(col("vec_id") % 5 === 0)
    val exactPairs = pairSet(Similarity.nearDupPairs(sample, "vec_id",
      "embedding", threshold = 0.35))
    val lshPairsSampled = pairSet(
      Similarity.lshNearDupPairs(emb, "vec_id", "embedding",
        threshold = 0.35, numPlanes = 32, bands = 8)
        .where(col("id_a") % 5 === 0 && col("id_b") % 5 === 0))
    println(s"[$d] emb_neardup exact=${exactPairs.size} " +
      s"lsh_restricted=${lshPairsSampled.size} " +
      s"missed=${(exactPairs -- lshPairsSampled).size} " +
      s"extra=${(lshPairsSampled -- exactPairs).size}")

    val minhashPairs = pairSet(Dedup.minhashNearDups(docs, "doc_id", "text",
      threshold = 0.5, numHashes = 32, bands = 16,
      estThresholdOpt = Some(0.35))
      .withColumnsRenamed(Map("id_a" -> "id_a", "id_b" -> "id_b")))
    val simhashCands = pairSet(Dedup.simhashNearDups(docs, "doc_id", "text",
      maxHamming = 16))
    val hamOfTrue = Dedup.simhashNearDups(docs, "doc_id", "text",
      maxHamming = 64)
    val trueWithHam = hamOfTrue.as("s").join(
      Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.5,
        numHashes = 32, bands = 16, estThresholdOpt = Some(0.35))
        .select(col("id_a"), col("id_b")).as("m"),
      Seq("id_a", "id_b"))
      .agg(max(col("hamming")), min(col("hamming")), count(lit(1)))
      .collect()(0)
    println(s"[$d] simhash cands(h<=16)=${simhashCands.size} " +
      s"true_pairs=${minhashPairs.size} " +
      s"true_missed_by_cands=${(minhashPairs -- simhashCands).size} " +
      s"true_pair_hamming max=${trueWithHam.get(0)} min=${trueWithHam.get(1)} n=${trueWithHam.get(2)}")
  }
}
