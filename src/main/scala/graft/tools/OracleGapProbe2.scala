package graft.tools

import org.apache.spark.sql.functions._

import graft.sim.Similarity
import graft.sources.Tables
import graft.text.Dedup

/** Dev probe round 2: candidate configs for promoting the approximate
  * queries to exact-oracle checks. Measures, per SF:
  *  - LSH top-k recall at 16 bands x 2 bits (vs 8 x 4);
  *  - IVF nProbe in 13..16 for full top-20 recall;
  *  - LSH near-dup (sampled slice) missed pairs at 16 x 2;
  *  - simhash 16x4-bit chunk banding: candidate volume, survivors of
  *    hamming<=15, and set-diff vs the exact j>=0.5 pair set.
  */
object OracleGapProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Session.builder("oracle-gap-probe2", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(spark)
    val cos = graft.functions.VectorFunctions.q_vec_cosine _
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1").foreach { d =>
      val emb = Tables.embeddings(spark, d)
      val docs = Tables.documents(spark, d)

      val exact = Similarity.topKByQueryId(emb, "vec_id", "embedding", 0L, 20,
        cos).collect().map(_.getLong(0)).toSet
      val lsh16 = Similarity.lshTopK(emb, "vec_id", "embedding", 0L, 20,
        numPlanes = 32, bands = 16).collect().map(_.getLong(0)).toSet
      println(s"[$d] lsh16x2_topk_overlap=${(exact & lsh16).size}/20")
      (13 to 16).foreach { nProbe =>
        val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", 0L, 20,
          nCells = 16, nProbe = nProbe, scoreFn = cos).collect()
          .map(_.getLong(0)).toSet
        print(s" ivf(nProbe=$nProbe)=${(exact & ivf).size}")
      }
      println()

      val sample = emb.where(col("vec_id") % 5 === 0)
      val exactPairs = Similarity.nearDupPairs(sample, "vec_id", "embedding",
        0.35).select(col("id_a"), col("id_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val lshPairs = Similarity.lshNearDupPairs(emb, "vec_id", "embedding",
        threshold = 0.35, numPlanes = 32, bands = 16)
        .where(col("id_a") % 5 === 0 && col("id_b") % 5 === 0)
        .select(col("id_a"), col("id_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"[$d] emb_neardup16x2 exact=${exactPairs.size} " +
        s"missed=${(exactPairs -- lshPairs).size} extra=${(lshPairs -- exactPairs).size}")

      // simhash 16x4 chunk banding with hamming<=15 prefilter
      val hashed = Dedup.simhashSignatures(docs, "doc_id", "text")
      val banded = hashed.select(col("id"), col("sh"),
        posexplode(transform(sequence(lit(0), lit(15)),
          b => call_function("shiftright", col("sh"), (b * 4).cast("int"))
            .bitwiseAND(0xFL))))
        .withColumnsRenamed(Map("pos" -> "band", "col" -> "chunk"))
      val joined = banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
          col("a.id") < col("b.id"))
      val nCand = joined.count()
      val surv = joined
        .where(bit_count(col("a.sh").bitwiseXOR(col("b.sh"))) <= 15)
        .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
      val survSet = surv.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val truePairs = Dedup.minhashNearDups(docs, "doc_id", "text",
        threshold = 0.5, numHashes = 32, bands = 16,
        estThresholdOpt = Some(0.35))
        .select(col("id_a"), col("id_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"[$d] simhash16x4 cand_rows=$nCand ham15_pairs=${survSet.size} " +
        s"true=${truePairs.size} true_missed=${(truePairs -- survSet).size}")
    }
    spark.stop()
  }
}
