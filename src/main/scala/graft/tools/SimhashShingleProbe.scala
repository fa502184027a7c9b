package graft.tools

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.text.Dedup

/** Dev probe: simhash built over 3-gram SHINGLE features (instead of
  * unigram tokens) — background docs share few shingles, so their
  * signatures should decorrelate toward hamming≈32 and the
  * hamming<=15 verify set should collapse to ~the true pairs.
  */
object SimhashShingleProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Session.builder("simhash-shingle-probe", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1").foreach { d =>
      val docs = Tables.documents(spark, d)
      val ex = Dedup.shingleHashFrame(docs, "doc_id", "text", 3)
      val votes = ex.groupBy(col("id"))
        .agg(
          sum(when(shiftright(col("s"), 0).bitwiseAND(1L) === 1L, 1L)
            .otherwise(-1L)).as("v_0"),
          (1 until 64).map(b =>
            sum(when(shiftright(col("s"), b).bitwiseAND(1L) === 1L, 1L)
              .otherwise(-1L)).as(s"v_$b")): _*)
      val packed = (0 until 64).map(b =>
        when(col(s"v_$b") > 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce((a, b) => a.bitwiseOR(b))
      val hashed = votes.select(col("id"), packed.as("sh"))
      val banded = hashed.select(col("id"), col("sh"),
        posexplode(transform(sequence(lit(0), lit(15)),
          b => call_function("shiftright", col("sh"), (b * 4).cast("int"))
            .bitwiseAND(0xFL))))
        .withColumnsRenamed(Map("pos" -> "band", "col" -> "chunk"))
      val joined = banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
          col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("h"))
      val nCand = joined.count()
      val surv = joined.where(col("h") <= 15)
        .select(col("id_a"), col("id_b")).distinct()
      val survSet = surv.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val truePairs = Dedup.minhashNearDups(docs, "doc_id", "text",
        threshold = 0.5, numHashes = 32, bands = 16,
        estThresholdOpt = Some(0.35))
        .select(col("id_a"), col("id_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"[$d] shingle-simhash cand_rows=$nCand ham15_pairs=${survSet.size} " +
        s"true=${truePairs.size} true_missed=${(truePairs -- survSet).size}")
    }
    spark.stop()
  }
}
