package graft.tools

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.text.Dedup

/** Dev probe: replicate simhashVerifiedNearDups stage-by-stage over the
  * full corpus and locate where the traced pair disappears.
  */
object SimhashMissProbe3 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Session.builder("simhash-miss-probe3", "16").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val (ia, ib) = (800L, 3828L)
    val docs = Tables.documents(spark, d)
    val ex = Dedup.shingleHashFrame(docs, "doc_id", "text", 3)
      .localCheckpoint(true)
    val sigs = Dedup.simhashSignaturesFrom(ex)
    val pairSigs = sigs.where(col("id").isin(ia, ib))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    println(s"hamming(from pinned ex) = " +
      java.lang.Long.bitCount(pairSigs(ia) ^ pairSigs(ib)))
    // candidate stage at 8 chunks of 8 bits
    val bits = 8
    val mask = (1L << bits) - 1
    val banded = sigs.select(col("id"), col("sh"),
      posexplode(transform(sequence(lit(0), lit(7)),
        b => call_function("shiftright", col("sh"), (b * bits).cast("int"))
          .bitwiseAND(mask))))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "chunk"))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
        col("a.id") < col("b.id"))
      .where(bit_count(col("a.sh").bitwiseXOR(col("b.sh"))) <= 15)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    println("pair in candidates: " +
      cand.where(col("id_a") === ia && col("id_b") === ib).count())
    // verify stage
    val sh = ex.groupBy(col("id")).agg(collect_set(col("s")).as("sh"))
    val ver = cand
      .join(sh.withColumnsRenamed(Map("id" -> "id_a", "sh" -> "sh_a")), Seq("id_a"))
      .join(sh.withColumnsRenamed(Map("id" -> "id_b", "sh" -> "sh_b")), Seq("id_b"))
      .withColumn("common", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("common") / (size(col("sh_a")) + size(col("sh_b")) - col("common")))
    println("pair verify row: " + ver
      .where(col("id_a") === ia && col("id_b") === ib)
      .select("common", "jaccard").collect().mkString(", "))
    spark.stop()
  }
}
