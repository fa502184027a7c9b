package graft.tools

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.text.Dedup

/** Dev probe: trace one candidate pair through each stage of the
  * simhash near-dup pipeline to find where a recall miss drops it.
  */
object SimhashMissProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Session.builder("simhash-miss-probe", "16").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val (a, b) = (800L, 3828L)
    val docs = Tables.documents(spark, d)
    // stage 1: candidates at 8 chunks
    val cand = Dedup.simhashNearDups(docs, "doc_id", "text",
      maxHamming = 15, chunks = 8)
    println("in candidates(8x8): " + cand
      .where(col("id_a") === a && col("id_b") === b).count())
    // stage 2: full pipeline
    val out = Dedup.simhashVerifiedNearDups(docs, "doc_id", "text",
      shingleN = 3, threshold = 0.5, maxHamming = 15)
    println("in final output: " + out
      .where(col("id_a") === a && col("id_b") === b).count())
    println("final rows: " + out.count())
    spark.stop()
  }
}
