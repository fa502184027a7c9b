package graft.tools

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.text.Dedup

/** Dev probe: compare the hashed-shingle sets of one pair. */
object SimhashMissProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Session.builder("simhash-miss-probe2", "8").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, d)
      .where(col("doc_id").isin(800L, 3828L))
    val ex = Dedup.shingleHashFrame(docs, "doc_id", "text", 3)
    val sets = ex.groupBy(col("id")).agg(collect_set(col("s")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val (sa, sb) = (sets(800L), sets(3828L))
    println(s"na=${sa.size} nb=${sb.size} common=${sa.intersect(sb).size} " +
      s"j=${sa.intersect(sb).size.toDouble / (sa.size + sb.size - sa.intersect(sb).size)}")
    spark.stop()
  }
}
