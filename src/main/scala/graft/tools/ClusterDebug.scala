package graft.tools

import org.apache.spark.sql.functions._

import graft.Session
import graft.sources.Tables
import graft.text.Dedup

object ClusterDebug {
  def main(args: Array[String]): Unit = {
    val spark = Session.builder("cl-debug", "8").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sel = Tables.documents(spark, "/root/testdata/sf0.01")
      .where(col("doc_id") % 7 === 0)
    val pairs = Dedup.ngramJaccardPairs(sel, "doc_id", "text", 3, 0.01)
      .select(col("id_a"), col("id_b"))
    println("pairs: " + pairs.count())
    val out = Dedup.nearDupClusters(sel.select(col("doc_id")), "doc_id", pairs)
    val m = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    println("rep(14)=" + m(14L) + " rep(63)=" + m(63L) + " rep(35)=" + m(35L))
    spark.stop()
  }
}
