package graft.tools

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.text.Dedup

/** Dev probe: Hamming distance of specific doc pairs under the simhash
  * signatures — diagnoses recall misses of a chunk-banding operating
  * point on the current testdata generation.
  */
object SimhashPairProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Session.builder("simhash-pair-probe", "8").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ids = args.drop(1).map(_.toLong)
    val docs = Tables.documents(spark, d)
    val hashed = Dedup.simhashSignatures(docs, "id" :: Nil
      match { case _ => "doc_id" }, "text")
      .where(col("id").isin(ids: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.combinations(2).foreach { case Array(a, b) =>
      val x = hashed(a) ^ hashed(b)
      println(s"pair ($a,$b): hamming=${java.lang.Long.bitCount(x)} " +
        s"xor=${java.lang.Long.toBinaryString(x)}")
    }
    spark.stop()
  }
}
