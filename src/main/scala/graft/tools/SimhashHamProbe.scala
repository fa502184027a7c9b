package graft.tools

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.text.Dedup

/** Dev probe: background-pair volume vs hamming bound for the 16x4-bit
  * simhash chunk banding — picks the verify-stage budget.
  */
object SimhashHamProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Session.builder("simhash-ham-probe", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { d =>
      val docs = Tables.documents(spark, d)
      val hashed = Dedup.simhashSignatures(docs, "doc_id", "text")
      val banded = hashed.select(col("id"), col("sh"),
        posexplode(transform(sequence(lit(0), lit(15)),
          b => call_function("shiftright", col("sh"), (b * 4).cast("int"))
            .bitwiseAND(0xFL))))
        .withColumnsRenamed(Map("pos" -> "band", "col" -> "chunk"))
      val pairsByHam = banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
          col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("h"))
        .where(col("h") <= 15)
        .distinct()
        .groupBy(col("h")).agg(count(lit(1)).as("n"))
        .orderBy(col("h")).collect()
      println(s"[$d] " + pairsByHam.map(r => s"h=${r.get(0)}:${r.getLong(1)}")
        .mkString(" "))
    }
    spark.stop()
  }
}
