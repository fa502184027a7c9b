package graft.tools

import graft.sources.Tables
import graft.text.Dedup

/** Dev probe: does the zip-form shingle plan re-evaluate the tokenizer
  * regex per slice? Count regexp occurrences in the optimized plan.
  */
object ShingleExplain {
  def main(args: Array[String]): Unit = {
    val spark = graft.Session.builder("shingle-explain", "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = Dedup.shingleHashFrame(docs, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    val nSplit = "split\\(".r.findAllIn(plan).length
    println(s"[ex] split() occurrences in physical plan: $nSplit")
    println(plan.linesIterator.take(25).mkString("\n"))
    spark.stop()
  }
}
