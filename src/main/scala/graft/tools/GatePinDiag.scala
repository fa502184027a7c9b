package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel.DISK_ONLY

import graft.Session

/** Diagnostic for GatePinProbe's internal inconsistency (fat-pin arm
  * cheaper than one measured scorer pass): time the SAME scorer
  * expression in the distinct evaluation contexts the arms use, twice
  * each, to separate real per-context cost from JIT/codegen effects.
  */
object GatePinDiag {
  def main(args: Array[String]): Unit = {
    val n = 1000000L
    val rounds = 12
    val spark = Session.builder("gate-pin-diag").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "128")
    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val vocab = typedLit((0 until 5000).map(i => s"w$i"))
    val docs = spark.range(0L, n, 1L, 128)
      .select(col("id").as("doc_id"),
        concat(lit("l"), pmod(col("id"), lit(5))).as("lang"),
        concat_ws(" ", transform(sequence(lit(0), lit(99)),
          i => element_at(vocab,
            pmod(xxhash64(col("id"), i), lit(5000)).cast("int") + 1)))
          .as("text"))
      .persist(DISK_ONLY)
    docs.count()
    def score(text: org.apache.spark.sql.Column) = pmod(
      aggregate(sequence(lit(1), lit(rounds)), lit(0L),
        (acc, i) => acc.bitwiseXOR(xxhash64(text, i))),
      lit(10000L))
    // Does persist+count materialize a derived column? Build the fat
    // pin with count(), then read q FROM the pin: if the cache holds
    // q, the read is pin-scan-cheap; if count() skipped building it,
    // the read pays the scorer now.
    locally {
      val p = docs.withColumn("q", score(col("text"))).persist(DISK_ONLY)
      timed("fatpin build via count()") { p.count() }
      timed("read q from fat pin") { p.agg(sum(col("q"))).head() }
      timed("read q from fat pin (2nd)") { p.agg(sum(col("q"))).head() }
      p.unpersist(true)
    }
    // codegen-chain scorer (no HOF): stable across contexts?
    def chainScore(text: org.apache.spark.sql.Column, r: Int) = pmod(
      (1 to r).foldLeft(lit(0L))((h, _) => xxhash64(text, h)),
      lit(10000L))
    for (pass <- 1 to 2) {
      timed(s"chain select+agg pass $pass") {
        docs.select(chainScore(col("text"), rounds).as("q"))
          .agg(sum(col("q"))).head()
      }
      timed(s"chain narrow+pin pass $pass") {
        val p = docs.select(col("doc_id"), col("lang"),
          chainScore(col("text"), rounds).as("q")).persist(DISK_ONLY)
        p.count(); p.unpersist(true)
      }
    }
    for (pass <- 1 to 2) {
      timed(s"select+agg pass $pass") {
        docs.select(score(col("text")).as("q")).agg(sum(col("q"))).head()
      }
      timed(s"withColumn+fatpin pass $pass") {
        val p = docs.withColumn("q", score(col("text"))).persist(DISK_ONLY)
        p.count(); p.unpersist(true)
      }
      timed(s"narrow select+pin pass $pass") {
        val p = docs.select(col("doc_id"), col("lang"),
          score(col("text")).as("q")).persist(DISK_ONLY)
        p.count(); p.unpersist(true)
      }
      timed(s"corpus move pass $pass") {
        val p = docs.select(col("doc_id"), col("lang"), col("text"))
          .persist(DISK_ONLY)
        p.count(); p.unpersist(true)
      }
    }
    spark.stop()
  }
}
