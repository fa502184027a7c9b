package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

import graft.Session
import graft.ops.BloomJoin

/** Scale probe for the runtime Bloom-pruned join: N synthetic fact
  * rows against a selective build side (0.2% of keys), plain join vs
  * bloom-pruned join, reporting wall AND total shuffle-write bytes
  * (the quantity the prune exists to cut — at a real cluster that is
  * the network). Expectation: pruned shuffle ≈ (selectivity + fpp) of
  * the plain fact shuffle.
  *
  * Usage: runMain graft.tools.BloomJoinProbe [factMillions]
  */
object BloomJoinProbe {
  def main(args: Array[String]): Unit = {
    val nM = args.headOption.map(_.toInt).getOrElse(20)
    val n = nM * 1000000L
    val spark = Session.get("bloomjoin-probe")
    spark.sparkContext.setLogLevel("WARN")
    // force the fact-fact SHUFFLE join the prune exists for — at 100 TB
    // neither side of a fact-fact join broadcasts; locally the 40k-row
    // build would, and the probe would measure nothing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(
          s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    val fact = spark.range(n)
      .select(pmod(xxhash64(col("id")), lit(n)).as("k"),
        (col("id") % 1000).as("v"))
    // build: every 500th key — 0.2% selectivity, disjoint derivation
    val build = spark.range(n / 500)
      .select((col("id") * 500).as("bk"), lit(1L).as("w"))

    def run(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      val rows = mk.groupBy().agg(count(lit(1)), sum(col("v"))).head()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"workload":"bloom_join_$label","fact_rows":$n,"joined":${rows.getLong(0)},"seconds":$sec%.2f,"shuffle_mb":${shuffleBytes.get() / 1048576}}""")
    }

    run("plain") {
      fact.join(build, col("k") === col("bk"))
    }
    run("pruned") {
      BloomJoin.bloomPrunedJoin(fact, build, "k", "bk")
    }
    spark.stop()
  }
}
