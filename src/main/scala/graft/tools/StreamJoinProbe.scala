package graft.tools

import org.apache.spark.sql.functions._

import graft.streaming.{StreamingHourPivot, StreamingJoin}

/** Dev probe: where do the stream-stream join's ~10 s go? Batch
  * durations + operator timings from StreamingQueryProgress.
  */
object StreamJoinProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Session.builder("stream-join-probe", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = "/root/testdata/sf0.1"
    val t0 = System.nanoTime()
    val purchases = StreamingHourPivot.eventsStream(spark, sfDir)
      .where(col("event_type") === "purchase" && col("user_id") % 3 === 0)
    val clicks = StreamingHourPivot.eventsStream(spark, sfDir)
      .where(col("event_type") === "click" && col("user_id") % 3 === 0)
    val joined = StreamingJoin.purchaseClickJoin(purchases, clicks, 600L)
    println(f"[sj] plan build: ${(System.nanoTime() - t0) / 1e9}%5.2f s")
    val t1 = System.nanoTime()
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("sj_probe").start()
    q.processAllAvailable()
    println(f"[sj] run: ${(System.nanoTime() - t1) / 1e9}%5.2f s  " +
      s"rows=${spark.table("sj_probe").count()}")
    q.recentProgress.foreach { p =>
      println(s"[sj] batch=${p.batchId} rows=${p.numInputRows} " +
        s"durationMs=${p.durationMs} stateRows=${
          p.stateOperators.map(_.numRowsTotal).mkString(",")}")
    }
    q.stop()
    spark.stop()
  }
}
