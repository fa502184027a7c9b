package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

import graft.Session

/** Per-stage task-time breakdown for ONE declared query (name in
  * args(0) or SPARK_GRAFT_BENCH_ONLY): runs it warm (2nd run), prints
  * every stage's task count, summed executor run time, shuffle bytes
  * and the stage name/callsite — the map from wall time to operator.
  */
object StageBreakdown {
  def main(args: Array[String]): Unit = {
    val name = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_BENCH_ONLY"))
      .getOrElse("q_minhash_lsh_neardup")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.builder("stage-breakdown").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.queries.Registry.all.find(_.name == name)
      .getOrElse(sys.error(s"unknown query $name"))

    @volatile var record = false
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long, Long, Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (record) {
          val si = sc.stageInfo
          rows += ((si.stageId, si.numTasks,
            si.taskMetrics.executorRunTime,
            si.taskMetrics.shuffleReadMetrics.totalBytesRead,
            si.taskMetrics.shuffleWriteMetrics.bytesWritten,
            si.name.linesIterator.next().take(90)))
        }
    })

    q.fn(spark, sf).write.format("noop").mode("overwrite").save() // warm
    spark.sharedState.cacheManager.clearCache()
    Thread.sleep(300)
    record = true
    val t0 = System.nanoTime()
    q.fn(spark, sf).write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    record = false
    println(f"[stages] $name wall=$wall%.2f s, ${rows.size} stages")
    println(f"[stages] ${"id"}%5s ${"tasks"}%5s ${"run_ms"}%8s ${"shR_KB"}%8s ${"shW_KB"}%8s  name")
    rows.sortBy(_._1).foreach { case (id, n, ms, r, w, nm) =>
      println(f"[stages] $id%5d $n%5d $ms%8d ${r / 1024}%8d ${w / 1024}%8d  $nm")
    }
    spark.stop()
  }
}
