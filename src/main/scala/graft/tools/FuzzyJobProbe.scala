package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.functions._

import graft.{Session, sources}

/** Per-Spark-job wall times for the PRODUCTION fuzzy-join path (the
  * stage probe pins intermediates, which changes the job structure;
  * this one watches the real shape end-to-end).
  */
object FuzzyJobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Session.get("fuzzy-job-probe")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, j.time)
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val dt = (j.time - starts.getOrDefault(j.jobId, j.time)) / 1e3
        System.err.println(f"[job] id=${j.jobId}%3d ${dt}%7.2f s")
      }
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val wall = (for {a <- i.completionTime; b <- i.submissionTime}
          yield (a - b) / 1e3).getOrElse(-1.0)
        val m = i.taskMetrics
        System.err.println(f"[stage] id=${i.stageId}%3d tasks=${i.numTasks}%3d " +
          f"wall=${wall}%7.2f s cpu=${m.executorCpuTime / 1e9}%8.2f s " +
          f"runtime=${m.executorRunTime / 1e3}%8.2f s " +
          f"in=${m.inputMetrics.recordsRead}%9d sh_r=${m.shuffleReadMetrics.recordsRead}%9d " +
          f"sh_w=${m.shuffleWriteMetrics.recordsWritten}%9d  ${i.name.take(60)}")
      }
    })
    val entity = concat_ws(" ", col("p_name"), col("p_brand"),
      col("p_type"), col("p_size").cast("string"))
    val parts = sources.Tables.part(spark, sfDir)
      .select(col("p_partkey").as("id"), entity.as("entity"))
    parts.write.format("noop").mode("overwrite").save() // warm
    (1 to 2).foreach { i =>
      System.err.println(s"[probe] === run $i ===")
      val t0 = System.nanoTime()
      graft.text.FuzzyJoin.fuzzyJoinTop1(
        parts.where(col("id") % 2 === 0), parts.where(col("id") % 2 === 1),
        "id", "entity", threshold = 0.8)
        .write.format("noop").mode("overwrite").save()
      System.err.println(f"[probe] run $i total ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
