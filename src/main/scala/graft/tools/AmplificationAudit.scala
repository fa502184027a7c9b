package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

import graft.Session

/** Sweep every declared query for the fuzzy-join failure mode: AQE
  * coalesces a small-by-bytes exchange, and a downstream operator
  * amplifies the row count (or carries heavy per-row CPU) so the whole
  * query runs on ONE core. Flags stages that ran with a single task
  * but burned non-trivial CPU — each hit is a place where the plan
  * would not use a cluster at 100 TB either (AQE sizes partitions by
  * input bytes and cannot see amplification).
  *
  * Usage: runMain graft.tools.AmplificationAudit [sfDir] [cpuSecFloor]
  */
object AmplificationAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val floor = args.lift(1).map(_.toDouble).getOrElse(0.5)
    val spark = Session.get("amplification-audit")
    spark.sparkContext.setLogLevel("WARN")

    case class Hit(stageId: Int, wallSec: Double, cpuSec: Double,
        records: Long, name: String)
    val hits = new java.util.concurrent.ConcurrentLinkedQueue[Hit]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val cpu = i.taskMetrics.executorCpuTime / 1e9
        val wall = (for {a <- i.completionTime; b <- i.submissionTime}
          yield (a - b) / 1e3).getOrElse(0.0)
        if (i.numTasks == 1 && cpu >= floor)
          hits.add(Hit(i.stageId, wall, cpu,
            i.taskMetrics.shuffleReadMetrics.recordsRead
              + i.taskMetrics.inputMetrics.recordsRead,
            i.name.takeWhile(_ != '(').trim))
      }
    })

    var flagged = 0
    graft.queries.Registry.all.foreach { q =>
      hits.clear()
      val t0 = System.nanoTime()
      try q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case scala.util.control.NonFatal(e) =>
        println(f"[audit] ${q.name}%-32s ERROR ${e.getMessage.take(60)}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      // localCheckpoint blocks are only released when the RDD is GC'd
      // and the ContextCleaner runs; nudge so pinned frames from earlier
      // queries don't squeeze later queries' execution memory
      if (sys.env.contains("SPARK_GRAFT_AUDIT_GC")) System.gc()
      // localCheckpoint pins (single partition by design when tiny) are
      // expected; only flag hits that dominate the query's wall.
      val bad = hits.toArray(Array.empty[Hit]).filter(_.cpuSec >= floor)
      if (bad.nonEmpty) {
        flagged += 1
        println(f"[audit] ${q.name}%-32s total=$dt%6.2f s  " +
          bad.sortBy(-_.cpuSec).take(3).map(h =>
            f"stage${h.stageId}:cpu=${h.cpuSec}%.1fs/wall=${h.wallSec}%.1fs/in=${h.records}")
            .mkString(" "))
      }
    }
    println(s"[audit] done: $flagged queries with 1-task stages >= ${floor}s cpu")
    spark.stop()
  }
}
