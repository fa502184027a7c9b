package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerJobStart}

import graft.{Session, SparkEntry}

/** Where does headline wall time actually go? For each headline query
  * (or the names in SPARK_GRAFT_BENCH_ONLY), runs the bench's exact
  * timed action (fn + noop write) and splits the wall into:
  *
  *   - plan_s:   fn() + queryExecution.executedPlan force (driver-side
  *               analysis/optimization/physical planning)
  *   - task_s:   sum of executor task run time across all stages / cpus
  *               (the perfectly-parallel lower bound on execution wall)
  *   - stages/tasks: scheduling-overhead proxies
  *
  * wall − plan − task/cpus ≈ codegen compile + task scheduling + stage
  * barriers + driver work between jobs. The split decides WHERE to
  * optimize: plan-bound → simplify the query tree; task-bound →
  * per-row work or shuffles; neither → job-count/barrier overhead
  * (guide §1: measure first).
  */
object HeadlineProfile {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.builder("headline-profile").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var taskMs = 0L
    @volatile var stages = 0
    @volatile var tasks = 0L
    @volatile var jobs = 0
    @volatile var shuffleRead = 0L
    @volatile var shuffleWrite = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        taskMs += sc.stageInfo.taskMetrics.executorRunTime
        stages += 1
        tasks += sc.stageInfo.numTasks
        shuffleRead += sc.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead
        shuffleWrite += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
      }
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs += 1
    })

    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(',').toSet)
    val picked = graft.queries.Registry.all.filter(q =>
      only.map(_.contains(q.name)).getOrElse(q.headline))
    val runs = sys.env.get("SPARK_GRAFT_BENCH_RUNS").map(_.toInt).getOrElse(3)

    // same warm-up as Bench: don't charge first-query JVM costs
    {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types.DecimalType
      val li = spark.read.parquet(s"$sf/lineitem.parquet").limit(1000)
      val or = spark.read.parquet(s"$sf/orders.parquet").limit(1000)
      def m(c: org.apache.spark.sql.Column) = c.cast(DecimalType(12, 2))
      li.join(or, li("l_orderkey") === or("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)), sum(col("l_quantity")),
          sum(m(col("l_extendedprice")) *
            (lit(1).cast(DecimalType(4, 2)) -
              col("l_discount").cast(DecimalType(4, 2)))))
        .write.format("noop").mode("overwrite").save()
    }

    println(f"${"query"}%-28s ${"wall_s"}%8s ${"plan_s"}%8s ${"task_s"}%8s " +
      f"${"t/32"}%7s ${"jobs"}%5s ${"stg"}%4s ${"tasks"}%6s ${"shR_MB"}%7s ${"shW_MB"}%7s")
    picked.foreach { q =>
      val rows = (1 to runs).map { _ =>
        taskMs = 0; stages = 0; tasks = 0; jobs = 0
        shuffleRead = 0; shuffleWrite = 0
        val t0 = System.nanoTime()
        val df = q.fn(spark, sf)
        df.queryExecution.executedPlan // force planning
        val tPlan = (System.nanoTime() - t0) / 1e9
        df.write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        // let listener events drain so per-run stage counts are right
        // (listenerBus.waitUntilEmpty is private[spark]; a short sleep
        // suffices for a diagnostic split)
        Thread.sleep(200)
        (wall, tPlan, taskMs / 1000.0, jobs, stages, tasks,
          shuffleRead / 1e6, shuffleWrite / 1e6)
      }
      System.gc()
      val best = rows.minBy(_._1)
      println(f"${q.name}%-28s ${best._1}%8.2f ${best._2}%8.2f ${best._3}%8.2f " +
        f"${best._3 / 32}%7.2f ${best._4}%5d ${best._5}%4d ${best._6}%6d " +
        f"${best._7}%7.1f ${best._8}%7.1f")
    }
    spark.stop()
  }
}
