package graft.tools

import graft.sources.Tables

/** r15 optimization probe: how much of per-query "planning" time is
  * actually spark.read.parquet metadata setup (file listing + footer
  * schema inference), re-paid by EVERY query because Tables builds a
  * fresh reader per call? HeadlineProfile put q5 at 0.62 s of plan
  * time for a 6-table join.
  */
object ReadSetupProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Session.builder("read-setup").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def timeIt(tag: String, reps: Int)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[readsetup] $tag%-38s med=${ts(ts.length / 2)}%6.3f " +
        ts.map(t => f"$t%.3f").mkString("[", " ", "]"))
    }

    val tables = Seq("region", "nation", "customer", "supplier",
      "orders", "lineitem")
    timeIt("6-table read setup (fresh readers)", 7) {
      tables.foreach(t => Tables(spark, sf, t).schema)
    }
    val schemas = tables.map(t => t -> Tables(spark, sf, t).schema).toMap
    timeIt("6-table read setup (schema given)", 7) {
      tables.foreach(t => spark.read.schema(schemas(t))
        .parquet(s"$sf/$t.parquet").schema)
    }
    // full q5 analysis+optimization+physical planning, fresh readers
    val q5 = graft.queries.Registry.all.find(_.name == "q5_region_revenue").get
    timeIt("q5 fn() + executedPlan (fresh)", 7) {
      q5.fn(spark, sf).queryExecution.executedPlan
    }
    spark.stop()
  }
}
