package graft.tools

import graft.Session
import graft.ingest.{Discovery, Normalize}

/** Timing probe: detection phase vs full pipeline on a many-file input. */
object DetectProbe {
  def main(args: Array[String]): Unit = {
    val in = args(0)
    val spark = Session.get("detect-probe")
    val t0 = System.nanoTime()
    val files = Discovery.selectTripFiles(Discovery.discoverParquet(spark, in))
    println(f"[probe] listing: ${(System.nanoTime() - t0) / 1e9}%.2f s, files=${files.size}")
    val t1 = System.nanoTime()
    val result = Normalize.normalizedTrips(spark, files)
    println(f"[probe] detection+plan: ${(System.nanoTime() - t1) / 1e9}%.2f s, skipped=${result.skipped.size}")
    val t2 = System.nanoTime()
    println("[probe] rows=" + result.trips.map(_.count()).getOrElse(0L))
    println(f"[probe] count exec: ${(System.nanoTime() - t2) / 1e9}%.2f s")

    import org.apache.spark.sql.functions._
    val trips = result.trips.get
    def phase(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[probe] $name: ${(System.nanoTime() - t) / 1e9}%.2f s")
    }
    phase("normalized-noop")(trips)
    phase("no-srcpath-noop")(trips.drop("src_path"))
    import graft.ingest.{Normalize, PathMeta}
    import spark.implicits._
    val meta = files.map(PathMeta.fileMeta)
      .flatMap(m => Normalize.pathKeyVariants(m.path)
        .map(k => (k, m.taxiType, m.expectedYear, m.expectedMonth)))
      .toDF("src_path", "taxi_type", "exp_year", "exp_month")
    val joined = trips.where(col("pickup_datetime").isNotNull)
      .join(broadcast(meta), Seq("src_path"))
    phase("with-meta-join-noop")(joined)
    val pivoted = graft.ops.HourPivot.pivot(
      joined.withColumn("pickup_place", col("pickup_location")),
      col("pickup_datetime"), Seq("taxi_type", "pickup_place"),
      None, "date")
    phase("full-pivot-noop")(pivoted)
    spark.stop()
  }
}
