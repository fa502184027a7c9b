package graft.tools

import org.apache.spark.sql.functions._

import graft.Session
import graft.pipeline.WideTablePipeline

/** Throughput benchmark on the reference's OWN workload shape: generate
  * N taxi-dialect rows (deterministic), run the wide-table pipeline,
  * report rows/s — directly comparable to the reference's published
  * 4.33M input rows/s on 8 cores (/root/reference/performance.md:33).
  *
  * Usage: runMain graft.tools.TaxiBench [numRowsMillions] [files]
  */
object TaxiBench {
  def main(args: Array[String]): Unit = {
    val millions = args.headOption.map(_.toInt).getOrElse(50)
    val nFiles = args.lift(1).map(_.toInt).getOrElse(4)
    val n = millions.toLong * 1000000L
    val spark = Session.get("taxi-bench")
    import java.nio.file.Files
    val out = Files.createTempDirectory("taxi_bench_out").toString

    // reuse a previously generated input via GRAFT_TAXI_INPUT for
    // stable repeat measurements
    val in = sys.env.getOrElse("GRAFT_TAXI_INPUT", {
      val dir = Files.createTempDirectory("taxi_bench_in").toString
      // deterministic synthetic yellow-dialect month: ~30 days × 24 h,
      // 265 zones, hash-spread rows
      val perFile = n / nFiles
      (0 until nFiles).foreach { f =>
        spark.range(perFile)
          .select(
            timestamp_seconds(lit(1672531200L) + // 2023-01-01 UTC
              pmod(xxhash64(col("id") + f * perFile), lit(30L * 24 * 3600)))
              .as("tpep_pickup_datetime"),
            pmod(xxhash64(col("id") * 31 + f), lit(265L)).cast("int")
              .as("PULocationID"))
          .write.mode("overwrite")
          .parquet(s"$dir/yellow_tripdata_2023-0${f % 9 + 1}.parquet")
      }
      dir
    })
    sys.env.get("GRAFT_MAX_PARTITION_BYTES")
      .foreach(v => spark.conf.set("spark.sql.files.maxPartitionBytes", v))
    // generation cost excluded from the measurement
    val t0 = System.nanoTime()
    val report = WideTablePipeline.run(spark,
      WideTablePipeline.Config(in, out, minRides = 50L))
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"""{"workload":"taxi_wide_table","input_rows":${report.inputRowCount},"output_rows":${report.outputRowCount},"seconds":$dt%.2f,"rows_per_sec":${(report.inputRowCount / dt).toLong}}""")
    spark.stop()
  }
}
