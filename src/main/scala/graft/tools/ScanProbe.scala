package graft.tools

import org.apache.spark.sql.functions._

import graft.Session

/** Minimal scan-path probe to isolate per-row costs. */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val in = args(0)
    val spark = Session.get("scan-probe")
    val df = spark.read.parquet(in)
    def phase(name: String)(d: org.apache.spark.sql.DataFrame): Unit = {
      val t = System.nanoTime()
      d.write.format("noop").mode("overwrite").save()
      println(f"[scan] $name: ${(System.nanoTime() - t) / 1e9}%.2f s")
    }
    phase("raw-2col")(df)
    phase("raw-2col-again")(df)
    phase("loc-only")(df.select(col("PULocationID")))
    phase("ts-only")(df.select(col("tpep_pickup_datetime")))
    phase("loc-to-string")(df.select(col("PULocationID").cast("long").cast("string")))
    phase("ts-hour")(df.select(hour(col("tpep_pickup_datetime"))))
    phase("with-input-file")(df.select(col("PULocationID"), input_file_name()))

    // explicit part-file paths (Discovery-style listing) vs dir read
    val fs = new org.apache.hadoop.fs.Path(in)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(in), true)
      val b = Seq.newBuilder[String]
      while (it.hasNext) {
        val s = it.next()
        if (s.isFile && s.getPath.getName.endsWith(".parquet"))
          b += s.getPath.toString
      }
      b.result()
    }
    println(s"[scan] explicit paths: ${parts.size}")
    val multi = spark.read.parquet(parts: _*)
    phase("multi-path-2col")(multi)
    phase("multi-path-2col-again")(multi)
    phase("multi-path-normalized")(multi.select(
      col("tpep_pickup_datetime").as("pickup_datetime"),
      col("PULocationID").cast("long").cast("string").as("pickup_location"),
      input_file_name().as("src_path")))
    spark.stop()
  }
}
