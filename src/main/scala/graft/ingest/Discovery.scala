package graft.ingest

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** File discovery over any Hadoop-supported filesystem (file://, s3a://,
  * hdfs://…) — one code path replaces the reference's separate local /
  * s3fs / PyArrow-FS branches (pivot_utils.py:261-297) and its shell-out
  * S3 upload (credentials, listing, retries are Hadoop-FS concerns).
  *
  * The listing is driver-side and deliberate: per-file schema detection
  * needs explicit paths (a naive `spark.read.parquet(dir)` can't rename
  * columns per file). At 100 TB / O(100k) files a driver listing is still
  * fine (strings only); the subsequent scan is one job per dialect
  * GROUP, not per file — see Normalize.
  */
object Discovery {

  /** Recursive `*.parquet` listing, sorted for determinism
    * (pivot_utils.py:275,289,297). Single-file paths pass through.
    */
  def discoverParquet(spark: SparkSession, inputPath: String): Seq[String] = {
    val p = new Path(inputPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    if (fs.getFileStatus(p).isFile) {
      return if (inputPath.toLowerCase.endsWith(".parquet")) Seq(fs.makeQualified(p).toString)
             else Seq.empty
    }
    val it = fs.listFiles(p, true)
    val out = Seq.newBuilder[String]
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.toLowerCase.endsWith(".parquet"))
        out += st.getPath.toString
    }
    out.result().sorted
  }

  /** Trip-data filter + priority sort + head-N, mirroring
    * pivot_all_files.py:401 (keep "tripdata" paths), :406 (yellow/green
    * before fhv — standard datetime columns first), :407-409 (--max-files).
    */
  def selectTripFiles(files: Seq[String], maxFiles: Option[Int] = None): Seq[String] = {
    val trips = files.filter(_.toLowerCase.contains("tripdata"))
    val sorted = trips.sortBy { f =>
      val l = f.toLowerCase
      (if (l.contains("yellow") || l.contains("green")) 0 else 1, f)
    }
    maxFiles.fold(sorted)(sorted.take)
  }
}
