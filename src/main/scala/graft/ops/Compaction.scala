package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-files compaction — the operational fix for the classic
  * many-tiny-parquet-files problem (every micro-batch sink, incremental
  * month directory, or over-parallel write produces them; at 100 TB the
  * NameNode/listing pressure and per-file open cost dominate scans long
  * before data volume does).
  *
  * Target file count = ceil(actual dataset bytes / targetFileBytes),
  * measured from the file listing (cheap, driver-side) — NOT from
  * `spark.sql.files.maxPartitionBytes` heuristics, which see compressed
  * input splits, not output sizing. The rewrite is one
  * `repartition(n)` round-robin shuffle: even output sizes, no skewed
  * final file. With a `sortBy` column list the shuffle becomes a
  * range-partitioned sort so each output file covers a key range —
  * min/max footer stats then let readers skip whole files (poor man's
  * clustering; the layout lever behind data-skipping indexes).
  */
object Compaction {

  /** Total bytes of data files under a path (driver-side listing). */
  def datasetBytes(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var total = 0L
    while (it.hasNext) {
      val s = it.next()
      val n = s.getPath.getName
      if (s.isFile && !n.startsWith("_") && !n.startsWith(".")) total += s.getLen
    }
    total
  }

  /** Rewrite `inDir` (parquet) into `outDir` as ~targetFileBytes files.
    * Returns the chosen file count.
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      sortBy: Seq[String] = Nil): Int = {
    require(targetFileBytes > 0)
    val bytes = datasetBytes(spark, inDir)
    val n = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(inDir)
    val shaped: DataFrame =
      if (sortBy.isEmpty) df.repartition(n)
      else df.repartitionByRange(n, sortBy.map(df.col): _*)
        .sortWithinPartitions(sortBy.map(df.col): _*)
    shaped.write.mode("overwrite").parquet(outDir)
    n
  }
}
