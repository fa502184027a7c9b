package graft.pipeline

import graft.Session

/** CLI entry for the wide-table pipeline — same argument surface as the
  * reference (/root/reference/README.md:35-46), minus the knobs Spark
  * obsoletes (--workers → executor/thread config; --partition-size /
  * --skip-partition-optimization → spark.sql.files.maxPartitionBytes +
  * AQE; --keep-intermediate → there are no intermediates, one plan;
  * --s3-output → write directly to an s3a:// output dir).
  *
  * Usage:
  *   runMain graft.pipeline.Main --input-dir DIR --output-dir DIR
  *     [--min-rides N] [--max-files N] [--report NAME.{json,tex}]
  *     [--single-file-output]
  */
object Main {
  def main(args: Array[String]): Unit = {
    def argOf(name: String): Option[String] =
      args.sliding(2).collectFirst { case Array(`name`, v) => v }
    val input = argOf("--input-dir").getOrElse(
      sys.error("--input-dir is required"))
    val output = argOf("--output-dir").getOrElse(
      sys.error("--output-dir is required"))
    val cfg = WideTablePipeline.Config(
      inputDir = input,
      outputDir = output,
      minRides = argOf("--min-rides").map(_.toLong).getOrElse(50L),
      maxFiles = argOf("--max-files").map(_.toInt),
      reportName = argOf("--report").getOrElse("report.json"),
      singleFileOutput = args.contains("--single-file-output"))
    val spark = Session.get("graft-wide-table")
    try {
      val r = WideTablePipeline.run(spark, cfg)
      println(ReportSink.toJson(r))
    } finally spark.stop()
  }
}
