package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.text.QualityClassifier

/** Continuously-maintained isotonic recalibration: the quality model
  * trains ONCE on the trusted slice of the accumulated corpus (table,
  * not stream — the StreamingLm contract), every arriving micro-batch
  * is scored against the frozen model and collapsed to per-bin
  * (n, pos) PARTIALS at ingest, and the PAV fit folds over the summed
  * bin state per refresh. Bin counts are additive, so the maintained
  * state is the BIN GRID (≤ score_range/binDiv rows), never documents
  * — the same bounded-state shape as the day-count monitor family.
  * Arrival order cannot change a sum of partials, so the result is
  * row-identical to the one-shot batch fit — which the shared oracle
  * hash-checks.
  */
object StreamingCalibration {

  def runIsotonicBatchEquivalent(spark: SparkSession,
      sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val weights = QualityClassifier.trainTokenWeights(
      docs.where(col("doc_id") % 3 === 0), "text", col("lang") === "en")
      .localCheckpoint(true) // frozen model: never recomputed per batch
    val buf = java.util.Collections.synchronizedList(
      new java.util.ArrayList[org.apache.spark.sql.Row]())
    def binPartials(batch: DataFrame): DataFrame =
      QualityClassifier.scoreDocs(batch, "doc_id", "text", weights)
        .join(batch.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .groupBy(expr("score_ppm div 2000").as("bin"))
        .agg(count(lit(1)).as("n_docs"),
          sum((col("lang") === "en").cast("long")).as("n_pos"))
    StreamingRun.withStatePartitions(spark, 4) { s =>
      val stream = StreamingContamination.documentsStream(s, sfDir)
      val q = stream.writeStream
        .outputMode("append")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          buf.addAll(binPartials(batch).collectAsList())
          (): Unit
        }
        .start()
      try q.processAllAvailable()
      finally q.stop()
    }
    val partials = spark.createDataFrame(buf,
      binPartials(docs.limit(0)).schema)
    graft.ops.Calibration.isotonicFromBins(partials)
  }
}
