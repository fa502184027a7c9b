package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.text.{Dedup, TextFunctions}

/** Ingest-time decontamination — the streaming face of
  * `Dedup.contaminationFlags` (train/test-leakage check): documents
  * arrive as a stream and each is flagged when its distinct n-gram
  * shingles overlap a STATIC probe (benchmark) set.
  *
  * Spark-first shape: the probe side is batch and BOUNDED (eval
  * benchmarks — thousands of documents, not the corpus), so its
  * distinct shingle-hash set is collected once at plan time and enters
  * the stream's plan as an array literal (the same bounded-driver-side
  * pattern as the IVF centroids, `sim/Similarity.scala`). The streaming
  * side is then a pure MAP-SIDE projection — tokenize → distinct
  * shingle-hash array → `array_intersect` against the probe array —
  * with append output, ZERO state stores, zero stream-side shuffle:
  * each micro-batch flags its documents independently at scan
  * parallelism, which is exactly how an ingest filter must behave at
  * 100 TB (per-doc cost bounded, no cross-doc coordination).
  *
  * Boundary: a probe set beyond comfortable literal/broadcast size
  * (≫10⁷ shingles ≈ 100 MB) moves to the `foreachBatch` Bloom rung
  * ([[runBatchEquivalentBloom]]): the sketch is built ONCE (~7.3
  * bits/key at 3% fpp — shippable where a literal array is not), each
  * micro-batch runs the batch `applyBloomFlags` (map-side sketch
  * prefilter → exact semi-join verify → per-doc rollup). Flags are
  * per-document, so per-batch application IS the batch semantics —
  * no cross-batch state. [[runBatchEquivalentAuto]] picks the rung by
  * counting the probe's distinct shingles, the NgramLm
  * broadcast→shuffle auto-switch pattern.
  *
  * The per-row HOF (`transform`) evaluates interpreted, ~6× the CPU of
  * the batch path's codegen'd explode (measured for the batch shapes,
  * SCALE_NOTES) — the price of statelessness; the batch path remains
  * the bulk-backfill tool.
  */
object StreamingContamination {

  private val nameCounter = new AtomicInteger(0)

  /** Documents-shaped streaming source from the testdata layout. */
  def documentsStream(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"$sfDir/documents.parquet"
    // direct footer read — a readStream schema-inference job costs ~1 s
    val schema = graft.ingest.Footers.schemaOf(
      spark.sparkContext.hadoopConfiguration, path, nanosAsLong = false)
    // Dispatch on the table's physical layout: the old unconditional
    // pathGlobFilter-on-parent form matched leaf FILE names, so a
    // documents.parquet written as a DIRECTORY (part-*.parquet inside)
    // would silently discover zero files and emit an empty-but-
    // "successful" result. A directory streams directly; a single file
    // still needs the glob-on-parent form (FileStreamSource requires a
    // directory basePath — a bare file path throws at getBatch).
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.getFileStatus(p).isDirectory)
      spark.readStream.schema(schema).parquet(path)
    else
      spark.readStream.schema(schema)
        .option("pathGlobFilter", p.getName)
        .parquet(p.getParent.toString)
  }

  /** Per-row DISTINCT shingle-hash array — the map-side twin of
    * `Dedup.shingleHashFrame`'s exploded rows: same tokenization, same
    * `xxhash64` over the same n-gram windows → identical hash values,
    * held in an array instead of exploded (streams can't afford the
    * explode→aggregate round trip without state).
    */
  def shingleHashArray(tokensCol: Column, shingleN: Int = 3): Column = {
    val len = greatest(size(tokensCol) - (shingleN - 1), lit(0))
    val zipped = arrays_zip((1 to shingleN).map(i =>
      slice(tokensCol, lit(i), len)): _*)
    array_distinct(transform(zipped,
      z => xxhash64((0 until shingleN).map(i => z.getField(i.toString)): _*)))
  }

  /** Unbounded transform: flag each document against the probe shingle
    * set. Output matches `Dedup.contaminationFlags` row-for-row:
    * (id, n_shingles, n_overlap, overlap_frac, contaminated), emitted
    * only for documents that HAVE shingles (≥ `shingleN` tokens).
    */
  def flagStream(docs: DataFrame, idCol: String, textCol: String,
      probeShingles: Array[Long], shingleN: Int = 3,
      minOverlap: Int = 1): DataFrame = {
    val probe = typedLit(probeShingles)
    docs
      // tokens aliased in their OWN projection (same reasoning as the
      // batch build: the shingle zip references the array shingleN+1
      // times; a bound attribute is free to re-read, a regex split isn't)
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__tk"))
      .select(col(idCol), shingleHashArray(col("__tk"), shingleN).as("__sh"))
      .where(size(col("__sh")) > 0)
      .select(col(idCol),
        size(col("__sh")).cast("long").as("n_shingles"),
        size(array_intersect(col("__sh"), probe)).cast("long").as("n_overlap"))
      .select(col(idCol), col("n_shingles"), col("n_overlap"),
        (col("n_overlap") / col("n_shingles")).as("overlap_frac"),
        (col("n_overlap") >= minOverlap).as("contaminated"))
  }

  /** Drive the streaming filter over the bounded documents file with
    * the same corpus/probe split as the batch query (corpus doc_id%97≠0,
    * probes %97=0) — the emitted rows must equal the batch
    * `contaminationFlags` output whatever the arrival order, which the
    * shared DuckDB oracle hash-checks.
    */
  def runBatchEquivalent(spark: SparkSession, sfDir: String): DataFrame = {
    val name = s"stream_contamination_${nameCounter.incrementAndGet()}"
    val docs = Tables.documents(spark, sfDir)
    val probeShingles = Dedup.shingleHashFrame(
        docs.where(col("doc_id") % 97 === 0), "doc_id", "text", 3)
      .select(col("s")).distinct()
      .collect().map(_.getLong(0)).sorted
    StreamingRun.withStatePartitions(spark, 4) { s =>
      val stream = documentsStream(s, sfDir)
        .where(col("doc_id") % 97 =!= 0)
      val flagged = flagStream(stream, "doc_id", "text", probeShingles)
      val q = flagged.writeStream
        .outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
      try q.processAllAvailable()
      finally q.stop()
      // The memory sink holds the whole flagged corpus on the driver;
      // without dropping the view, repeated invocations (bench min-of-N)
      // accumulate driver memory ∝ result × iterations. Snapshot the
      // bounded result into a local frame, then release the sink.
      val snapshot = s.createDataFrame(
        s.table(name).collectAsList(), s.table(name).schema)
      s.catalog.dropTempView(name)
      snapshot
    }
  }

  /** Probe sets past this many distinct shingles stop being literal-
    * array-cheap in the stream's plan (8 B/hash plus per-task literal
    * deserialization) and the driver auto-switches to the Bloom rung.
    */
  val MaxLiteralProbeShingles = 4000000L

  /** Rung dispatch: one bounded count job over the probe's distinct
    * shingles decides literal-array (map-side, zero shuffle) vs
    * foreachBatch Bloom (sketch prefilter + exact verify). Both rungs
    * emit identical rows — the shared batch oracle hash-checks either.
    */
  def runBatchEquivalentAuto(spark: SparkSession, sfDir: String,
      maxLiteralShingles: Long = MaxLiteralProbeShingles): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val nProbeShingles =
      if (maxLiteralShingles <= 0L) Long.MaxValue // rung forced: skip the job
      else Dedup.shingleHashFrame(
          docs.where(col("doc_id") % 97 === 0), "doc_id", "text", 3)
        .agg(approx_count_distinct(col("s"))).head().getLong(0)
    if (nProbeShingles <= maxLiteralShingles) runBatchEquivalent(spark, sfDir)
    else runBatchEquivalentBloom(spark, sfDir)
  }

  /** The Bloom rung driven batch-equivalently: build the probe sketch
    * once, stream the corpus, run `Dedup.applyBloomFlags` per
    * micro-batch through `foreachBatch`, sink each batch's flags to a
    * shared parquet directory (the production sink shape — a memory
    * sink would hide the write path), and read the union back. The
    * emitted rows must equal the batch `contaminationFlagsBloom`
    * output — and therefore `contaminationFlags` (bloom is
    * exact-after-verify) — whatever the micro-batch boundaries.
    */
  def runBatchEquivalentBloom(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val (probeSh, sketch) = Dedup.bloomProbeBuild(
      docs.where(col("doc_id") % 97 === 0), "doc_id", "text",
      shingleN = 3, fpp = 0.03)
    StreamingRun.withStatePartitions(spark, 4) { s =>
      val outDir = java.nio.file.Files.createTempDirectory("graft_stream_bloom")
      try {
        val stream = documentsStream(s, sfDir)
          .where(col("doc_id") % 97 =!= 0)
        val q = stream.writeStream
          .outputMode("append")
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[
              org.apache.spark.sql.Row], _: Long) =>
            Dedup.applyBloomFlags(batch.toDF(), probeSh, sketch,
                "doc_id", "text", shingleN = 3, minOverlap = 1)
              .write.mode("append").parquet(outDir.toString)
            ()
          }
          .start()
        try q.processAllAvailable()
        finally q.stop()
        // snapshot to the driver (bounded: per-doc flags) BEFORE the
        // finally deletes the backing files
        val res = s.read.parquet(outDir.toString)
        s.createDataFrame(res.collectAsList(), res.schema)
      } finally StreamingRun.deleteRecursively(outDir)
    }
  }
}
