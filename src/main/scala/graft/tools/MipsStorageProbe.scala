package graft.tools

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

import graft.Session

/** The MIPS sorted-storage exhibit (round-11 verdict #6, carried to
  * round 12 #2): `Similarity.mipsTopKNormPrunedWithStats` claims its
  * ≤ 8192-literal In point-read is "row-group-skippable on sorted
  * parquet" — this probe makes that claim a measurement.
  *
  * Setup: a popularity-shaped catalog (norm ∝ 1/(1+id)^0.7, so the id
  * IS the norm rank — the serving layout a deployment builds by
  * re-keying the catalog in norm order, e.g. via the Compaction
  * machinery's sort-rewrite). Two byte-identical row sets, two
  * layouts:
  *  - sorted: range-partitioned + sorted by vec_id, small row groups
  *    → every row group covers a tight contiguous id range;
  *  - shuffled: same rows hash-scattered → every row group's
  *    [min, max] spans ~the whole id domain.
  *
  * The rung read is the operator's own shape: `vec_id IN (top-8192
  * norm ids)` = ids 0..8191 on this layout. Spark pushes an In wider
  * than spark.sql.parquet.pushdown.inFilterThreshold (default 10) to
  * parquet as the RANGE [min, max] (SPARK-32792), so on the sorted
  * layout only the prefix row groups survive the footer-stats check,
  * while on the shuffled layout every row group's range intersects
  * and nothing skips. Two independent measurements per layout:
  *  - task inputMetrics (records/bytes actually read by the scan
  *    stage) via listener — the runtime effect;
  *  - a direct parquet-footer audit (row groups whose vec_id
  *    [min, max] intersects the rung range vs total) — the stats
  *    effect, engine-independent.
  * Top-k output is asserted identical across layouts (pure layout,
  * never semantics).
  *
  * Usage: runMain graft.tools.MipsStorageProbe [nThousands] [rungSize]
  *        [rowGroupBytes]
  * rowGroupBytes defaults to 1 MB (skipping measurable at probe
  * scale); pass 134217728 with a catalog ≥ 20M rows for the
  * DEPLOYMENT point (128 MB groups — the parquet default a real
  * serving catalog is written with).
  */
object MipsStorageProbe {

  final class ScanListener extends SparkListener {
    @volatile var phase: String = "init"
    val records = mutable.LinkedHashMap[String, Long]()
    val bytes = mutable.LinkedHashMap[String, Long]()
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
      synchronized {
        val tm = e.stageInfo.taskMetrics
        if (tm != null) {
          records(phase) = records.getOrElse(phase, 0L) +
            tm.inputMetrics.recordsRead
          bytes(phase) = bytes.getOrElse(phase, 0L) +
            tm.inputMetrics.bytesRead
        }
      }
  }

  /** (rowGroupsTotal, rowGroupsOverlapping, rowsInOverlapping): footer
    * audit over every part file — a stats-aware reader must read
    * exactly the row groups whose vec_id [min, max] intersects
    * [lo, hi].
    */
  def footerAudit(conf: Configuration, dir: String, column: String,
      lo: Long, hi: Long): (Long, Long, Long) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    var total = 0L; var overlap = 0L; var rows = 0L
    fs.listStatus(p).filter { s =>
      val n = s.getPath.getName
      s.isFile && !n.startsWith("_") && !n.startsWith(".")
    }.foreach { s =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(s.getPath, conf))
      try r.getFooter.getBlocks.asScala.foreach { b =>
        total += 1
        b.getColumns.asScala.find(_.getPath.toDotString == column)
          .foreach { c =>
            val st = c.getStatistics
            if (st == null || !st.hasNonNullValue) { overlap += 1; rows += b.getRowCount }
            else {
              val mn = st.genericGetMin.asInstanceOf[java.lang.Long].longValue
              val mx = st.genericGetMax.asInstanceOf[java.lang.Long].longValue
              if (mx >= lo && mn <= hi) { overlap += 1; rows += b.getRowCount }
            }
          }
      } finally r.close()
    }
    (total, overlap, rows)
  }

  def main(args: Array[String]): Unit = {
    val nK = args.headOption.map(_.toInt).getOrElse(2000)
    val rung = args.lift(1).map(_.toInt).getOrElse(8192)
    val rowGroupBytes = args.lift(2).map(_.toLong).getOrElse(1024L * 1024)
    val n = nK * 1000L
    val dim = 32
    val k = 20
    val spark = Session.get("mips-storage-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val listener = new ScanListener
    spark.sparkContext.addSparkListener(listener)
    val base = System.getProperty("java.io.tmpdir") + s"/graft_mipstore_${nK}k"

    def gauss(i: org.apache.spark.sql.Column) =
      (pmod(xxhash64(col("id"), lit("ms"), i), lit(2000)).cast("double")
        - 1000.0) / 1000.0
    val w = pow(lit(1.0) + col("id").cast("double"), lit(-0.7)) * 10.0
    val vecs = spark.range(n)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(1), lit(dim)),
          i => (gauss(i) * w).cast("float")).as("embedding"))

    // ~1 MB row groups make skipping measurable at probe scale; the
    // rowGroupBytes arg reruns the same audit at the deployment
    // 128 MB default (r13 verdict #7)
    vecs.repartitionByRange(16, col("vec_id"))
      .sortWithinPartitions("vec_id")
      .write.option("parquet.block.size", rowGroupBytes)
      .mode("overwrite").parquet(s"$base/sorted")
    // the control must be genuinely order-free INSIDE each file: a
    // bare repartition concatenates map outputs in map order, so the
    // low ids still front-load each file's first row group and the
    // footer stats accidentally stay tight (first probe run measured
    // 10/266 groups overlapping on the "shuffled" control — a broken
    // control, caught by the audit). Sort within partitions by an id
    // hash so every row group spans ~the whole id domain.
    vecs.repartition(16, pmod(xxhash64(col("vec_id"), lit(3)), lit(16)))
      .sortWithinPartitions(xxhash64(col("vec_id"), lit(11)))
      .write.option("parquet.block.size", rowGroupBytes)
      .mode("overwrite").parquet(s"$base/shuffled")

    val rungIds = (0L until rung.toLong) // top-`rung` norms BY LAYOUT KEY
    val q = spark.read.parquet(s"$base/sorted")
      .where(col("vec_id") === 0L).select(col("embedding").as("__qv"))
    val conf = spark.sparkContext.hadoopConfiguration

    var outs = Map[String, Seq[String]]()
    for (layout <- Seq("sorted", "shuffled")) {
      val df = spark.read.parquet(s"$base/$layout")
      // warm the file index so listing isn't billed to the scan phase
      df.select(lit(1)).limit(1).count()
      listener.phase = s"scan_$layout"
      val t0 = System.nanoTime()
      val top = df.where(col("vec_id").isin(rungIds: _*))
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          graft.sim.Similarity.quantizedDot(col("embedding"), col("__qv"))
            .as("dot_q"))
        .where(col("vec_id") =!= 0L)
        .orderBy(col("dot_q").desc, col("vec_id")).limit(k)
        .collect()
      val sec = (System.nanoTime() - t0) / 1e9
      outs += layout -> top.map(_.toString).toSeq
      val (rgTotal, rgHit, rowsHit) =
        footerAudit(conf, s"$base/$layout", "vec_id", 0L, rung - 1L)
      val rec = listener.records.getOrElse(s"scan_$layout", 0L)
      val byt = listener.bytes.getOrElse(s"scan_$layout", 0L)
      println(f"""{"workload":"mips_storage","layout":"$layout","rows":$n,"rung":$rung,"row_group_bytes":$rowGroupBytes,"records_read":$rec,"bytes_read_mb":${byt / 1048576.0}%.1f,"row_groups_total":$rgTotal,"row_groups_overlapping":$rgHit,"rows_in_overlapping":$rowsHit,"seconds":$sec%.2f}""")
    }
    assert(outs("sorted") == outs("shuffled"),
      s"layout changed semantics:\n${outs("sorted")}\nvs\n${outs("shuffled")}")
    println(s"""{"workload":"mips_storage","topk_identical":true}""")
    spark.stop()
  }
}
