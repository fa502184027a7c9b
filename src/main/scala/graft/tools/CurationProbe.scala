package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel.DISK_ONLY

import graft.Session
import graft.text.{Dedup, TextFunctions => TF}

/** End-to-end curation DAG scale probe (round-10 verdict #5): every
  * stage of q_curation_end2end is individually priced at 50M rows,
  * but the COMPOSED dedup → decontaminate → quality-gate → split →
  * pack pipeline only ran at sf0.1 (5k docs). This runs the same
  * composition at 10–50M synthetic ~100-token docs (DedupBench's
  * planted-dup generator + a lang column) and records what a 100 TB
  * deployment actually needs: per-phase wall time, shuffle volume,
  * spill, and peak task execution memory, plus the single dominant
  * exchange across the whole DAG.
  *
  * Phase fencing: each stage output is persisted and counted before
  * the next starts, so (a) timings are attributable and (b) any
  * cross-stage replay would show up as phase-N work re-billed to
  * phase N+1 — the pinned-frame discipline the library's own
  * operators use internally (Dedup.pinnedFrame).
  *
  * Usage: runMain graft.tools.CurationProbe [numDocsMillions]
  */
object CurationProbe {

  final case class M(var shuffleWrite: Long = 0L, var spillMem: Long = 0L,
      var spillDisk: Long = 0L, var peakExecMem: Long = 0L,
      var maxStageShuffle: Long = 0L)

  final class PhaseListener extends SparkListener {
    @volatile var phase: String = "init"
    val byPhase: mutable.LinkedHashMap[String, M] = mutable.LinkedHashMap()
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
      synchronized {
        val m = byPhase.getOrElseUpdate(phase, M())
        val tm = e.stageInfo.taskMetrics
        if (tm != null) {
          val sw = tm.shuffleWriteMetrics.bytesWritten
          m.shuffleWrite += sw
          m.spillMem += tm.memoryBytesSpilled
          m.spillDisk += tm.diskBytesSpilled
          m.peakExecMem = math.max(m.peakExecMem, tm.peakExecutionMemory)
          m.maxStageShuffle = math.max(m.maxStageShuffle, sw)
        }
      }
  }

  def main(args: Array[String]): Unit = {
    val nM = args.headOption.map(_.toInt).getOrElse(10)
    val n = nM * 1000000L
    // Shuffle-scratch provisioning knobs (the 5M run established the
    // dominant exchange is linear in docs; the first 10M attempt died
    // on executor-local DISK, not memory — "No space left" with >80 GB
    // of lz4 shuffle scratch). Two deployment levers, both opt-in via
    // env so the 5M re-measure stays config-identical to round 11:
    //  - SPARK_GRAFT_IO_CODEC=zstd: shuffle/spill blocks compress ~2-3×
    //    tighter than lz4 on wordy text (the exact trade a disk-bound
    //    cluster makes; CPU-bound ones keep lz4);
    //  - SPARK_GRAFT_RDD_COMPRESS=true: DISK_ONLY stage pins compress
    //    (text pins are the other big disk consumer);
    //  - periodic GC at 2min: shuffle files of CONSUMED stages are only
    //    deleted when the driver GC collects their dependencies — a
    //    multi-phase DAG that pins+unpersists per phase otherwise
    //    carries every prior phase's scratch to the peak.
    val spark = Session.builder("curation-probe")
      .config("spark.io.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_IO_CODEC", "lz4"))
      .config("spark.rdd.compress",
        sys.env.getOrElse("SPARK_GRAFT_RDD_COMPRESS", "false"))
      .config("spark.cleaner.periodicGC.interval", "2min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // 32 partitions × ~310k docs × ~100 shingles each blew the hash
    // aggregate's memory budget (AGGREGATE_OUT_OF_MEMORY with 32
    // concurrent fat tasks) — size partitions so a task's partial agg
    // fits: ~10k docs/task. The exact knob a 1000-executor deployment
    // turns (shuffle.partitions scales with DATA, not cluster
    // default): 512 at 5M docs; a fixed 512 at 10M (19.5k docs/task)
    // OOM'd the same aggregate at 48g — the ceiling is per-task docs,
    // so partitions double with the corpus.
    val parts = math.max(512, (n / 10000L).toInt)
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    val listener = new PhaseListener
    spark.sparkContext.addSparkListener(listener)

    def timed[T](name: String)(f: => T): (T, Double) = {
      listener.phase = name
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def pin(df: DataFrame): DataFrame = {
      // DISK_ONLY: deserialized in-memory text blocks squeezed the
      // unified pool and the shingle partial aggregates threw
      // AGGREGATE_OUT_OF_MEMORY at 10M docs even at 24g — the
      // globalRank A/B already measured disk pins cheaper for fat rows
      val p = df.persist(DISK_ONLY); p.count(); p
    }

    // DedupBench's planted-dup generator (1% near-dup rate) + lang
    val vocab = typedLit((0 until 5000).map(i => s"w$i"))
    val (docs, genSec) = timed("generate") {
      pin(spark.range(0L, n, 1L, parts)
        .select(col("id").as("doc_id"),
          when(pmod(col("id"), lit(100)) === 1, col("id") - 1)
            .otherwise(col("id")).as("base"),
          concat(lit("l"), pmod(col("id"), lit(5))).as("lang"))
        .select(col("doc_id"), col("lang"),
          concat_ws(" ",
            concat_ws(" ", transform(sequence(lit(0), lit(99)),
              i => element_at(vocab,
                pmod(xxhash64(col("base"), i), lit(5000)).cast("int") + 1))),
            when(pmod(col("doc_id"), lit(100)) === 1, lit("extraword"))
              .otherwise(lit(""))).as("text")))
    }

    // probes derived BEFORE docs unpersists (bounded: ~1k rows)
    val probes = docs.where(col("doc_id") % 9973 === 0)
      .select(col("doc_id"), col("text")).localCheckpoint(true)

    val (clean, dedupSec) = timed("dedup") {
      val keepers = Dedup.dedupCorpus(docs, "doc_id", "text",
        threshold = 0.5)
      val c = pin(docs.join(keepers, Seq("doc_id"), "left_semi"))
      docs.unpersist() // stage consumed — keep ≤ 2 corpus frames live
      c
    }

    val (decon, deconSec) = timed("decontaminate") {
      val contaminated = Dedup.contaminationFlags(clean, probes,
          "doc_id", "text", shingleN = 3, minOverlap = 1)
        .where(col("contaminated")).select(col("doc_id"))
      val dc = pin(clean.join(contaminated, Seq("doc_id"), "left_anti"))
      clean.unpersist()
      dc
    }

    // MEASURED three-way A/B (5M docs, quiet box, 48g) — the r11
    // "pin the scored frame" theory is REFUTED:
    //   unpinned double-eval (r11)                949.9 s  <- WINNER
    //   fat pin (persist scored corpus, r13)    1,017.7 s
    //     = score+pin 534.1 (zero shuffle: regex pass + full-corpus
    //       DISK_ONLY round-trip) + filter 483.6 (two pin reads +
    //       output re-pin)
    //   narrow pin + left-semi (r13)            1,244.2 s
    //     = score+narrow-pin 450.5 + semi-join 793.7 (the corpus
    //       TEXT shuffles through the join — 5.9 GB shuffle write —
    //       to drop the 1% below threshold)
    // Law: the regex score costs ~450-475 s/pass here, i.e. ~one
    // corpus move — so every materialization "fix" pays MORE in
    // corpus movement (serialization or shuffle) than the recompute
    // it saves, and at a 99% keep rate the semi-join moves everything
    // to drop almost nothing. Let the score evaluate twice; pin only
    // when value-eval ≫ a corpus move (model scoring) AND the keep
    // rate is low enough that the join-back narrows. The probe ships
    // the winner.
    val (gated, gateSec) = timed("quality_gate_unpinned") {
      val g = pin(graft.ops.GroupQuantile.filterAtQuantile(
        TF.withQualityScore(decon, "text", "q"),
        Seq(col("lang")), col("q"), p = 0.25).drop("q"))
      decon.unpersist()
      g
    }

    val ((nPacked, nBins), packSec) = timed("split_pack") {
      val split = graft.ops.Sampling.assignSplit(gated, col("doc_id"),
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      val packed = graft.ops.Packing.packSequences(
        split.where(col("split") === "train"), "doc_id",
        TF.tokenCount(col("text")), budget = 4096, shards = 1024)
      val r = packed.agg(count(lit(1)),
        countDistinct(col("shard"), col("bin"))).head()
      (r.getLong(0), r.getLong(1))
    }

    val gb = 1024.0 * 1024 * 1024
    val phases = Seq("generate" -> genSec, "dedup" -> dedupSec,
      "decontaminate" -> deconSec,
      "quality_gate_unpinned" -> gateSec, "split_pack" -> packSec)
    val rows = phases.map { case (name, sec) =>
      val m = listener.byPhase.getOrElse(name, M())
      f""""$name":{"sec":$sec%.1f,"shuffle_write_gb":${m.shuffleWrite / gb}%.2f,"spill_disk_gb":${m.spillDisk / gb}%.2f,"peak_exec_mem_gb":${m.peakExecMem / gb}%.2f,"max_stage_shuffle_gb":${m.maxStageShuffle / gb}%.2f}"""
    }
    val dominant = listener.byPhase.maxBy(_._2.maxStageShuffle)
    println(s"""{"workload":"curation_end2end","docs":$n,"docs_kept":${gated.count()},"train_docs_packed":$nPacked,"bins":$nBins,"dominant_exchange_phase":"${dominant._1}","dominant_exchange_gb":${f"${dominant._2.maxStageShuffle / gb}%.2f"},${rows.mkString(",")}}""")
    spark.stop()
  }
}
