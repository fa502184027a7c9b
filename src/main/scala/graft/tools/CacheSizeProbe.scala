package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel.DISK_ONLY

import graft.Session

/** Companion number for GateKeepSweep's mechanism claim: the
  * join-back's build-side size ESTIMATE is the pinned narrow frame's
  * compressed-cache bytes (filters reduce nothing without CBO), so the
  * broadcast-vs-shuffle decision is keep-blind — it flips on where
  * this number sits against `spark.sql.autoBroadcastJoinThreshold`.
  * This probe prints that number at the sweep's two corpus sizes.
  *
  * Usage: runMain graft.tools.CacheSizeProbe [docsMillions...]
  */
object CacheSizeProbe {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toDouble).toSeq
      else Seq(2.0, 8.0)
    val spark = Session.builder("cache-size-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val vocab = typedLit((0 until 5000).map(i => s"w$i"))
    sizes.foreach { nM =>
      val n = (nM * 1000000L).toLong
      val parts = math.max(256, (n / 10000L).toInt)
      val docs = spark.range(0L, n, 1L, parts)
        .select(col("id").as("doc_id"),
          concat(lit("l"), pmod(col("id"), lit(5))).as("lang"),
          concat_ws(" ", transform(sequence(lit(0), lit(99)),
            i => element_at(vocab,
              pmod(xxhash64(col("id"), i), lit(5000)).cast("int") + 1)))
            .as("text"))
      def score(text: org.apache.spark.sql.Column) =
        pmod((1 to 150).foldLeft(lit(0L))((h, _) => xxhash64(text, h)),
          lit(10000L))
      val narrow = docs.select(col("doc_id"), col("lang"),
        score(col("text")).as("q")).persist(DISK_ONLY)
      narrow.count()
      // two numbers: the RAW plan's static estimate (rows × width
      // heuristic — what a non-pinned pipeline's join-back is sized
      // by) vs the MATERIALIZED InMemoryRelation's stats (actual
      // compressed cache bytes — what any frame derived from the pin
      // is sized by after cache substitution). The gap between them is
      // the whole broadcast-vs-shuffle story.
      val rawEst = narrow.queryExecution.optimizedPlan.stats.sizeInBytes
      // a NEW Dataset over the pinned frame analyzes through the cache
      // manager and resolves to the InMemoryRelation
      val overCache = narrow.select(col("doc_id"), col("lang"), col("q"))
      val cacheEst = overCache.queryExecution.optimizedPlan.collectFirst {
        case r: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
          r.stats.sizeInBytes
      }.getOrElse(BigInt(-1))
      val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      // what actually landed in the block manager (compressed columnar
      // batches on disk) — the number AQE's TableCacheQueryStage
      // runtime sizing exposes to join re-selection
      val stored = spark.sparkContext.getRDDStorageInfo
        .map(i => (i.memSize, i.diskSize)).toSeq
      println(s"""{"workload":"cache_size_probe","docs":$n,"raw_plan_estimate_bytes":$rawEst,"materialized_cache_bytes":$cacheEst,"block_manager_mem_disk":"${stored.mkString(";")}","auto_broadcast_threshold":"$thr"}""")
      narrow.unpersist(true)
    }
    spark.stop()
  }
}
