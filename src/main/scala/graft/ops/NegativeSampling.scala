package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic negative sampling — the contrastive-training data
  * primitive (in-batch negatives' offline twin): every anchor draws k
  * pseudo-random negatives from a shared candidate pool, reproducibly
  * on any engine and at any parallelism (no RNG stream — draws are
  * md5(anchor:candidate), the repo-standard portable hash).
  *
  * Shape at 100 TB — two rungs, auto-selected (the NgramLm
  * broadcast→shuffle pattern):
  *  - pool within broadcast reach (approx-counted, default cap 4M
  *    ids = ~32 MB of longs): broadcast it; anchors scan once; the
  *    per-anchor draw ranking is the PairTopKAggregator partial
  *    top-k, so the anchor-side shuffle carries k (draw, id) pairs
  *    per anchor per mapper, never the N×|pool| draw matrix.
  *  - pool past broadcast reach: shard the pool by id hash into
  *    `shards` buckets, replicate each anchor id (8 bytes) across
  *    the shards, shuffle-join on the shard key, and run the SAME
  *    partial top-k per anchor — map-side partials emit k pairs per
  *    anchor per shard, the final aggregate merges them exactly
  *    (same (draw, id) comparator ⇒ identical output). Per-task
  *    memory is |pool|/shards; the total draw work is inherently
  *    anchors×|pool| in both rungs — the rung changes MEMORY and
  *    broadcast feasibility, not compute. No window sorts anything.
  *
  * Determinism of the ranking: draws order lexicographically on hex;
  * the aggregator score is the NEGATED numeric value of the first 13
  * hex chars (52 bits — exact in a double), which induces the same
  * order; prefix collisions tie-break by candidate id in both engines.
  *
  * Composition note: for leakage-safe negatives, anti-join the output
  * against the anchor's near-dup cluster (Dedup.nearDupClusters) so a
  * paraphrase can never be its own "negative".
  */
object NegativeSampling {

  /** (anchor_id, rank, neg_id) — k negatives per anchor, self excluded. */
  def negativeSamples(df: DataFrame, idCol: String, k: Int,
      poolRate: Double, maxBroadcastPool: Long = 4000000L,
      shards: Int = 256): DataFrame = {
    require(k >= 1 && shards >= 1)
    val pool = df.select(col(idCol).cast("long").as("neg_id"))
      .where(md5(col("neg_id").cast("string")) <
        lit(Sampling.hexThreshold(poolRate)))
    val draw = md5(concat_ws(":", col("anchor_id"), col("neg_id")))
    val score: Column =
      -conv(substring(draw, 1, 13), 16, 10).cast("double")
    // fanOut: |pool| md5 draws per anchor is the expensive stage; a
    // single-split anchor file serializes it (AmplificationAudit)
    val anchors = Partitioning.fanOut(
      df.select(col(idCol).cast("long").as("anchor_id")))
    val poolN = pool.agg(approx_count_distinct(col("neg_id"))).head().getLong(0)
    val joined =
      if (poolN <= maxBroadcastPool)
        anchors.crossJoin(broadcast(pool))
      else {
        // past broadcast reach: hash-shard the pool, replicate each
        // 8-byte anchor id across the shards, meet on the shard key
        val poolS = pool.withColumn("__shard",
          pmod(xxhash64(col("neg_id")), lit(shards.toLong)).cast("int"))
        val anchorsS = anchors.select(col("anchor_id"),
          explode(sequence(lit(0), lit(shards - 1))).as("__shard"))
        anchorsS.join(poolS, Seq("__shard")).drop("__shard")
      }
    joined
      .where(col("anchor_id") =!= col("neg_id"))
      .select(col("anchor_id"), score.as("__s"), col("neg_id"))
      .groupBy(col("anchor_id"))
      .agg(graft.functions.PairTopKAggregator
        .top_k_pair(k)(col("__s"), col("neg_id")).as("top"))
      .select(col("anchor_id"), posexplode(col("top")))
      .select(col("anchor_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("neg_id"))
  }
}
