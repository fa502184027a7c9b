package graft.tools

import org.apache.spark.sql.functions._

import graft.Session
import graft.ops.NegativeSampling

/** Scale probe for deterministic negative sampling: prices the
  * broadcast rung against the sharded shuffle-join rung on the SAME
  * inputs and asserts they produce identical (anchor, rank, neg_id)
  * rows — the Bloom/LM probe pattern (prove the identity, price the
  * switch). The pool here fits broadcast either way; the probe forces
  * the sharded rung with maxBroadcastPool=0 to measure its overhead,
  * which is the price paid only when the pool CANNOT broadcast (at a
  * fixed poolRate on 100 TB the pool is ~10^10 ids — far past any
  * broadcast; the sharded rung's per-task memory is |pool|/shards).
  *
  * Usage: runMain graft.tools.NegSampleProbe [numAnchorsThousands] [poolRate] [k]
  */
object NegSampleProbe {
  def main(args: Array[String]): Unit = {
    val nK = args.headOption.map(_.toInt).getOrElse(100)
    val poolRate = args.lift(1).map(_.toDouble).getOrElse(0.1)
    val k = args.lift(2).map(_.toInt).getOrElse(4)
    val n = nK * 1000L
    val spark = Session.get("negsample-probe")

    val ids = spark.range(n).select(col("id").as("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = ids.count()
    System.err.println(s"[negsample-probe] $total anchors, poolRate=$poolRate, k=$k")

    val t0 = System.nanoTime()
    val bc = NegativeSampling.negativeSamples(ids, "doc_id", k, poolRate)
    val bcRows = bc.count()
    val bcSec = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val sh = NegativeSampling.negativeSamples(ids, "doc_id", k, poolRate,
      maxBroadcastPool = 0L, shards = 64)
    val shRows = sh.count()
    val shSec = (System.nanoTime() - t1) / 1e9

    val diff = bc.exceptAll(sh).count() + sh.exceptAll(bc).count()
    require(diff == 0L && bcRows == shRows,
      s"rung outputs diverge: diff=$diff bcRows=$bcRows shRows=$shRows")

    // compute-scale rung: time the O(anchors×k) index-draw spec at the
    // probe pool AND at a 5× pool — rank-spec work grows with |pool|,
    // index-spec work doesn't (it re-pays only the O(P) indexing pass)
    def timeDraws(rate: Double): (Double, Long) = {
      val t = System.nanoTime()
      val rows = NegativeSampling
        .negativeSamplesByIndex(ids, "doc_id", k, rate).count()
      ((System.nanoTime() - t) / 1e9, rows)
    }
    val (dxSec, dxRows) = timeDraws(poolRate)
    // weighted rung shares the draw shape; weight = id mod 97 + 1
    val tw = System.nanoTime()
    val wRows = NegativeSampling.negativeSamplesWeighted(
      ids.withColumn("wt", pmod(col("doc_id"), lit(97L)) + 1L),
      "doc_id", "wt", k, poolRate).count()
    val wSec = (System.nanoTime() - tw) / 1e9
    val rate5 = math.min(1.0, poolRate * 5)
    val (dx5Sec, dx5Rows) = timeDraws(rate5)
    val t2 = System.nanoTime()
    val rank5Rows = NegativeSampling.negativeSamples(
      ids, "doc_id", k, rate5).count()
    val rank5Sec = (System.nanoTime() - t2) / 1e9

    println(f"""{"workload":"negative_sampling","anchors":$total,"pool_rate":$poolRate,"k":$k,"rows":$bcRows,"broadcast_sec":$bcSec%.2f,"sharded_sec":$shSec%.2f,"identical":true,"draws_sec":$dxSec%.2f,"draws_rows":$dxRows,"weighted_sec":$wSec%.2f,"weighted_rows":$wRows,"pool_rate_5x":$rate5,"draws_5x_sec":$dx5Sec%.2f,"draws_5x_rows":$dx5Rows,"rank_5x_sec":$rank5Sec%.2f,"rank_5x_rows":$rank5Rows}""")
    spark.stop()
  }
}
