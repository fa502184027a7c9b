package graft.tools

import org.apache.spark.sql.functions._

import graft.Session

/** Scale probe for Similarity.mipsTopKNormPruned — does the
  * Cauchy–Schwarz norm ladder actually PRUNE, and on what norm
  * distribution?
  *
  * Two synthetic catalogs, same size/dim, same query:
  *  - GAUSSIAN: iid components → norms concentrate around √d·σ
  *    (relative spread ~1/√d). The ceiling ‖q‖·max-unseen-‖x‖ barely
  *    decays as the ladder descends, so pruning should engage late or
  *    never — the JL-exhibit finding transposed to MIPS.
  *  - POPULARITY: the same directions scaled by a Zipf-ish popularity
  *    weight (norm ∝ 1/rank^0.7) — the realistic recommender catalog
  *    shape, where a thin head carries the large norms. The ceiling
  *    collapses after the head, so the ladder should stop at a few
  *    k·factor rungs and scanned/N → 0 as N grows.
  *
  * Prints one JSON line per (corpus, N): stop reason, final factor,
  * candidates scanned, scanned share, wall, plus brute-force wall for
  * the same top-k as the honesty baseline (both must agree — top-k
  * ids are asserted equal).
  *
  * Usage: runMain graft.tools.MipsProbe [nThousands ...]
  */
object MipsProbe {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(100, 1000)
    val spark = Session.get("mips-probe")
    spark.sparkContext.setLogLevel("WARN")
    val dim = 32
    val k = 20

    def gauss(tag: String, i: org.apache.spark.sql.Column) =
      (pmod(xxhash64(col("id"), lit(tag), i), lit(2000)).cast("double")
        - 1000.0) / 1000.0

    for (nK <- sizes; shape <- Seq("gaussian", "popularity")) {
      val n = nK * 1000L
      // popularity weight ∝ 1/(1+rank)^0.7, rank = id (deterministic)
      val w = shape match {
        case "gaussian" => lit(1.0)
        case _ => pow(lit(1.0) + col("id").cast("double"), lit(-0.7)) * 10.0
      }
      val vecs = spark.range(n)
        .select(col("id").as("vec_id"),
          transform(sequence(lit(1), lit(dim)),
            i => (gauss(shape, i) * w).cast("float"))
            .as("embedding"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      vecs.count()

      val t0 = System.nanoTime()
      val (out, factor, scanned, reason) =
        graft.sim.Similarity.mipsTopKNormPrunedWithStats(
          vecs, "vec_id", "embedding", queryId = 0L, k = k)
      val pruned = out.collect()
      val prunedSec = (System.nanoTime() - t0) / 1e9

      // served regime: the norm index already exists (stored column)
      val idx = graft.sim.Similarity.mipsNormIndex(vecs, "vec_id", "embedding")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      idx.count()
      val t2 = System.nanoTime()
      val (outServed, _, _, reasonServed) =
        graft.sim.Similarity.mipsTopKNormPrunedWithStats(
          vecs, "vec_id", "embedding", queryId = 0L, k = k,
          index = Some(idx))
      val servedRows = outServed.collect()
      val servedSec = (System.nanoTime() - t2) / 1e9
      require(servedRows.map(_.getLong(0)).sameElements(
        pruned.map(_.getLong(0))), "served path diverged")

      val t1 = System.nanoTime()
      val brute = graft.sim.Similarity.topKByQueryId(
          vecs, "vec_id", "embedding", queryId = 0L, k = k,
          scoreFn = graft.sim.Similarity.quantizedDot)
        .collect()
      val bruteSec = (System.nanoTime() - t1) / 1e9

      val agree = pruned.map(_.getLong(0)).sameElements(
        brute.map(_.getLong(0)))
      require(agree, s"MIPS pruned top-$k disagrees with brute at " +
        s"$shape/$n — exactness contract broken")
      println(f"""{"workload":"mips","shape":"$shape","n":$n,"dim":$dim,"k":$k,"stop":"$reason","factor":$factor,"scanned":$scanned,"scanned_share":${scanned.toDouble / n}%.4f,"pruned_sec":$prunedSec%.2f,"served_sec":$servedSec%.2f,"served_stop":"$reasonServed","brute_sec":$bruteSec%.2f,"topk_agree":$agree}""")
      idx.unpersist(); vecs.unpersist()
    }
    spark.stop()
  }
}
