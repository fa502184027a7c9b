package graft.tools

import org.apache.spark.sql.functions._

import graft.Session
import graft.sim.Similarity

/** Scale probe for the kNN join: N synthetic 64-dim vectors (the
  * SimBench generator shape), Q queries drawn from the corpus, top-k
  * per query in one scan. The claim under test: wall grows ~linearly
  * in N·Q map-side work while the shuffle stays at Q·k pairs per
  * mapper — no N×Q matrix ever materializes.
  *
  * Round-10 addition: the IVF rung (`Similarity.ivfKnnJoin`) —
  * build-once cell index, per-query map-side probe ranking, cell
  * equi-join — priced against the brute join on the same corpus, with
  * set recall vs the brute top-k reported. Use `clustered` mode for
  * the realistic ANN case (20-member direction clusters, the
  * IvfPqScaleProbe shape); `uniform` is the ANN-adversarial corpus
  * where any pruned search must lose recall (concentration of
  * pairwise distances) — both operating points belong in the record.
  *
  * Usage: runMain graft.tools.KnnJoinProbe [vectorsThousands] [queries]
  *          [mode=uniform|clustered] [nCells] [nProbe]
  */
object KnnJoinProbe {
  def main(args: Array[String]): Unit = {
    val nK = args.headOption.map(_.toInt).getOrElse(100)
    val q = args.lift(1).map(_.toInt).getOrElse(100)
    val mode = args.lift(2).getOrElse("uniform")
    val nCells = args.lift(3).map(_.toInt).getOrElse(64)
    val nProbe = args.lift(4).map(_.toInt).getOrElse(4)
    val n = nK * 1000L
    val spark = Session.get("knn-probe")
    spark.sparkContext.setLogLevel("WARN")

    val vecs = (if (mode == "clustered") {
      // 20-member clusters: center from the cluster id, small jitter
      // from the member id — tight, well-separated, deterministic
      val cluster = col("id") % lit(math.max(n / 20, 1))
      spark.range(n)
        .select(col("id").as("vec_id"),
          transform(sequence(lit(1), lit(64)), i =>
            ((pmod(xxhash64(cluster, i), lit(2000)).cast("float") -
              lit(1000.0f)) / lit(1000.0f)) +
              (pmod(xxhash64(col("id"), i), lit(100)).cast("float") /
                lit(2000.0f))).cast("array<float>")
            .as("embedding"))
    } else
      spark.range(n)
        .select(col("id").as("vec_id"),
          transform(sequence(lit(1), lit(64)), i =>
            (pmod(xxhash64(col("id"), i), lit(2000)).cast("float") -
              lit(1000.0f)) / lit(1000.0f)).cast("array<float>")
            .as("embedding")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    vecs.count()

    val queries = vecs.where(col("vec_id") % (n / q) === 0)
    val t0 = System.nanoTime()
    val brute = Similarity.knnJoin(vecs, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("vec_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rows = brute.count()
    val sec = (System.nanoTime() - t0) / 1e9

    val tb = System.nanoTime()
    val index = Similarity.buildIvfIndex(vecs, "embedding", nCells)
    index.cells.count()
    val buildSec = (System.nanoTime() - tb) / 1e9
    val t1 = System.nanoTime()
    val ivf = Similarity.ivfKnnJoin(index, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 10, nProbe)
      .select(col("query_id"), col("vec_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ivfRows = ivf.count()
    val ivfSec = (System.nanoTime() - t1) / 1e9
    val hit = brute.join(ivf, Seq("query_id", "vec_id")).count()
    val recall = hit.toDouble / rows

    println(f"""{"workload":"knn_join","mode":"$mode","vectors":$n,"queries":$q,"k":10,"result_rows":$rows,"brute_sec":$sec%.2f,"ivf_cells":$nCells,"ivf_nprobe":$nProbe,"ivf_build_sec":$buildSec%.2f,"ivf_search_sec":$ivfSec%.2f,"ivf_rows":$ivfRows,"ivf_recall":$recall%.4f}""")
    spark.stop()
  }
}
