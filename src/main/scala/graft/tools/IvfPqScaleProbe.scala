package graft.tools

import org.apache.spark.sql.functions._

import graft.Session
import graft.functions.VectorFunctions
import graft.sim.{KMeans, ProductQuantizer}

/** 10M-vector build+serve probe for the served IVF+PQ layout — the
  * numeric anchor for the 100 TB ANN claim (the largest prior probe
  * was 1M). Measures: build wall (train + encode + partitioned
  * write), on-disk index size vs raw vector size, per-query serve
  * latency, and recall@20 vs the EXACT quantized-L2 top-20 (ADC's own
  * metric target) at nProbe ∈ {1, 4, 16}.
  *
  * Corpus: PLANTED-CLUSTER deterministic vectors — n/20 xxhash64-
  * derived centers in [-0.9, 0.9]^64, each vector = its id-assigned
  * center + [-0.3, 0.3] per-component noise (~20 members per planted
  * cluster, so a top-20 query spans its whole home cluster and the
  * lever is finding the RIGHT cluster — cell-level resolution, which
  * is what IVF+PQ provides). Uniform random vectors make the sweep
  * meaningless (distance concentration: top-20 is decided by gaps
  * smaller than PQ quantization error — measured recall flat ~0.2);
  * huge planted clusters (1000 members) are the opposite failure:
  * top-20 is WITHIN-cluster ranking, below 8-byte PQ resolution at
  * any nProbe (measured flat 0.03, refined 0.36 — capped by the
  * shortlist's share of the cluster). kCells=256 (serve scans nProbe/256 of the corpus),
  * m=8 × kCodes=256 → 8 bytes of codes per 256-byte vector (~32×
  * compression before parquet encoding). Training runs over the full
  * corpus like the declared build path — the probe prices exactly the
  * operator users run.
  *
  * The 4th arg sets planted-cluster size (default 20): `1 256 2 1000`
  * is the pathological mega-cluster rung — top-20 becomes WITHIN-
  * cluster ranking below ADC resolution, the rung that motivates
  * `ivfPqSearchRefinedAdaptive` (measured: fixed refine=10 recall
  * 0.36, adaptive ≥0.9 — see SCALE_NOTES).
  *
  * Usage: runMain graft.tools.IvfPqScaleProbe [numVecsMillions] [kCells] [iters] [membersPerCluster]
  */
object IvfPqScaleProbe {
  def main(args: Array[String]): Unit = {
    val nM = args.headOption.map(_.toInt).getOrElse(10)
    val kCells = args.lift(1).map(_.toInt).getOrElse(256)
    val iters = args.lift(2).map(_.toInt).getOrElse(2)
    val members = args.lift(3).map(_.toInt).getOrElse(20)
    val n = nM * 1000000L
    val spark = Session.builder("ivfpq-scale", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    VectorFunctions.register(spark)

    val nCenters = math.max(1L, n / members)
    val center = pmod(xxhash64(col("id")), lit(nCenters))
    val vec = transform(sequence(lit(0), lit(63)),
      i => (((pmod(xxhash64(center, i), lit(2001)) - 1000) / 1000.0) * 0.9 +
        ((pmod(xxhash64(col("id"), i, lit(7)), lit(2001)) - 1000) / 1000.0)
          * 0.3).cast("float"))
    val vecs = spark.range(n)
      .select(col("id").as("vec_id"), vec.as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    vecs.count()
    System.err.println(s"[ivfpq-scale] $n vectors, kCells=$kCells, iters=$iters")

    val dir = s"/tmp/graft_ivfpq_scale_${nM}m"
    graft.streaming.StreamingRun.deleteRecursively(
      java.nio.file.Paths.get(dir))
    val t0 = System.nanoTime()
    ProductQuantizer.buildAndWriteIvfPqIndex(vecs, "vec_id", "embedding",
      dir, kCells = kCells, iters = iters, m = 8, kCodes = 256)
    val buildSec = (System.nanoTime() - t0) / 1e9

    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val idxBytes = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(dir)).getLength
    val rawBytes = n * 64L * 4L

    val index = ProductQuantizer.readIvfPqIndex(spark, dir)
    val queryIds = Seq(1L, 3L, 5L, 7L, 11L)
    // ground truth + query vectors once per query (a full corpus scan
    // each — not per nProbe operating point)
    val queries = queryIds.map { qid =>
      val qv = vecs.where(col("vec_id") === qid)
        .select(KMeans.quantize(col("embedding")))
        .head().getSeq[Long](0).toArray
      val gt = vecs
        .select(col("vec_id"), element_at(
          VectorFunctions.q_vec_nearest_l2(
            KMeans.quantize(col("embedding")), typedLit(qv.toSeq)), 2)
          .as("d2"))
        .where(col("vec_id") =!= qid)
        .orderBy(col("d2"), col("vec_id")).limit(20)
        .collect().map(_.getLong(0)).toSet
      (qid, qv, gt)
    }
    val results = for (nProbe <- Seq(1, 4, 16)) yield {
      val perQuery = queries.map { case (qid, qv, gt) =>
        val ts = System.nanoTime()
        val ann = ProductQuantizer.ivfPqSearch(index, "vec_id", qv,
            nProbe = nProbe, k = 20, excludeId = Some(qid))
          .collect().map(_.getLong(0)).toSet
        val lat = (System.nanoTime() - ts) / 1e9
        val tr = System.nanoTime()
        val refined = ProductQuantizer.ivfPqSearchRefined(index, vecs,
            "vec_id", "embedding", qv, nProbe = nProbe, k = 20,
            refine = 10, excludeId = Some(qid))
          .collect().map(_.getLong(0)).toSet
        val latR = (System.nanoTime() - tr) / 1e9
        val ta = System.nanoTime()
        val adaptive = ProductQuantizer.ivfPqSearchRefinedAdaptive(index,
            vecs, "vec_id", "embedding", qv, nProbe = nProbe, k = 20,
            initialRefine = 10, excludeId = Some(qid))
          .collect().map(_.getLong(0)).toSet
        val latA = (System.nanoTime() - ta) / 1e9
        (lat, ann.intersect(gt).size / 20.0,
          latR, refined.intersect(gt).size / 20.0,
          latA, adaptive.intersect(gt).size / 20.0)
      }
      val lats = perQuery.map(_._1).sorted
      val rec = perQuery.map(_._2).sum / perQuery.size
      val latsR = perQuery.map(_._3).sorted
      val recR = perQuery.map(_._4).sum / perQuery.size
      val latsA = perQuery.map(_._5).sorted
      val recA = perQuery.map(_._6).sum / perQuery.size
      System.err.println(f"[ivfpq-scale] nProbe=$nProbe%-3d " +
        f"adc lat ${lats(lats.size / 2)}%.2f s recall $rec%.2f | " +
        f"refined lat ${latsR(latsR.size / 2)}%.2f s recall $recR%.2f | " +
        f"adaptive lat ${latsA(latsA.size / 2)}%.2f s recall $recA%.2f")
      (nProbe, lats(lats.size / 2), rec, latsR(latsR.size / 2), recR,
        latsA(latsA.size / 2), recA)
    }

    val resStr = results.map { case (p, l, r, lr, rr, la, ra) =>
      f"""{"n_probe":$p,"serve_median_sec":$l%.2f,"recall_at_20":$r%.2f,"refined_median_sec":$lr%.2f,"refined_recall_at_20":$rr%.2f,"adaptive_median_sec":$la%.2f,"adaptive_recall_at_20":$ra%.2f}"""
    }.mkString("[", ",", "]")
    println(f"""{"workload":"ivfpq_scale","vectors":$n,"k_cells":$kCells,"iters":$iters,"members_per_cluster":$members,"build_sec":$buildSec%.1f,"index_bytes":$idxBytes,"raw_bytes":$rawBytes,"results":$resStr}""")
    spark.stop()
  }
}
