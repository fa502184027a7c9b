package graft.tools

import org.apache.spark.sql.functions._

import graft.Session
import graft.sim.Similarity

/** Scale probe for the vector-similarity family beyond the sf tables
  * (2k vectors): generates N synthetic 64-dim vectors with PLANTED
  * near-dups (every vec_id ≡ 1 (mod 100) is its predecessor with one
  * component nudged → cosine ≈ 0.9999 vs a ~0-centered background),
  * then measures (a) full-corpus LSH near-dup detection with planted
  * recall, and (b) IVF index build + repeated serve latency.
  *
  * Usage: runMain graft.tools.SimBench [numVectorsThousands]
  */
object SimBench {
  def main(args: Array[String]): Unit = {
    val nK = args.headOption.map(_.toInt).getOrElse(100)
    val n = nK * 1000L
    val spark = Session.get("sim-bench")

    val base = when(pmod(col("id"), lit(100)) === 1, col("id") - 1)
      .otherwise(col("id"))
    val vec = transform(sequence(lit(0), lit(63)),
      i => ((pmod(xxhash64(base, i), lit(2001)) - 1000) / 1000.0)
        .cast("float"))
    // planted near-dup: nudge component 0 by +0.01
    val nudged = transform(vec,
      (x, i) => when(pmod(col("id"), lit(100)) === 1 && i === 0,
        x + 0.01f).otherwise(x))
    val vecs = spark.range(n)
      .select(col("id").as("vec_id"), nudged.as("embedding"),
        (pmod(col("id"), lit(100)) === 1).as("planted"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = vecs.count()
    System.err.println(s"[sim-bench] generated $total vectors")

    // (a) full-corpus LSH near-dup at a high-similarity threshold,
    // bands AUTO-SIZED from the corpus count (1M → 2 bands × 16 bits:
    // 65k buckets, occupancy ≈ N/65k, per-band recall at cos 0.9999
    // (θ≈0.8°) is 0.9975^16 ≈ 0.96, two bands ≈ 0.998). The old toy
    // default (8 × 4 bits = 16 buckets) generates ~2.5e9 candidate
    // pairs at N=100k — the candidate-volume line below measures both.
    graft.functions.VectorFunctions.register(spark)
    val autoBands = Similarity.autoLshBands(32, total)
    for (bands <- Seq(8, autoBands).distinct) {
      val planes = Similarity.hyperplanes(32, 64)
      val vol = vecs.select(posexplode(
          Similarity.lshBuckets(col("embedding"), planes, bands)))
        .groupBy(col("pos"), col("col")).count()
        .agg(sum(col("count") * (col("count") - 1)).as("v"))
        .first().getLong(0) / 2
      println(f"""{"workload":"lsh_candidate_volume","vectors":$total,"bands":$bands,"bits":${32 / bands},"candidates":$vol}""")
    }
    val t0 = System.nanoTime()
    val pairs = Similarity.lshNearDupPairs(vecs, "vec_id", "embedding",
      threshold = 0.99, numPlanes = 32, corpusCountEstimate = total)
      .select(col("id_a"), col("id_b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val found = pairs.count()
    val dtLsh = (System.nanoTime() - t0) / 1e9
    val planted = vecs.where(col("planted"))
      .select((col("vec_id") - 1).as("id_a"), col("vec_id").as("id_b"))
    val nPlanted = planted.count()
    val recalled = planted.join(pairs, Seq("id_a", "id_b"), "left_semi").count()

    // (b) IVF: one build, several serves
    val t1 = System.nanoTime()
    val idx = Similarity.buildIvfIndex(vecs, "embedding", nCells = 64)
    idx.cells.count()
    val dtBuild = (System.nanoTime() - t1) / 1e9
    val serveTimes = (1 to 3).map { i =>
      val t = System.nanoTime()
      Similarity.ivfSearch(idx, "vec_id", "embedding", queryId = i * 37L,
        k = 20, nProbe = 8).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t) / 1e9
    }
    println(f"""{"workload":"vector_sim","vectors":$total,"lsh_seconds":$dtLsh%.2f,"pairs_found":$found,"planted":$nPlanted,"planted_recalled":$recalled,"ivf_build_seconds":$dtBuild%.2f,"ivf_serve_seconds":${serveTimes.min}%.2f}""")
    spark.stop()
  }
}
