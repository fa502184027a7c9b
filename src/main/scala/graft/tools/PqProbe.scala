package graft.tools

import org.apache.spark.sql.functions._

import graft.Session
import graft.sim.{KMeans, ProductQuantizer}

/** Scale probe for product quantization beyond the sf tables: N
  * synthetic 64-dim vectors with planted cluster structure (as in
  * KMeansProbe), then train (m=8 × k=16, 2 iterations), encode, and
  * ADC top-20 — reporting each phase's wall time plus whether ADC
  * ranks the query's planted twin first (vec 1 ≡ vec 0's cluster).
  *
  * Usage: runMain graft.tools.PqProbe [numVectorsThousands]
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val nK = args.headOption.map(_.toInt).getOrElse(100)
    val n = nK * 1000L
    val spark = Session.get("pq-probe")

    val label = pmod(col("id"), lit(8))
    val anchor = (i: org.apache.spark.sql.Column) =>
      (pmod(xxhash64(label, i), lit(2001)) - 1000) / 1000.0
    val noise = (i: org.apache.spark.sql.Column) =>
      (pmod(xxhash64(col("id"), i), lit(101)) - 50) / 1000.0
    val vec = transform(sequence(lit(0), lit(63)),
      i => (anchor(i) + noise(i)).cast("float"))
    val vecs = spark.range(n)
      .select(col("id").as("vec_id"), vec.as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    vecs.count()
    System.err.println(s"[pq-probe] generated $n vectors")

    val t0 = System.nanoTime()
    val model = ProductQuantizer.train(vecs, "vec_id", "embedding",
      m = 8, k = 16, iters = 2)
    val trainSec = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val enc = ProductQuantizer.encode(vecs, "vec_id", "embedding", model)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    enc.count()
    val encodeSec = (System.nanoTime() - t1) / 1e9

    val query = vecs.where(col("vec_id") === 0L)
      .select(KMeans.quantize(col("embedding"))).head().getSeq[Long](0).toArray
    val t2 = System.nanoTime()
    val top = ProductQuantizer.adcTopK(enc, "vec_id", query, model,
      k = 20, excludeId = Some(0L)).collect()
    val adcSec = (System.nanoTime() - t2) / 1e9
    // every id ≡ 0 (mod 8) shares vec 0's planted cluster
    val sameCluster = top.count(_.getLong(0) % 8 == 0)

    println(f"""{"workload":"pq","vectors":$n,"train_sec":$trainSec%.2f,"encode_sec":$encodeSec%.2f,"adc_topk_sec":$adcSec%.2f,"top20_same_cluster":$sameCluster}""")
    spark.stop()
  }
}
