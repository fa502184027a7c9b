package graft.tools

import org.apache.spark.sql.functions._

import graft.Session
import graft.sim.KMeans

/** Scale probe for distributed k-means beyond the sf tables: N
  * synthetic 64-dim vectors with PLANTED cluster structure (each
  * vector = one of `k` hash-derived anchors + small hash noise), then
  * `KMeans.fit` at k clusters × `iters` iterations. Reports wall time,
  * per-iteration breakdown, and clustering purity against the planted
  * ground truth (fraction of vectors whose learned cluster's majority
  * planted label matches their own — 1.0 means the partition was
  * recovered exactly up to renaming).
  *
  * Usage: runMain graft.tools.KMeansProbe [numVectorsThousands] [k] [iters]
  */
object KMeansProbe {
  def main(args: Array[String]): Unit = {
    val nK = args.headOption.map(_.toInt).getOrElse(100)
    val k = args.lift(1).map(_.toInt).getOrElse(8)
    val iters = args.lift(2).map(_.toInt).getOrElse(2)
    val n = nK * 1000L
    val spark = Session.get("kmeans-probe")

    // planted label = id mod k; anchor component ~ U(-1, 1) from the
    // label hash; noise ±0.05 from the (id, component) hash
    val label = pmod(col("id"), lit(k))
    val anchor = (i: org.apache.spark.sql.Column) =>
      (pmod(xxhash64(label, i), lit(2001)) - 1000) / 1000.0
    val noise = (i: org.apache.spark.sql.Column) =>
      (pmod(xxhash64(col("id"), i), lit(101)) - 50) / 1000.0
    val vec = transform(sequence(lit(0), lit(63)),
      i => (anchor(i) + noise(i)).cast("float"))
    val vecs = spark.range(n)
      .select(col("id").as("vec_id"), vec.as("embedding"),
        label.as("planted"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    vecs.count()
    System.err.println(s"[kmeans-probe] generated $n vectors, k=$k")

    val t0 = System.nanoTime()
    val assigned = KMeans.fit(vecs, "vec_id", "embedding", k, iters)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = assigned.count()
    val fitSec = (System.nanoTime() - t0) / 1e9

    // purity: majority planted label per learned cluster
    val purity = assigned
      .join(vecs.select(col("vec_id"), col("planted")), Seq("vec_id"))
      .groupBy(col("cluster"), col("planted")).count()
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("cluster"))
          .orderBy(col("count").desc)))
      .where(col("rn") === 1)
      .agg(sum(col("count"))).first().getLong(0).toDouble / total

    println(f"""{"workload":"kmeans_fit","vectors":$total,"k":$k,"iters":$iters,"fit_sec":$fitSec%.2f,"purity":$purity%.4f}""")
    spark.stop()
  }
}
