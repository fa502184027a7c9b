package graft.tools

import org.apache.spark.sql.functions._

import graft.Session
import graft.functions.VectorFunctions

/** A/B probe: flat QVecNearestL2 vs blocked kernel on the same
  * synthetic 1M×64 assignment at large k — the crossover measurement
  * behind KMeans.assign's kernel choice.
  *
  * Usage: runMain graft.tools.AssignKernelProbe [numVectorsThousands] [k]
  */
object AssignKernelProbe {
  def main(args: Array[String]): Unit = {
    val nK = args.headOption.map(_.toInt).getOrElse(1000)
    val k = args.lift(1).map(_.toInt).getOrElse(1024)
    val n = nK * 1000L
    val spark = Session.get("assign-kernel-probe")
    VectorFunctions.register(spark)
    val label = pmod(col("id"), lit(k))
    val anchor = (i: org.apache.spark.sql.Column) =>
      (pmod(xxhash64(label, i), lit(2001)) - 1000) / 1000.0
    val noise = (i: org.apache.spark.sql.Column) =>
      (pmod(xxhash64(col("id"), i), lit(101)) - 50) / 1000.0
    val vec = transform(sequence(lit(0), lit(63)),
      i => round((anchor(i) + noise(i)) * 10000).cast("long"))
    val vecs = spark.range(n).select(col("id"), vec.as("qv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    vecs.count()
    val rnd = new scala.util.Random(11)
    val mat = Seq.fill(k * 64)(rnd.nextInt(20001) - 10000L)
    def time(c: org.apache.spark.sql.Column): (Double, Long) = {
      val t0 = System.nanoTime()
      val s = vecs.select(element_at(c, 1).as("j"))
        .agg(sum(col("j"))).first().getLong(0)
      ((System.nanoTime() - t0) / 1e9, s)
    }
    val (tF, sF) = time(VectorFunctions.q_vec_nearest_l2(col("qv"), typedLit(mat)))
    val (tB, sB) = time(VectorFunctions.q_vec_nearest_l2_blocked(col("qv"), typedLit(mat), k))
    require(sF == sB, s"kernel results diverge: $sF vs $sB")
    println(f"""{"workload":"assign_kernel","vectors":$n,"k":$k,"flat_sec":$tF%.2f,"blocked_sec":$tB%.2f,"checksum_equal":true}""")
    spark.stop()
  }
}
