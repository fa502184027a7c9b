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
  * Usage: runMain graft.tools.KnnJoinProbe [vectorsThousands] [queries]
  */
object KnnJoinProbe {
  def main(args: Array[String]): Unit = {
    val nK = args.headOption.map(_.toInt).getOrElse(100)
    val q = args.lift(1).map(_.toInt).getOrElse(100)
    val n = nK * 1000L
    val spark = Session.get("knn-probe")
    spark.sparkContext.setLogLevel("WARN")

    val vecs = spark.range(n)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(1), lit(64)), i =>
          (pmod(xxhash64(col("id"), i), lit(2000)).cast("float") -
            lit(1000.0f)) / lit(1000.0f)).cast("array<float>")
          .as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    vecs.count()

    val queries = vecs.where(col("vec_id") % (n / q) === 0)
    val t0 = System.nanoTime()
    val out = Similarity.knnJoin(vecs, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 10)
    val rows = out.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"workload":"knn_join","vectors":$n,"queries":$q,"k":10,"result_rows":$rows,"seconds":$sec%.2f}""")
    spark.stop()
  }
}
