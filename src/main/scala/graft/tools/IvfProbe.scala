package graft.tools

import graft.Session
import graft.sim.Similarity
import graft.sources.Tables

/** Dev probe: split IVF timing into build (train+assign+persist) vs
  * serve (per-query search) so the two are tuned separately.
  */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.builder("ivf-probe", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, sfDir)
    emb.count() // warm scan

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[ivf] $label%-20s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val idx = t("build") {
      val i = Similarity.buildIvfIndex(emb, "embedding", nCells = 16)
      i.cells.count() // force the persist
      i
    }
    (1 to 3).foreach { n =>
      t(s"search#$n") {
        Similarity.ivfSearch(idx, "vec_id", "embedding", 0L, 20, nProbe = 4)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
