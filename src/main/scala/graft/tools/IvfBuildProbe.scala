package graft.tools

import org.apache.spark.sql.functions._
import graft.Session
import graft.sim.Similarity

/** Dev probe: which stage of the IVF build costs at scale? */
object IvfBuildProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100) * 1000L
    val spark = Session.get("ivf-build-probe")
    val vec = transform(sequence(lit(0), lit(63)),
      i => ((pmod(xxhash64(col("id"), i), lit(2001)) - 1000) / 1000.0)
        .cast("float"))
    val vecs = spark.range(n).select(col("id").as("vec_id"), vec.as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    vecs.count()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[ivfb] $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val cents = t("train (driver lloyd)") {
      Similarity.trainCentroids(vecs, "embedding", 64)
    }
    t("assign only (noop)") {
      Similarity.assignCells(vecs, "embedding", cents)
        .write.format("noop").mode("overwrite").save()
    }
    t("assign+repartition") {
      Similarity.assignCells(vecs, "embedding", cents)
        .repartition(col("cell"))
        .write.format("noop").mode("overwrite").save()
    }
    t("single vec_dot (noop)") {
      graft.functions.VectorFunctions.register(spark)
      vecs.select(graft.functions.VectorFunctions.vec_dot(col("embedding"),
        typedLit(cents(0).toSeq)).as("d"))
        .write.format("noop").mode("overwrite").save()
    }
    t("8-cell assign (noop)") {
      Similarity.assignCells(vecs, "embedding", cents.take(8))
        .write.format("noop").mode("overwrite").save()
    }
    System.err.println("[ivfb] plan: " +
      Similarity.assignCells(vecs, "embedding", cents.take(2))
        .queryExecution.executedPlan.toString.linesIterator.take(6).mkString(" | "))
    t("full build+count") {
      Similarity.buildIvfIndex(vecs, "embedding", 64).cells.count()
    }
    spark.stop()
  }
}
