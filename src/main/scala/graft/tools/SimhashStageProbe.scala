package graft.tools

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.text.Dedup

/** Dev probe: stage-level timing of simhashVerifiedNearDups at sf0.1 —
  * which stage regressed under the map-side shingle build?
  */
object SimhashStageProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Session.builder("simhash-stage-probe", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stage] $tag%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    // warm codegen shapes
    docs.select(xxhash64(col("text"))).write.format("noop").mode("overwrite").save()

    val ex = Dedup.shingleHashFrame(docs, "doc_id", "text", 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("ex build+persist (count)") { ex.count() }
    val sig = Dedup.simhashSignaturesFrom(ex)
    time("signatures agg") {
      sig.write.format("noop").mode("overwrite").save()
    }
    time("full verified pipeline (2nd ex use)") {
      Dedup.simhashVerifiedNearDups(docs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
    }
    time("full verified pipeline again") {
      Dedup.simhashVerifiedNearDups(docs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
    }
    ex.unpersist()
    spark.stop()
  }
}
