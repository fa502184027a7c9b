package graft.tools

import org.apache.spark.sql.functions._

import graft.{Session, SparkEntry}
import graft.sources.Tables
import graft.text.{Dedup, TextFunctions}

/** Throwaway profiling main for the minhash pipeline stages. */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val sf = "/root/testdata/sf0.1"
    val spark = Session.builder("mh-profile", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sf)

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    time("shingles-only") {
      graft.ops.Partitioning.fanOut(docs)
        .select(explode(TextFunctions.wordShingles(col("text"), 3)))
        .write.format("noop").mode("overwrite").save()
    }
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text", 3, 32)
    time("signatures") {
      sig.write.format("noop").mode("overwrite").save()
    }
    val sigCached = sig.cache()
    time("signatures-cached-build") { sigCached.count() }
    time("candidates-from-cached") {
      val bandCols = (0 until 16).map { b =>
        xxhash64((b * 2 until (b + 1) * 2).map(i => col(s"mh_$i")): _*)
      }
      val banded = sigCached.select(col("id"), posexplode(array(bandCols: _*)))
        .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_hash"))
      val pairs = banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      println("  raw band pairs: " + pairs.count())
      println("  distinct pairs: " + pairs.distinct().count())
    }
    time("full-neardup") {
      Dedup.minhashNearDups(docs, "doc_id", "text", 0.01, 3, 32, 16)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
