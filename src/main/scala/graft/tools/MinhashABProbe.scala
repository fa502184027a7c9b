package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Partitioning.fanOut
import graft.sources.Tables
import graft.text.{Dedup, TextFunctions}

/** Dev probe: full minhashNearDups cost with the map-side (zip) vs
  * window-lead shingle frame, one JVM, 3 timed runs each.
  */
object MinhashABProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Session.builder("minhash-ab", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val n = 3

    def windowEx: DataFrame = {
      val toks = fanOut(docs)
        .select(col("doc_id").as("id"),
          posexplode(TextFunctions.tokens(col("text"))))
        .withColumnsRenamed(Map("pos" -> "p", "col" -> "t0"))
      val w = Window.partitionBy(col("id")).orderBy(col("p"))
      val withLeads = (1 until n).foldLeft(toks) { (d, i) =>
        d.withColumn(s"t$i", lead(col("t0"), i).over(w))
      }
      withLeads.where(col(s"t${n - 1}").isNotNull)
        .select(col("id"),
          xxhash64((0 until n).map(i => col(s"t$i")): _*).as("s"))
    }

    def run(ex: DataFrame): Unit = {
      val p = ex.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // replicate minhashNearDups stages on the prebuilt frame via the
      // public pieces: signatures + banding self-join + verify
      Dedup.minhashNearDupsFromFrame(p, threshold = 0.5, numHashes = 32,
        bands = 16, estThreshold = 0.35)
        .write.format("noop").mode("overwrite").save()
      p.unpersist(true)
    }

    // map-side, no structs: transform token indices straight to the
    // 3-token xxhash64, explode the resulting long array
    def transformEx: DataFrame = {
      val t = col("__tk")
      val len = greatest(size(t) - (n - 1), lit(0))
      fanOut(docs)
        .select(col("doc_id").as("id"),
          TextFunctions.tokens(col("text")).as("__tk"))
        .select(col("id"),
          explode(transform(sequence(lit(1), len),
            i => xxhash64((0 until n).map(k => element_at(t, i + k)): _*)))
            .as("s"))
    }

    // map-side, hash tokens to longs FIRST (one string hash per token,
    // not per shingle slot), then combine 3 longs per shingle
    def hashFirstEx: DataFrame = {
      val th = col("__th")
      val len = greatest(size(th) - (n - 1), lit(0))
      fanOut(docs)
        .select(col("doc_id").as("id"),
          transform(TextFunctions.tokens(col("text")), t => xxhash64(t))
            .as("__th"))
        .select(col("id"),
          explode(transform(sequence(lit(1), len),
            i => xxhash64((0 until n).map(k => element_at(th, i + k)): _*)))
            .as("s"))
    }

    // warm the shapes once
    run(Dedup.shingleHashFrame(docs, "doc_id", "text", n,
      distinctShingles = false))
    run(windowEx)
    run(transformEx)
    run(hashFirstEx)
    Seq("zip" -> (() => Dedup.shingleHashFrame(docs, "doc_id", "text", n,
          distinctShingles = false)),
        "window" -> (() => windowEx),
        "transform" -> (() => transformEx),
        "hashfirst" -> (() => hashFirstEx),
        "zip2" -> (() => Dedup.shingleHashFrame(docs, "doc_id", "text", n,
          distinctShingles = false)),
        "window2" -> (() => windowEx),
        "transform2" -> (() => transformEx),
        "hashfirst2" -> (() => hashFirstEx))
      .foreach { case (tag, mk) =>
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          run(mk())
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[ab] $tag%-8s min=${times.min}%5.2f s (${times.map(t => f"$t%.2f").mkString(",")})")
      }
    spark.stop()
  }
}
