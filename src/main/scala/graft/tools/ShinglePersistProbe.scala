package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Partitioning.fanOut
import graft.sources.Tables
import graft.text.{Dedup, TextFunctions}

/** Dev probe: persist + downstream-aggregate cost of the two shingle
  * frame builds — the un-persisted noop timings were equal, but the
  * simhash query regressed 2× under the zip form.
  */
object ShinglePersistProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Session.builder("shingle-persist-probe", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val n = 3

    def windowForm: DataFrame = {
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
        .distinct()
    }

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pp] $tag%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    // warm
    docs.select(xxhash64(col("text"))).write.format("noop").mode("overwrite").save()

    Seq("window" -> (() => windowForm),
        "zip" -> (() => Dedup.shingleHashFrame(docs, "doc_id", "text", n)))
      .foreach { case (tag, mk) =>
        val ex = mk().persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        time(s"$tag: persist build (count)") { ex.count() }
        time(s"$tag: sig agg from cache") {
          Dedup.simhashSignaturesFrom(ex).write.format("noop").mode("overwrite").save()
        }
        time(s"$tag: collect_set from cache") {
          ex.groupBy(col("id")).agg(collect_set(col("s")).as("sh"))
            .write.format("noop").mode("overwrite").save()
        }
        ex.unpersist()
      }
    spark.stop()
  }
}
