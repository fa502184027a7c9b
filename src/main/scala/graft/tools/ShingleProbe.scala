package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Partitioning.fanOut
import graft.sources.Tables
import graft.text.TextFunctions

/** Dev probe: shingle-frame build strategies at sf0.1. The window-lead
  * form shuffles every token row on id; the zip forms stay map-side.
  */
object ShingleProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Session.builder("shingle-probe", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")

    def time(tag: String)(df: => DataFrame): Unit = {
      // warm once, then 3 timed runs (box variance)
      df.write.format("noop").mode("overwrite").save()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[shingle] $tag%-28s min=${times.min}%5.2f s  (${times.map(t => f"$t%.2f").mkString(",")})")
    }

    val n = 3
    // current: explode tokens, window-lead per id
    time("window-lead (current)") {
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

    // map-side: zip the token array against its own 1- and 2-shifted
    // slices, explode structs, hash
    time("arrays_zip+slice") {
      val t = TextFunctions.tokens(col("text"))
      fanOut(docs)
        .select(col("doc_id").as("id"),
          explode(arrays_zip(
            slice(t, lit(1), greatest(size(t) - (n - 1), lit(0))),
            slice(t, lit(2), greatest(size(t) - (n - 1), lit(0))),
            slice(t, lit(3), greatest(size(t) - (n - 1), lit(0))))).as("z"))
        .select(col("id"), xxhash64(col("z.0"), col("z.1"), col("z.2")).as("s"))
        .distinct()
    }

    // map-side zip with the token array aliased in its own projection
    // (tokens referenced 4x non-cheaply -> CollapseProject keeps it)
    time("zip+aliased-tokens") {
      val tk = col("tk")
      val len = greatest(size(tk) - (n - 1), lit(0))
      fanOut(docs)
        .select(col("doc_id").as("id"),
          TextFunctions.tokens(col("text")).as("tk"))
        .select(col("id"),
          explode(arrays_zip(
            (1 to n).map(i => slice(tk, lit(i), len)): _*)).as("z"))
        .select(col("id"), xxhash64(col("z.0"), col("z.1"), col("z.2")).as("s"))
        .distinct()
    }

    // map-side HOF: transform over index range building concat strings
    time("transform-HOF") {
      val t = TextFunctions.tokens(col("text"))
      fanOut(docs)
        .select(col("doc_id").as("id"),
          explode(transform(sequence(lit(1), greatest(size(t) - (n - 1), lit(0))),
            i => concat_ws(" ", element_at(t, i), element_at(t, i + 1),
              element_at(t, i + 2)))).as("g"))
        .select(col("id"), xxhash64(col("g")).as("s"))
        .distinct()
    }
    spark.stop()
  }
}
