package graft.tools

import org.apache.spark.sql.functions._

import graft.Session
import graft.ops.Ranking

/** Scale probe for Ranking.globalRank: N rows with a hash-scrambled
  * sort key (no pre-order for the range partitioner to exploit),
  * ranked globally. Validity is checked by exact invariants — a
  * correct 1..N permutation has sum N(N+1)/2, min 1, max N, and N
  * distinct values (sum+min+max pin it given the count) — and the
  * contrast row ranks the SAME frame with the naive
  * row_number() OVER (ORDER BY …) single-partition window.
  *
  * Usage: runMain graft.tools.RankProbe [millions] [compareNaive01]
  */
object RankProbe {
  def main(args: Array[String]): Unit = {
    val nM = args.headOption.map(_.toInt).getOrElse(50)
    val naive = args.lift(1).contains("1")
    val n = nM * 1000000L
    val spark = Session.get("rank-probe")
    spark.sparkContext.setLogLevel("ERROR")

    val df = spark.range(n)
      .select(col("id"), xxhash64(col("id"), lit(13)).as("k"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    df.count()

    val t0 = System.nanoTime()
    val ranked = Ranking.globalRank(df, Seq(col("k"), col("id")), "r")
    val inv = ranked.agg(sum(col("r")).as("s"), min(col("r")).as("lo"),
      max(col("r")).as("hi"), count(lit(1)).as("c")).head()
    val sec = (System.nanoTime() - t0) / 1e9
    val ok = inv.getLong(0) == n * (n + 1) / 2 &&
      inv.getLong(1) == 1L && inv.getLong(2) == n && inv.getLong(3) == n
    println(f"[rank-probe] globalRank n=${n}%d wall=${sec}%.2f s " +
      f"invariants=${if (ok) "OK" else s"BROKEN $inv"}")

    if (naive) {
      val t1 = System.nanoTime()
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("k"), col("id"))
      val inv2 = df.withColumn("r", row_number().over(w).cast("long"))
        .agg(sum(col("r")).as("s")).head()
      val sec2 = (System.nanoTime() - t1) / 1e9
      println(f"[rank-probe] naive single-window n=${n}%d wall=${sec2}%.2f s " +
        f"sum_ok=${inv2.getLong(0) == n * (n + 1) / 2}")
    }
    spark.stop()
  }
}
