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
  * Round-10 addition: prices globalRank's eager localCheckpoint
  * against two alternatives that avoid doubling I/O for rank-only
  * consumers —
  *  - `disk`: persist(DISK_ONLY) instead of localCheckpoint — same
  *    boundary-pinning guarantee (first action computes and caches,
  *    later reads hit the cache), serialized-on-disk storage instead
  *    of block replication;
  *  - `twopass`: NO materialization at all. Boundaries are sampled
  *    ONCE on the driver (0.1% sample → exact-quantile cut points,
  *    P−1 longs) and baked into the plan as a literal binary-search
  *    `when` tree, so bucket assignment is a pure function of the key
  *    and recomputation CANNOT disagree. Pass 1 scans for per-bucket
  *    counts (partial-agg, ≤P rows to the driver); pass 2 ranks with
  *    row_number over Window.partitionBy(bucket) and adds the literal
  *    offset map. Costs two source scans + one window shuffle, zero
  *    checkpoint writes.
  *
  * Usage: runMain graft.tools.RankProbe [millions] [compareNaive01] [strategies=lc,disk,twopass]
  */
object RankProbe {

  def main(args: Array[String]): Unit = {
    val nM = args.headOption.map(_.toInt).getOrElse(50)
    val naive = args.lift(1).contains("1")
    val strategies = args.lift(2).map(_.split(",").toSeq)
      .getOrElse(Seq("lc"))
    val n = nM * 1000000L
    val spark = Session.get("rank-probe")
    spark.sparkContext.setLogLevel("ERROR")

    val df = spark.range(n)
      .select(col("id"), xxhash64(col("id"), lit(13)).as("k"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    df.count()

    def check(ranked: org.apache.spark.sql.DataFrame, label: String,
        t0: Long): Unit = {
      val inv = ranked.agg(sum(col("r")).as("s"), min(col("r")).as("lo"),
        max(col("r")).as("hi"), count(lit(1)).as("c")).head()
      val sec = (System.nanoTime() - t0) / 1e9
      val ok = inv.getLong(0) == n * (n + 1) / 2 &&
        inv.getLong(1) == 1L && inv.getLong(2) == n && inv.getLong(3) == n
      println(f"[rank-probe] $label%s n=${n}%d wall=${sec}%.2f s " +
        f"invariants=${if (ok) "OK" else s"BROKEN $inv"}")
    }

    strategies.foreach {
    case "lc" =>
      // the round-9 shape, kept for the A/B record
      val t0 = System.nanoTime()
      val ranged = df.repartitionByRange(col("k"), col("id"))
        .withColumn("__pid", spark_partition_id())
        .localCheckpoint(true)
      val offsets = ranged.groupBy(col("__pid"))
        .agg(count(lit(1)).as("__n"))
        .withColumn("__offset",
          coalesce(sum(col("__n")).over(
            org.apache.spark.sql.expressions.Window.orderBy(col("__pid"))
              .rowsBetween(org.apache.spark.sql.expressions.Window
                .unboundedPreceding, -1)), lit(0L)))
        .drop("__n")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__pid")).orderBy(col("k"), col("id"))
      val ranked = ranged.join(broadcast(offsets), Seq("__pid"))
        .withColumn("r", (col("__offset") + row_number().over(w)).cast("long"))
        .drop("__pid", "__offset")
      check(ranked, "globalRank(round-9 localCheckpoint)", t0)

    case "disk" =>
      val t0 = System.nanoTime()
      check(Ranking.globalRank(df, Seq(col("k"), col("id")), "r"),
        "globalRank(pinned DISK_ONLY)", t0)

    case "twopass" =>
      val t0 = System.nanoTime()
      check(Ranking.globalRankLean(df, Seq(col("k"), col("id")), "r"),
        "globalRankLean(twopass deterministic bounds)", t0)

    case other => System.err.println(s"[rank-probe] unknown strategy $other")
    }

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
