package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Session
import graft.ops.Resample

/** Scale probe for the trailing-window exact quantile: N synthetic
  * (key, day, value) observations, trailing-`window`-day median per
  * (key, day) — prices the distribution-counts + day-spine shape
  * against the naive per-anchor EXPLODE (each raw row duplicated
  * `window` times before a per-anchor aggregate — the formulation the
  * operator exists to avoid; its shuffled volume scales with
  * window×rows, ours with the distribution size). Both produce
  * identical results (asserted on a 1e6-row prefix); values are
  * quantized to 100 distinct levels per key so the distribution frame
  * is genuinely smaller than the corpus — the operator's intended
  * regime (quantized scores, bucketed metrics).
  *
  * Usage: runMain graft.tools.RollingQProbe [rowsMillions] [windowDays]
  */
object RollingQProbe {
  def main(args: Array[String]): Unit = {
    val nM = args.headOption.map(_.toInt).getOrElse(50)
    val w = args.lift(1).map(_.toInt).getOrElse(28)
    val n = nM * 1000000L
    val spark = Session.builder("rollingq-probe", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 200 keys × 365 days; value = one of 100 quantized levels
    val rows = spark.range(n).select(
      pmod(xxhash64(col("id")), lit(200L)).as("key"),
      pmod(xxhash64(col("id"), lit(1)), lit(365L)).as("day"),
      pmod(xxhash64(col("id"), lit(2)), lit(100L)).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    rows.count()

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val (distRows, tOps) = timed {
      Resample.rollingQuantile(rows, Seq("key"), col("day"), col("v"),
        windowDays = w, num = 1L, den = 2L).count()
    }
    System.err.println(f"[rollingq] distribution+spine: $tOps%.1f s ($distRows rows)")

    // naive explode: every raw row lands in each of its w anchor days
    val (naiveRows, tNaive) = timed {
      val exploded = rows.select(col("key"), col("v"),
        explode(sequence(col("day"), col("day") + (w - 1))).as("win_day"))
      val wCdf = Window.partitionBy(col("key"), col("win_day")).orderBy(col("v"))
      val wTot = Window.partitionBy(col("key"), col("win_day"))
      exploded.groupBy(col("key"), col("win_day"), col("v"))
        .agg(count(lit(1)).as("n"))
        .withColumn("cum", sum(col("n")).over(wCdf))
        .withColumn("tot", sum(col("n")).over(wTot))
        .where(col("cum") * 2 >= col("tot"))
        .groupBy(col("key"), col("win_day"))
        .agg(min(col("v")).as("q"))
        .count()
    }
    System.err.println(f"[rollingq] naive explode:      $tNaive%.1f s ($naiveRows rows)")

    // equivalence on a bounded prefix (restrict anchors to observed days)
    val small = rows.limit(1000000)
    val a = Resample.rollingQuantile(small, Seq("key"), col("day"),
        col("v"), w, 1L, 2L)
      .select(col("key"), col("win_day"), col("q")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val days = small.select(col("day").as("win_day")).distinct()
    val b = small.select(col("key"), col("v"),
        explode(sequence(col("day"), col("day") + (w - 1))).as("win_day"))
      .join(days, Seq("win_day"), "left_semi")
      .groupBy(col("key"), col("win_day"), col("v"))
      .agg(count(lit(1)).as("n"))
      .withColumn("cum", sum(col("n")).over(
        Window.partitionBy(col("key"), col("win_day")).orderBy(col("v"))))
      .withColumn("tot", sum(col("n")).over(
        Window.partitionBy(col("key"), col("win_day"))))
      .where(col("cum") * 2 >= col("tot"))
      .groupBy(col("key"), col("win_day"))
      .agg(min(col("v")).as("q")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    require(a == b, s"formulations disagree: ${a.size} vs ${b.size}")
    System.err.println(s"[rollingq] equivalence on 1e6-row prefix: OK (${a.size} anchors)")

    println(f"""{"workload":"rolling_quantile","rows":$n,"window_days":$w,"ops_sec":$tOps%.1f,"naive_explode_sec":$tNaive%.1f}""")
    spark.stop()
  }
}
