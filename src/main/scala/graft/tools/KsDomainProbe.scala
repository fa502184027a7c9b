package graft.tools

import org.apache.spark.sql.functions._

import graft.Session
import graft.ops.Profiling

/** Measures the hazard [[Profiling.guardKsDomain]] exists to stop, so
  * the 2^20 `DefaultKsDomainCap` is a MEASURED boundary instead of a
  * scaladoc assertion ("far below where a per-group window sort
  * becomes a straggler task" — this probe puts numbers on "far").
  *
  * Fixed corpus (default 20M rows), ONE group — the worst case, since
  * the exact fold's window sorts each group's distinct values in a
  * single task — with the value domain swept from 2^14 up to
  * all-distinct (the raw-64-bit-doubles deployment mistake the guard
  * throws on). Two regimes are expected and measured:
  *
  *  - d << n: the counts aggregation combines map-side, the shuffle
  *    carries ~d rows, the single-task window sorts d rows — wall is
  *    flat in d and dominated by the corpus scan.
  *  - d → n: map-side combining stops helping (every key is rare),
  *    the shuffle carries ~n rows into ONE task, and the window sort
  *    is corpus-sized on that task — the straggler the cap refuses.
  *
  * [[Profiling.ksDriftBucketed]] (1024 bins) runs once on the
  * all-distinct frame as the comparator: the scale path's wall on
  * exactly the input the exact fold cannot take.
  *
  * Each point is median-of-3 (the box-noise discipline); the guard is
  * disabled (`domainCap = 0`) because the probe IS the hazard.
  *
  * Usage: runMain graft.tools.KsDomainProbe [rowsMillions]
  *          [log2DomainList, default "14,17,20,22,25"]
  */
object KsDomainProbe {
  def main(args: Array[String]): Unit = {
    val nM = args.headOption.map(_.toDouble).getOrElse(20.0)
    val n = (nM * 1000000L).toLong
    val log2s = args.lift(1).getOrElse("14,17,20,22,25")
      .split(',').map(_.trim.toInt).toSeq
    val spark = Session.get("ks-domain-probe")
    spark.sparkContext.setLogLevel("ERROR")

    val base = spark.range(n)
      .select(col("id"), xxhash64(col("id")).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    base.count()

    def median3(f: => Unit): Double = {
      val ds = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }.sorted
      ds(1)
    }

    val points = log2s.map { lg =>
      val d = 1L << lg
      // pmod folds the hash into [0, d); with n >> d every residue is
      // hit, with d >= n values are effectively all-distinct
      val df = base.select(
        lit("x").as("g"),
        (if (d >= n) col("h") else pmod(col("h"), lit(d))).as("v"),
        (col("id") % 2 === 0).as("p"))
      val sec = median3 {
        Profiling.ksDrift(df, Seq("g"), col("v"), col("p"),
            domainCap = 0L)
          .write.format("noop").mode("overwrite").save()
      }
      val label = if (d >= n) s"2^$lg(all-distinct)" else s"2^$lg"
      System.err.println(f"[ks-domain] d=$label exact fold $sec%.2f s")
      s""""$label":${f2(sec)}"""
    }

    // the scale path on the input the exact fold cannot take
    val raw = base.select(lit("x").as("g"), col("h").as("v"),
      (col("id") % 2 === 0).as("p"))
    val bucketedSec = median3 {
      Profiling.ksDriftBucketed(raw, Seq("g"), col("v"), col("p"),
          buckets = 1024)
        .write.format("noop").mode("overwrite").save()
    }

    println(s"""{"workload":"ks_domain","rows":$n,"exact_sec":{${points.mkString(",")}},"bucketed_1024_sec":${f2(bucketedSec)},"cap":${Profiling.DefaultKsDomainCap}}""")
    spark.stop()
  }

  private def f2(v: Double) =
    String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
}
