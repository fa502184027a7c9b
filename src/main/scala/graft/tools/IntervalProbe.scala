package graft.tools

import org.apache.spark.sql.functions._

import graft.Session
import graft.ops.IntervalJoin

/** Scale probe for IntervalJoin.selfOverlap: N synthetic sessions
  * (hash-scrambled starts over a 10-year span, durations 0–1 h) paired
  * by the grid join at several cell widths. Validity is the operator's
  * own law at scale: the grid is an implementation detail, so pair
  * count and total overlap mass must be IDENTICAL across cell widths
  * (the IntervalJoinSpec invariance test, run where a wrong
  * attribution rule would actually show up — millions of multi-cell
  * pairs). Cost sensitivity: too-small cells explode long intervals
  * onto many cells; too-large cells pack unrelated intervals into the
  * same cell and pay false-candidate predicate evaluations. The probe
  * prices both sides of that trade.
  *
  * Usage: runMain graft.tools.IntervalProbe [millions] [cellWidths]
  * (default 10 million, widths 450,1800,7200,28800 s)
  */
object IntervalProbe {

  def main(args: Array[String]): Unit = {
    val nM = args.headOption.map(_.toInt).getOrElse(10)
    val widths = args.lift(1).map(_.split(",").toSeq.map(_.toLong))
      .getOrElse(Seq(450L, 1800L, 7200L, 28800L))
    val n = nM * 1000000L
    val spanSec = 315360000L // 10 years
    val spark = Session.get("interval-probe")
    spark.sparkContext.setLogLevel("ERROR")

    val ivs = spark.range(n)
      .select(col("id"),
        pmod(xxhash64(col("id"), lit(1)), lit(spanSec)).as("s"))
      .withColumn("e",
        col("s") + pmod(xxhash64(col("id"), lit(2)), lit(3600L)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ivs.count()

    var ref: Option[(Long, Long)] = None
    widths.foreach { w =>
      val t0 = System.nanoTime()
      val agg = IntervalJoin.selfOverlap(ivs, Seq("id"), "s", "e", w)
        .agg(count(lit(1)).as("pairs"), sum(col("overlap")).as("mass"))
        .head()
      val sec = (System.nanoTime() - t0) / 1e9
      val cur = (agg.getLong(0), agg.getLong(1))
      val ok = ref.forall(_ == cur); ref = ref.orElse(Some(cur))
      println(f"[interval-probe] n=$n%d cellWidth=$w%d wall=$sec%.1f s " +
        f"pairs=${cur._1}%d mass=${cur._2}%d " +
        f"agree=${if (ok) "OK" else "BROKEN"}")
    }
    spark.stop()
  }
}
