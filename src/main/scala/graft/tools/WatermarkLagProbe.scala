package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.Session
import graft.streaming.StreamingLateData

/** Decisive probe for the late-filter watermark's batch origin (r13
  * ADVICE on q_stream_late_pivot_update's oracle): with the documented
  * one-batch lag, is batch 2's late-input filter the watermark derived
  * from batch 0's data only, or from batches 0 AND 1?
  *
  * The existing StreamingSpec fixture cannot distinguish the two (its
  * batch-0 and batch-1 maxima land on the same day, and the pivot is
  * day-granular). Here they differ by 4 days and the probe row's
  * window end falls strictly between the two candidate filters:
  *
  *   delay = 1 hour
  *   batch 0: day1 10:00       -> wm(after b0) = day1 09:00
  *   batch 1: day5 23:00       -> wm(after b1) = day5 22:00
  *   batch 2: day3 12:00 LATE  -> window end day4 00:00
  *     kept under wm(after b0)  (day4 00:00 > day1 09:00)
  *     dropped under wm(after b1) (day4 00:00 <= day5 22:00)
  *
  * Append output: a row passing the late filter always reaches the
  * sink eventually (eviction or sentinel flush), so presence of the
  * day3 row in the output IS the filter verdict.
  */
object WatermarkLagProbe {
  def main(args: Array[String]): Unit = {
    val spark = Session.builder("wm-lag-probe", "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val b0 = Seq((ts("2024-01-01 10:00:00"), "a")).toDF("ts", "event_type")
    val b1 = Seq((ts("2024-01-05 23:00:00"), "a")).toDF("ts", "event_type")
    val b2 = Seq((ts("2024-01-03 12:00:00"), "a")).toDF("ts", "event_type")
    val sent = Seq((ts("2024-03-01 12:00:00"), "__wm_sentinel"))
      .toDF("ts", "event_type")
    val out = StreamingLateData.lateReplayPivot(
      spark, Seq(b0, b1, b2, sent, sent))
    val days = out.select(col("event_date").cast("string"))
      .as[String].collect().sorted.toSeq
    println(s"emitted event_dates: $days")
    val kept = days.contains("2024-01-03")
    println(if (kept)
      "VERDICT: day3 KEPT -> batch 2's late filter = wm(after batch 0)" +
        " — the two-batch-lagged mark; nc-only oracle wm is schedule-exact"
    else
      "VERDICT: day3 DROPPED -> batch 2's late filter = wm(after batch 1)" +
        " — includes batch-1 data; oracle wm must be max over batches 0+1")
    spark.stop()
  }
}
