package graft.tools

import org.apache.spark.sql.functions._

import graft.Session
import graft.ops.HourPivot

/** Isolates the aggregation strategy cost of the hour pivot on a
  * pre-generated taxi input: 24×sum(when) one-phase vs count-then-pivot
  * two-phase vs plain count (the scan+group floor).
  */
object PivotProbe {
  def main(args: Array[String]): Unit = {
    val in = args(0)
    val spark = Session.get("pivot-probe")
    val df = spark.read.parquet(s"$in/*")
      .select(col("tpep_pickup_datetime").as("ts"),
        col("PULocationID").cast("long").cast("string").as("place"))
    def phase(name: String)(d: org.apache.spark.sql.DataFrame): Unit = {
      val t = System.nanoTime()
      d.write.format("noop").mode("overwrite").save()
      println(f"[pivot] $name: ${(System.nanoTime() - t) / 1e9}%.2f s")
    }
    phase("warm-scan")(df)
    val base = df.select(to_date(col("ts")).as("d"), col("place"),
      hour(col("ts")).as("h"))
    phase("floor:count-by-group")(
      base.groupBy("d", "place").count())
    phase("one-phase:24xsumwhen")(
      HourPivot.pivot(df, col("ts"), Seq("place")))
    val counted = base.groupBy("d", "place", "h")
      .agg(count(lit(1)).as("c"))
    val aggs = (0 until 24).map(i =>
      sum(when(col("h") === i, col("c")).otherwise(0L)).as(s"hour_$i"))
    phase("two-phase:count-then-pivot")(
      counted.groupBy("d", "place").agg(aggs.head, aggs.tail: _*))
    phase("one-phase-again")(
      HourPivot.pivot(df, col("ts"), Seq("place")))
    phase("two-phase-again")(
      counted.groupBy("d", "place").agg(aggs.head, aggs.tail: _*))
    // does the per-row long→string cast for the group key matter?
    val dfLong = spark.read.parquet(s"$in/*")
      .select(col("tpep_pickup_datetime").as("ts"),
        col("PULocationID").cast("long").as("place"))
    phase("pivot-long-place")(
      HourPivot.pivot(dfLong, col("ts"), Seq("place")))
    phase("pivot-string-place-again")(
      HourPivot.pivot(df, col("ts"), Seq("place")))
    spark.stop()
  }
}
