package graft.tools

import org.apache.spark.sql.functions._

import graft.Session

/** Detection-latency face-off for the monitor family: on a planted
  * level shift (flat 1000/day for 60 days, then ×mag), which chart
  * alarms first — the EWMA ±50% band (q_ewma_band defaults) or the
  * CUSUM chart (q_cusum_drift defaults: first-week reference, 10%
  * slack, 2·μ̂ threshold)? The trade is textbook (EWMA reacts to big
  * shifts in one day but never alarms inside its band; CUSUM
  * accumulates small persistent shifts) — this probe turns it into
  * the table an alerting deployment actually tunes from.
  *
  * Usage: runMain graft.tools.MonitorProbe
  */
object MonitorProbe {
  def main(args: Array[String]): Unit = {
    val spark = Session.get("monitor-probe")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val preDays = 60
    val postDays = 30
    val baseRate = 1000L
    for (magPct <- Seq(105, 110, 120, 150, 200, 300)) {
      val daily = (1 to preDays + postDays).map { d =>
        val c = if (d <= preDays) baseRate else baseRate * magPct / 100
        ("s", java.sql.Date.valueOf(java.time.LocalDate
          .of(2024, 1, 1).plusDays(d - 1)), c)
      }.toDF("k", "day", "c")
      val ew = graft.ops.Forecast.ewmaFromDaily(daily, "k").collect().head
      val ewDay = Option(ew.getString(ew.fieldIndex("first_high_day")))
      val cu = graft.ops.Changepoint.cusumFromDaily(
        daily, "event_type", refDays = 7, slackPpm = 100000L,
        hPpm = 2000000L).collect().head
      val cuDay = Option(cu.getString(cu.fieldIndex("up_alarm_day")))
      def latency(d: Option[String]): String = d match {
        case Some(s) =>
          val shift = java.time.LocalDate.of(2024, 1, 1).plusDays(preDays)
          s"+${java.time.temporal.ChronoUnit.DAYS.between(
            shift, java.time.LocalDate.parse(s))}d"
        case None => "never"
      }
      println(f"[probe] shift=${magPct}%% ewma=${latency(ewDay)}%-6s " +
        f"cusum=${latency(cuDay)}%-6s")
    }
    spark.stop()
  }
}
