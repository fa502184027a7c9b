package graft.tools

import org.apache.spark.sql.functions._

import graft.Session

/** Scale probe for Attribution.touchAttribution: the operator's one
  * hazard is per-user skew — a bot user's touches fan out against
  * each of its conversions inside the lookback, so the join cost per
  * user is |convs| × |touches-in-window|, bounded in TIME by the
  * lookback but not in rows. The probe plants a bot carrying `botPct`
  * of all events on one user id over a 90-day span and measures the
  * attributed-pair count and wall as the lookback widens — the knob a
  * deployment actually turns.
  *
  * Usage: runMain graft.tools.AttributionProbe [eventsMillions] [botPct]
  */
object AttributionProbe {
  def main(args: Array[String]): Unit = {
    val nM = args.headOption.map(_.toInt).getOrElse(50)
    val botPct = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val n = nM * 1000000L
    val spark = Session.get("attribution-probe")
    spark.sparkContext.setLogLevel("WARN")
    val spanDays = 90L
    val users = 1000000L

    val ev = spark.range(n)
      .select(col("id").as("event_id"),
        // botPct% of traffic on user 0, rest uniform over 1..users
        when(pmod(xxhash64(col("id"), lit("u")), lit(100)) < botPct, 0L)
          .otherwise(pmod(xxhash64(col("id"), lit("v")), lit(users)) + 1)
          .as("user_id"),
        timestamp_micros(lit(1704067200000000L) + // 2024-01-01 UTC
          expr(s"cast((cast(id as decimal(38,0)) * " +
            s"${spanDays * 86400000000L}) div ${n}L as bigint)")).as("ts"),
        when(pmod(col("id"), lit(50)) === 0, "purchase")
          .when(pmod(col("id"), lit(2)) === 0, "click")
          .otherwise("view").as("event_type"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val total = ev.count()
    val botEvents = ev.where(col("user_id") === 0L).count()

    for (lookback <- Seq(1, 7)) {
      val t0 = System.nanoTime()
      val out = graft.ops.Attribution.touchAttribution(
          ev, "user_id", "ts", "event_id", "event_type",
          "purchase", Seq("click", "view"), lookbackDays = lookback)
        .collect()
      val sec = (System.nanoTime() - t0) / 1e9
      val touches = out.map(r => r.getLong(3)).sum
      val convs = out.map(r => r.getLong(1)).sum
      println(f"""{"workload":"attribution","events":$total,"bot_events":$botEvents,"lookback_days":$lookback,"attributed_touches":$touches,"last_touch_convs":$convs,"seconds":$sec%.1f}""")
    }
    spark.stop()
  }
}
