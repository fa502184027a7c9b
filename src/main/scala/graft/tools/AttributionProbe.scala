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
  * The BURST regime (round-12 verdict #4): the interval grid spreads
  * a bot whose traffic SPANS many lookback-width buckets, but a bot
  * whose whole burst sits INSIDE one bucket degenerates back to the
  * user-only hot-key shape for that bucket — one (user, bucket) key
  * carries |convs| × |touches| pair evaluations through one
  * partition. `burst` mode plants the bot's events in a half-day
  * span (one bucket at every probed lookback) and prices the plain
  * grid against the salted rung (saltFactor 32), asserting the two
  * aggregate outputs identical.
  *
  * Usage: runMain graft.tools.AttributionProbe [eventsMillions] [botPct|botPermille] [spread|burst]
  */
object AttributionProbe {
  def main(args: Array[String]): Unit = {
    val nM = args.headOption.map(_.toInt).getOrElse(50)
    val botShare = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val mode = args.drop(2).headOption.getOrElse("spread")
    val n = nM * 1000000L
    val spark = Session.get("attribution-probe")
    spark.sparkContext.setLogLevel("WARN")
    val spanDays = 90L
    val users = 1000000L
    // spread mode: botShare is a PERCENT of traffic, bot spans 90 days.
    // burst mode: botShare is a PER-MILLE of traffic, bot spans 12
    // HOURS starting day 30.2 (inside bucket 30 at lookback 1, bucket
    // 4 at lookback 7 — never straddles either bucket boundary).
    val isBot =
      if (mode == "burst")
        pmod(xxhash64(col("id"), lit("u")), lit(1000)) < botShare
      else pmod(xxhash64(col("id"), lit("u")), lit(100)) < botShare
    val organicTs = lit(1704067200000000L) + // 2024-01-01 UTC
      expr(s"cast((cast(id as decimal(38,0)) * " +
        s"${spanDays * 86400000000L}) div ${n}L as bigint)")
    val burstStart = 1704067200000000L + (30L * 86400L + 4L * 3600L) * 1000000L
    val botTs =
      if (mode == "burst")
        lit(burstStart) + pmod(xxhash64(col("id"), lit("t")),
          lit(12L * 3600L * 1000000L))
      else organicTs
    val ev = spark.range(n)
      .select(col("id").as("event_id"),
        when(isBot, 0L)
          .otherwise(pmod(xxhash64(col("id"), lit("v")), lit(users)) + 1)
          .as("user_id"),
        timestamp_micros(when(isBot, botTs).otherwise(organicTs)).as("ts"),
        when(pmod(col("id"), lit(50)) === 0, "purchase")
          .when(pmod(col("id"), lit(2)) === 0, "click")
          .otherwise("view").as("event_type"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val total = ev.count()
    val botEvents = ev.where(col("user_id") === 0L).count()

    val salts = if (mode == "burst") Seq(1, 32) else Seq(1)
    for (lookback <- Seq(1, 7)) {
      var baseline: Option[Seq[String]] = None
      for (salt <- salts) {
        val t0 = System.nanoTime()
        val out = graft.ops.Attribution.touchAttribution(
            ev, "user_id", "ts", "event_id", "event_type",
            "purchase", Seq("click", "view"), lookbackDays = lookback,
            saltFactor = salt)
          .orderBy("touch_type").collect()
        val sec = (System.nanoTime() - t0) / 1e9
        // identical-output assertion: the salted rung must be a pure
        // compute-spreading rewrite, never a semantic one
        val rowsStr = out.map(_.toString).toSeq
        baseline match {
          case None => baseline = Some(rowsStr)
          case Some(b) => assert(b == rowsStr,
            s"SALTED OUTPUT DIVERGED at lookback=$lookback salt=$salt:\n" +
              s"  plain : $b\n  salted: $rowsStr")
        }
        val touches = out.map(r => r.getLong(3)).sum
        val convs = out.map(r => r.getLong(1)).sum
        println(f"""{"workload":"attribution","mode":"$mode","events":$total,"bot_events":$botEvents,"lookback_days":$lookback,"salt_factor":$salt,"attributed_touches":$touches,"last_touch_convs":$convs,"output_identical":${baseline.exists(_ == rowsStr)},"seconds":$sec%.1f}""")
      }
    }
    spark.stop()
  }
}
