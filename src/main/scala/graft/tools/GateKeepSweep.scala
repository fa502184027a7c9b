package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel.DISK_ONLY

import graft.Session

/** The quality-gate decision table's BOUNDARY (r14 verdict #5): both
  * regimes of the materialization law are measured (1% keep → narrow
  * pin + broadcast join-back wins; 99% keep → unpinned wins), but the
  * crossover keep-rate — where the surviving-id set outgrows
  * `spark.sql.autoBroadcastJoinThreshold` and the join-back flips from
  * a map-side corpus scan to a corpus shuffle — was never located. A
  * user gating at an intermediate keep rate had no measured guidance.
  *
  * This sweep runs keep ∈ {1, 10, 30, 60, 99}% through two arms on
  * GatePinProbe's exact corpus/scorer (2M wide docs, 150-round xxhash64
  * chain — the stable, codegen'd scorer the probe family standardized
  * on after GatePinDiag proved HOF lambdas unmeasurable):
  *
  *  A unpinned      — filterAtQuantile with the raw value expr
  *                    (scorer evaluates twice, corpus never pinned);
  *  C narrow auto   — pin (doc_id, lang, q), threshold + filter on the
  *                    narrow frame, then join the surviving ids back
  *                    WITHOUT a broadcast hint: the PLANNER (AQE with
  *                    runtime sizes) picks the join-back topology, and
  *                    the executed plan is scraped for which it chose.
  *
  * The output locates two boundaries at once: the PLANNER flip (which
  * keep rate first plans a shuffle join-back — a pure function of
  * |kept| × id-row bytes vs the 10 MB default threshold) and the ARM
  * flip (which keep rate first makes unpinned the faster strategy).
  * Recorded in SCALE_NOTES "Quality-gate decision table".
  *
  * Usage: runMain graft.tools.GateKeepSweep [docsMillions] [hashRounds]
  *          [keepPctList]   (default "1,10,30,60,99")
  */
object GateKeepSweep {
  def main(args: Array[String]): Unit = {
    val nM = args.headOption.map(_.toDouble).getOrElse(2.0)
    val n = (nM * 1000000L).toLong
    val rounds = args.lift(1).map(_.toInt).getOrElse(150)
    require(rounds <= 300, "rounds > 300 risks analyzer stack overflow")
    val spark = Session.builder("gate-keep-sweep")
      .config("spark.cleaner.periodicGC.interval", "2min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val parts = math.max(256, (n / 10000L).toInt)
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def pin(df: DataFrame): DataFrame = { val p = df.persist(DISK_ONLY); p.count(); p }

    // GatePinProbe's generator + scorer, verbatim shape
    val vocab = typedLit((0 until 5000).map(i => s"w$i"))
    val (docs, genSec) = timed {
      pin(spark.range(0L, n, 1L, parts)
        .select(col("id").as("doc_id"),
          concat(lit("l"), pmod(col("id"), lit(5))).as("lang"),
          concat_ws(" ", transform(sequence(lit(0), lit(99)),
            i => element_at(vocab,
              pmod(xxhash64(col("id"), i), lit(5000)).cast("int") + 1)))
            .as("text")))
    }
    def score(text: org.apache.spark.sql.Column) =
      pmod((1 to rounds).foldLeft(lit(0L))((h, _) => xxhash64(text, h)),
        lit(10000L))

    // calibration: one corpus move, median-of-3 (box-state unit)
    def median3(f: => Unit): Double = {
      val ds = (1 to 3).map { _ => val (_, d) = timed(f); d }.sorted
      ds(1)
    }
    val moveSec = median3 {
      val c = docs.select(col("doc_id"), col("lang"), col("text"))
        .persist(DISK_ONLY)
      c.count(); c.unpersist(true)
    }
    println(s"""{"workload":"gate_keep_sweep_header","docs":$n,"chain_rounds":$rounds,"gen_sec":${f1(genSec)},"corpus_move_sec":${f1(moveSec)},"auto_broadcast_threshold":"${spark.conf.get("spark.sql.autoBroadcastJoinThreshold")}"}""")

    args.lift(2).map(_.split(',').toSeq.map(_.toInt))
      .getOrElse(Seq(1, 10, 30, 60, 99)).foreach { keepPct =>
      val p = 1.0 - keepPct / 100.0

      // arm A: unpinned double-eval
      val (aKept, aSec) = timed {
        graft.ops.GroupQuantile.filterAtQuantile(
          docs.withColumn("__q", score(col("text"))),
          Seq(col("lang")), col("__q"), p).count()
      }

      // arm C: narrow pin, PLANNER-chosen join-back. The timed block
      // covers the WHOLE arm — scorer pass (inside the pin), quantile
      // threshold, and join-back — because the law compares total
      // strategy costs, not join topologies in isolation.
      val ((cKept, plan, narrow), cSec) = timed {
        val narrow = pin(docs.select(col("doc_id"), col("lang"),
          score(col("text")).as("q")))
        val keptIds = graft.ops.GroupQuantile.filterAtQuantile(
          narrow, Seq(col("lang")), col("q"), p).select(col("doc_id"))
        val counted = docs.join(keptIds, Seq("doc_id"), "left_semi")
          .groupBy().count()
        // drive execution through THIS Dataset's own QueryExecution so
        // the final adaptive plan (isFinalPlan=true) is inspectable —
        // count()/write would build a fresh QE and discard the decision
        val qe = counted.queryExecution
        val k = qe.executedPlan.executeCollect().head.getLong(0)
        (k, qe.executedPlan.toString, narrow)
      }
      // classify the TOP join-back only: the plan string ALWAYS
      // contains an inner BroadcastHashJoin (filterAtQuantile's tiny
      // per-group threshold table) — the first sweep cut matched it
      // and mislabeled an 8M-doc SortMergeJoin join-back as broadcast.
      // The join-back is the LeftSemi node; read the strategy off the
      // line that carries it.
      def strategy(p: String) =
        p.linesIterator.find(_.contains("LeftSemi")) match {
          case Some(l) if l.contains("BroadcastHashJoin") => "broadcast"
          case Some(l) if l.contains("SortMergeJoin") ||
            l.contains("ShuffledHashJoin") => "shuffle"
          case _ => "unknown"
        }
      val joinback = strategy(plan)
      if (sys.env.contains("SPARK_GRAFT_SWEEP_PLAN"))
        System.err.println(s"---- keep=$keepPct% final plan ----\n" +
          plan.linesIterator.take(80).mkString("\n"))
      narrow.unpersist(true)

      // arm D: same narrow pin, but the surviving ids are MATERIALIZED
      // through a shuffle (repartition) before the join-back — the
      // static estimate above is the compressed-cache size with NO
      // filter selectivity applied (keep-blind); a shuffle boundary
      // lets AQE read the ids' TRUE runtime size and re-pick the
      // topology per keep rate, which is what a deployment that cannot
      // hand-hint broadcast() should do.
      val ((dKept, dPlan, narrowD), dSec) = timed {
        val nd = pin(docs.select(col("doc_id"), col("lang"),
          score(col("text")).as("q")))
        val keptIds = graft.ops.GroupQuantile.filterAtQuantile(
          nd, Seq(col("lang")), col("q"), p).select(col("doc_id"))
          .repartition(32)
        val counted = docs.join(keptIds, Seq("doc_id"), "left_semi")
          .groupBy().count()
        val qe = counted.queryExecution
        val k = qe.executedPlan.executeCollect().head.getLong(0)
        (k, qe.executedPlan.toString, nd)
      }
      narrowD.unpersist(true)

      require(aKept == cKept && cKept == dKept,
        s"arms disagree at keep=$keepPct%: A=$aKept C=$cKept D=$dKept " +
          "— identity broken, measurement void")
      println(s"""{"workload":"gate_keep_sweep","keep_pct":$keepPct,"kept":$aKept,"id_bytes_nominal":${aKept * 8L},"unpinned_sec":${f1(aSec)},"narrow_auto_sec":${f1(cSec)},"joinback":"$joinback","narrow_aqe_sec":${f1(dSec)},"joinback_aqe":"${strategy(dPlan)}"}""")
    }
    spark.stop()
  }

  private def f1(v: Double) =
    String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
}
