package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel.DISK_ONLY

import graft.Session

/** The MISSING CELL of the quality-gate materialization decision table
  * (r13 verdict #3). The r12 three-way A/B (CurationProbe scaladoc)
  * measured the regex-grade-scorer × high-keep-rate cell and REFUTED
  * pinning there; the law it left behind — "materialize only when
  * value-eval ≫ one corpus move AND the keep rate is low enough that
  * the join-back narrows" — had NO measured point in its own
  * prescriptive regime, the exact unverified-prescription shape that
  * produced the refuted r11 pinned-frame theory. This probe measures
  * that cell: an artificially expensive scorer (R full-text hash
  * passes, R chosen so one scoring pass ≫ one corpus move) at a LOW
  * keep rate (p = 0.99 → ~1% kept).
  *
  * Arms (same three as r12, same cell for all):
  *  A unpinned      — filterAtQuantile with the expensive value expr:
  *                    the scorer evaluates TWICE (threshold agg +
  *                    filter join-back).
  *  B fat pin       — persist the scored CORPUS (DISK_ONLY), gate on
  *                    the pinned column: one scorer pass + a
  *                    full-corpus pin round-trip + two pin reads.
  *  C narrow pin    — pin only (doc_id, lang, q); threshold + filter
  *                    run on the narrow frame; the ~1% surviving ids
  *                    BROADCAST back onto the corpus (left-semi), so
  *                    the corpus never shuffles — the low-keep-rate
  *                    advantage the law predicts.
  *
  * The probe also measures its own units: one corpus move (DISK_ONLY
  * pin round-trip) and one scorer pass, so the reported law carries
  * its calibration ("scorer = k× move") instead of assuming r12's.
  *
  * Usage: runMain graft.tools.GatePinProbe [docsMillions] [hashRounds]
  */
object GatePinProbe {
  def main(args: Array[String]): Unit = {
    val nM = args.headOption.map(_.toDouble).getOrElse(2.0)
    val n = (nM * 1000000L).toLong
    val rounds = args.lift(1).map(_.toInt).getOrElse(150)
    // expression DEPTH past ~1000 overflows the analyzer stack; scale
    // scorer cost via per-round input fatness instead (text repeated
    // `fatness` times, CSE'd once per row by whole-stage codegen)
    val fatness = args.lift(2).map(_.toInt).getOrElse(1)
    require(rounds <= 300, "rounds > 300 risks analyzer stack overflow")
    val spark = Session.builder("gate-pin-probe")
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

    // CurationProbe's wordy generator (100-word docs, 5 langs)
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

    // Expensive scorer: a SEQUENTIAL chain of `rounds` full-text hash
    // passes (each round re-hashes the text salted by the previous
    // round's digest — unprunable, unreorderable), bucketed to 10k
    // grains so the threshold distribution agg stays metadata-sized in
    // every arm (the GroupQuantile continuous-score caveat, held
    // constant across arms). The chain is a plain codegen'd expression
    // tree ON PURPOSE: the first cut used a higher-order `aggregate`
    // lambda and its cost was UNSTABLE BY EVALUATION CONTEXT (the same
    // 1M-doc pass measured 0.3 s or 9-10 s depending on where in the
    // session the plan ran — GatePinDiag, reproducible), which poisons
    // any cross-arm comparison. Codegen-able scorers are not just
    // faster, they are MEASURABLE.
    def score(text: org.apache.spark.sql.Column) = {
      val in = if (fatness == 1) text else repeat(text, fatness)
      pmod((1 to rounds).foldLeft(lit(0L))((h, _) => xxhash64(in, h)),
        lit(10000L))
    }

    // ---- calibration: one corpus move, one scorer pass ----
    // median of 3 reps each: disk/page-cache state drifts within a
    // session (GatePinDiag measured the move 0.24 -> 1.23 s between
    // passes), and the law below is a RATIO of these two units
    def median3(f: => Unit): Double = {
      val ds = (1 to 3).map { _ => val (_, d) = timed(f); d }.sorted
      ds(1)
    }
    val moveSec = median3 {
      // one corpus move = read the corpus once + serialize it once
      // through the block manager (the r12 A/B's unit)
      val c = docs.select(col("doc_id"), col("lang"), col("text"))
        .persist(DISK_ONLY)
      c.count(); c.unpersist(true)
    }
    val scoreSec = median3 {
      docs.select(score(col("text")).as("q"))
        .agg(sum(col("q"))).head()
    }

    val P = 0.99 // keep ~1%

    // ---- arm A: unpinned double-eval ----
    // the library idiom (CurationProbe's winning arm): a LAZY
    // withColumn, gated on the column — the score still evaluates
    // twice (threshold agg + filter join-back) because nothing pins
    // it. (Passing the raw HOF expression as `value` trips a Catalyst
    // binder INTERNAL_ERROR in the join-back — lambda-bearing exprs
    // don't survive the broadcast-join rewrite; the withColumn form
    // is both the documented usage and the workaround.)
    val (aKept, aSec) = timed {
      graft.ops.GroupQuantile.filterAtQuantile(
        docs.withColumn("__q", score(col("text"))),
        Seq(col("lang")), col("__q"), P).count()
    }

    // ---- arm B: fat pin ----
    val (bKept, bSec) = timed {
      val scored = pin(docs.withColumn("q", score(col("text"))))
      val k = graft.ops.GroupQuantile.filterAtQuantile(
        scored, Seq(col("lang")), col("q"), P).count()
      scored.unpersist(true)
      k
    }

    // ---- arm C: narrow pin + broadcast join-back ----
    val (cKept, cSec) = timed {
      val narrow = pin(docs.select(col("doc_id"), col("lang"),
        score(col("text")).as("q")))
      val keptIds = graft.ops.GroupQuantile.filterAtQuantile(
        narrow, Seq(col("lang")), col("q"), P).select(col("doc_id"))
      // ~1% of ids at P=0.99 — broadcastable by construction; the
      // corpus side stays a scan, never a shuffle
      val k = docs.join(broadcast(keptIds), Seq("doc_id"), "left_semi")
        .count()
      narrow.unpersist(true)
      k
    }

    require(aKept == bKept && bKept == cKept,
      s"arms disagree: A=$aKept B=$bKept C=$cKept — identity broken, " +
        "measurement void")
    def f(v: Double) = String.format(java.util.Locale.ROOT, "%.1f",
      Double.box(v))
    println(s"""{"workload":"gate_pin_missing_cell","docs":$n,"chain_rounds":$rounds,"fatness":$fatness,"keep_p":$P,"kept":$aKept,"gen_sec":${f(genSec)},"corpus_move_sec":${f(moveSec)},"scorer_pass_sec":${f(scoreSec)},"scorer_over_move":${f(scoreSec / moveSec)},"arm_unpinned_sec":${f(aSec)},"arm_fat_pin_sec":${f(bSec)},"arm_narrow_pin_sec":${f(cSec)}}""")
    spark.stop()
  }
}
