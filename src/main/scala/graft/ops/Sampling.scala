package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling — the reproducibility
  * primitive for corpus curation: the same keys are selected on every
  * run, on every engine, at any parallelism (unlike `df.sample`, whose
  * selection depends on partitioning and a seeded RNG stream).
  *
  * Mechanism: md5(key) is uniform over hex strings, so a LEXICOGRAPHIC
  * threshold on the hex digest selects a uniform fraction — and both
  * Spark and any SQL engine with md5() reproduce it bit-identically
  * (the same trick as the exact-dedup keeper set). The threshold for
  * rate r is the first 8 hex digits of r·16⁸.
  *
  * Scale: a map-side filter — no shuffle, no state, pushdown-friendly.
  * Consistent across tables: sampling users and their events by the
  * same key keeps referential integrity (the classic "sample the
  * entity, not the row" rule).
  */
object Sampling {

  /** Hex-threshold for a sampling rate in (0, 1]. */
  def hexThreshold(rate: Double): String = {
    require(rate > 0 && rate <= 1, s"rate must be in (0,1], got $rate")
    val v = math.min((rate * 4294967296.0).toLong, 4294967295L)
    f"$v%08x"
  }

  /** Keep rows whose md5(key) sorts below the rate threshold. */
  def sampleByKey(df: DataFrame, key: Column, rate: Double): DataFrame =
    df.where(md5(key.cast("string")) < lit(hexThreshold(rate)))

  /** Deterministic train/val/test assignment — the split primitive for
    * dataset curation: each key lands in exactly one named split, with
    * the hex-threshold trick partitioning md5's uniform hex space into
    * consecutive fraction-sized ranges. Same guarantees as
    * `sampleByKey`: reproducible on any engine, at any parallelism,
    * and stable under re-runs and appends (a document's split never
    * changes when other documents arrive — the property that keeps
    * eval sets uncontaminated as a corpus grows).
    *
    * Scale: a map-side CASE over md5(key) — no shuffle, no state.
    * The last split is the catch-all (`otherwise`), so fractions must
    * sum to 1 and the final range absorbs the threshold-rounding tail.
    */
  def assignSplit(df: DataFrame, key: Column,
      splits: Seq[(String, Double)], outCol: String = "split"): DataFrame = {
    require(splits.size >= 2, "need at least two splits")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val digest = md5(key.cast("string"))
    // thresholds for all but the last split; the last is `otherwise`
    val expr = splits.init.zip(cum.init).reverse
      .foldLeft(lit(splits.last._1)) { case (acc, ((name, _), c)) =>
        when(digest < lit(hexThreshold(c)), lit(name)).otherwise(acc)
      }
    df.withColumn(outCol, expr)
  }

  /** Weighted source mixing — the corpus-composition primitive: each
    * source (crawl, books, code, …) is down-sampled at its own rate in
    * ONE map-side pass, deterministically (same md5-threshold trick as
    * sampleByKey, so any engine reproduces the exact selection).
    * Sources absent from `rates` are dropped — a mixing spec is a
    * whitelist. Still a scan-stage filter: no shuffle, no state,
    * pushdown-friendly, and the per-source rate arrives as a literal
    * CASE expression (no join against a rates table needed below
    * thousands of sources).
    */
  def mixSources(df: DataFrame, key: Column, sourceCol: Column,
      rates: Map[String, Double]): DataFrame = {
    require(rates.nonEmpty, "mixing spec must name at least one source")
    // rate >= 1.0 keeps the source COMPLETELY — the threshold compare
    // tops out at 'ffffffff' and would silently drop the ~2^-32 of
    // keys whose digest starts with eight f's
    val keep = rates.foldLeft(lit(false)) { case (acc, (src, rate)) =>
      val cond =
        if (rate >= 1.0) lit(true)
        else md5(key.cast("string")) < lit(hexThreshold(rate))
      when(sourceCol === src, cond).otherwise(acc)
    }
    df.where(keep)
  }
}
