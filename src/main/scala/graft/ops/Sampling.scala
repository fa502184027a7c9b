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
