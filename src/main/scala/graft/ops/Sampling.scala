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
}
