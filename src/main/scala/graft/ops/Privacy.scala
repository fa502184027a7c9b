package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity primitives — the release-gate check a training-data
  * pipeline runs before publishing any table carrying quasi-
  * identifiers (the PII-redaction family's structural sibling: regex
  * redaction removes direct identifiers, k-anonymity bounds re-
  * identification through identifier COMBINATIONS).
  *
  * Scale shape: the audit is one hash aggregate over the QID tuple
  * (partial→final — the shuffle carries distinct combinations, not
  * rows). Suppression joins rows back to the sub-k cohort list on the
  * same keys — the cohort frame is |small cohorts| rows (the long
  * tail), and AQE broadcasts it when it fits. NULL quasi-identifier
  * values are a cohort like any other (null-safe equality
  * throughout), because "attribute withheld" is itself identifying.
  */
object Privacy {

  /** Per QID combination: cohort size and whether it meets `k`.
    * is_safe is INT (0/1) — the cross-engine-stable projection.
    */
  def kAnonymityAudit(df: DataFrame, qidCols: Seq[String],
      k: Long): DataFrame = {
    require(qidCols.nonEmpty && k >= 1L, "need QID columns and k >= 1")
    df.groupBy(qidCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .select(qidCols.map(col) :+ col("n") :+
        (col("n") >= k).cast("int").as("is_safe"): _*)
  }

  /** Suppress (null out) the quasi-identifiers of every row whose QID
    * cohort is smaller than `k` — the generalize-to-top suppression
    * that makes the release k-anonymous while keeping row counts (and
    * every non-QID column) intact.
    */
  def suppressBelowK(df: DataFrame, qidCols: Seq[String],
      k: Long): DataFrame = {
    require(qidCols.nonEmpty && k >= 1L, "need QID columns and k >= 1")
    val unsafe = df.groupBy(qidCols.map(col): _*)
      .agg(count(lit(1)).as("__n")).where(col("__n") < k)
      .select(qidCols.map(col) :+ lit(true).as("__suppress"): _*)
    val d = df.as("d")
    val u = unsafe.as("u")
    val cond = qidCols.map(c => col(s"d.$c") <=> col(s"u.$c"))
      .reduce(_ && _)
    d.join(u, cond, "left")
      .select(df.columns.toSeq.map { c =>
        if (qidCols.contains(c))
          when(col("u.__suppress"), lit(null))
            .otherwise(col(s"d.$c")).as(c)
        else col(s"d.$c")
      }: _*)
  }
}
