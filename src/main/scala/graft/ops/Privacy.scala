package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Per QID combination: cohort size, distinct sensitive values, and
    * whether the cohort is l-diverse — the audit k-anonymity alone
    * misses (a size-50 cohort whose sensitive attribute is constant
    * still reveals it for every member; distinct l-diversity requires
    * ≥ l distinct sensitive values per cohort). One hash aggregate
    * with a distinct-agg — partial combine on (QIDs, sensitive) pairs.
    */
  def lDiversityAudit(df: DataFrame, qidCols: Seq[String],
      sensitive: Column, l: Long): DataFrame = {
    require(qidCols.nonEmpty && l >= 2L, "need QID columns and l >= 2")
    df.groupBy(qidCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(sensitive).as("n_sensitive"))
      .select(qidCols.map(col) :+ col("n") :+ col("n_sensitive") :+
        (col("n_sensitive") >= l).cast("int").as("is_diverse"): _*)
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
