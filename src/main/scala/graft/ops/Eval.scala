package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-evaluation statistics over scored rows — the readouts a
  * classifier-driven curation pipeline (quality gates, contamination
  * filters, centroid discriminators) is judged by.
  */
object Eval {

  /** EXACT distributed ROC AUC via the Mann-Whitney rank-sum with
    * midranks — no sampling, no trapezoid approximation, no
    * single-partition sort:
    *
    *   AUC = (R⁺ − nPos(nPos+1)/2) / (nPos·nNeg)
    *
    * where R⁺ is the midrank sum of the positives under an ascending
    * score order. Ranks come from [[Ranking.globalRankLean]] with a
    * unique tiebreaker, so a tie group occupies CONSECUTIVE ranks and
    * its midrank is (min+max)/2 — the whole sum stays integral as
    * 2·R⁺ = Σ_groups pos·(min+max). Every term is an exact integer
    * (DECIMAL(38,0) against overflow); AUC is ONE int/int division —
    * cross-engine deterministic. NULL when either class is empty.
    *
    * Shape at scale: one lean rank (literal range bounds, no
    * materialization, recompute-safe), one groupBy(score) over the
    * ranked rows, one final fold of the |distinct scores|-sized group
    * frame. Nothing global-sorts and nothing is quadratic in rows.
    *
    * `labelCol` must be 0/1 (castable to long); `tieCol` any unique
    * column completing the total order.
    */
  def aucExact(df: DataFrame, scoreCol: String, labelCol: String,
      tieCol: String): DataFrame = {
    // pinned: five passes consume this frame (the lean rank's
    // count/sample/bucket jobs + the group and final folds) — without
    // the pin each would recompute the caller's scoring pipeline (the
    // skew audit measured that mistake at 2x; see SCALE_NOTES). The
    // pinned form is three narrow columns, the cheapest thing here.
    val base = df.select(col(scoreCol).as("__s"),
      col(labelCol).cast("long").as("__y"), col(tieCol).as("__t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ranked = Ranking.globalRankLean(base,
      Seq(col("__s"), col("__t")), "__r")
    val groups = ranked.groupBy(col("__s")).agg(
      min(col("__r")).as("__lo"), max(col("__r")).as("__hi"),
      sum(col("__y")).as("__pos"), count(lit(1)).as("__n"))
    val np: Column = col("n_pos").cast("decimal(38,0)")
    val nn: Column = col("n_neg").cast("decimal(38,0)")
    groups.agg(
        sum(col("__pos")).as("n_pos"),
        sum(col("__n") - col("__pos")).as("n_neg"),
        sum(col("__pos").cast("decimal(19,0)") *
          (col("__lo") + col("__hi")).cast("decimal(19,0)")).as("__rs2"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          (col("__rs2").cast("decimal(38,0)") - np * (np + 1))
            .cast("double") /
            (lit(2).cast("decimal(38,0)") * np * nn).cast("double"))
          .as("auc"))
  }
}
