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

  /** Murphy decomposition of the Brier score — the calibration
    * readout that splits a probabilistic classifier's error into WHAT
    * KIND of bad it is:
    *
    *   brier ≈ reliability − resolution + uncertainty
    *
    * reliability = Σ n_k(p̄_k − ȳ_k)²/N  (miscalibration — fixable by
    * recalibrating), resolution = Σ n_k(ȳ_k − ȳ)²/N (discrimination —
    * only a better model buys more), uncertainty = ȳ(1−ȳ) (the data's
    * floor). Bins k are fixed-width over the ppm score
    * (`score div binWidth`).
    *
    * Determinism: scores are integer ppm; brier is EXACT
    * (Σ(p−10⁶y)² div N through DECIMAL(38)); the three decomposition
    * terms use ppm-QUANTIZED bin means (each mean one integral
    * division, then integer squares — the Changepoint ×10³ rule), so
    * every output replays on any engine. The identity holds up to
    * that ppm quantization; it is reported, never asserted.
    *
    * One (bin)-keyed aggregate over the scored frame + a 1-row
    * reduce; all ×10¹² term SUMS ride DECIMAL(38) (the ppm²-family
    * rule — a LONG carrier would wrap past N≈9.2e6 scored rows);
    * outputs land back in BIGINT via the integral `div`.
    *
    * Input: (scoreCol ppm LONG 0..10⁶, labelCol BOOLEAN). Output one
    * row: (n, base_rate_ppm, brier_x1e12, reliability_x1e12,
    * resolution_x1e12, uncertainty_x1e12).
    */
  def brierDecomposition(df: DataFrame, scoreCol: String,
      labelCol: String, binWidth: Long = 100000L): DataFrame = {
    require(binWidth >= 1)
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val scored = df
      .select(expr(s"$scoreCol div $binWidth").as("__bin"),
        col(scoreCol).as("__p"),
        col(labelCol).cast("long").as("__y"))
    val tot = scored
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("__spos"))
      .withColumn("base_rate_ppm", expr("__spos * 1000000 div n"))
    val bins = scored
      .groupBy(col("__bin"))
      .agg(count(lit(1)).as("__nk"),
        sum(col("__p")).as("__sp"),
        sum(col("__y")).as("__sy"),
        sum((col("__p") - col("__y") * 1000000L).cast(dec) *
          (col("__p") - col("__y") * 1000000L)).as("__se"))
      .withColumn("__pbar", expr("__sp div __nk"))
      .withColumn("__ybar", expr("__sy * 1000000 div __nk"))
    bins.crossJoin(broadcast(tot))
      .groupBy(col("n"), col("base_rate_ppm"))
      .agg(sum(col("__se")).as("__se"),
        // nk·(Δppm)² is ~1e12 per bin-weighted row — a LONG sum wraps
        // silently past N≈9.2e6 scored rows, so lift to DECIMAL(38)
        // like every other ppm²-family sum in the repo (same values,
        // wider carrier; `div` still lands the output in BIGINT)
        sum(col("__nk").cast(dec) * (col("__pbar") - col("__ybar")) *
          (col("__pbar") - col("__ybar"))).as("__rel"),
        sum(col("__nk").cast(dec) *
          (col("__ybar") - col("base_rate_ppm")) *
          (col("__ybar") - col("base_rate_ppm"))).as("__res"))
      .select(col("n"), col("base_rate_ppm"),
        expr("cast(__se div n as bigint)").as("brier_x1e12"),
        expr("__rel div n").as("reliability_x1e12"),
        expr("__res div n").as("resolution_x1e12"),
        expr("base_rate_ppm * (1000000 - base_rate_ppm)")
          .as("uncertainty_x1e12"))
  }
}
