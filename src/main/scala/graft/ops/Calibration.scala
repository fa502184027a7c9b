package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Isotonic (PAV) probability calibration — the "recalibrate" action
  * the Brier reliability term (Eval.brierDecomposition) tells you to
  * take: fit the best NON-DECREASING map from score bins to observed
  * positive rates (weighted L2; Barlow et al. 1972).
  *
  * Instead of the sequential pool-adjacent-violators sweep (a data-
  * dependent loop no relational engine replays), we compute the PAV
  * solution in CLOSED FORM via its minimax characterization:
  *
  *   fitted_k = max_{i ≤ k} min_{j ≥ k} pooledRate(i..j)
  *
  * where pooledRate(i..j) is the positive rate of bins i..j pooled.
  * Quantized to ppm by ONE integral floor division per (i,j) pair, the
  * whole fit is a pure integer function both engines replay exactly
  * (quantizing before the min/max can perturb a fitted value by at
  * most 1 ppm relative to the rational PAV — definitional, not
  * numerical drift).
  *
  * Scale shape: the corpus collapses to per-bin (n, pos) counts in one
  * partial-agg shuffle; every window and the i≤j pair frame then run
  * over the BIN GRID (≤ score_range/binDiv rows — e.g. 11 bins for
  * ppm scores at binDiv=1e5), a per-corpus constant. The bins² pair
  * frame and the intentionally tiny single-partition windows are
  * bounded by that grid, never by data.
  */
object Calibration {

  /** Closed-form isotonic fit over an ALREADY-aggregated
    * (bin, n_docs, n_pos) frame — the streaming-snapshot entry point
    * (bin counts are additive, so ingest-time partials fold in).
    * Output: (bin, n_docs, n_pos, raw_ppm, fitted_ppm), fitted
    * non-decreasing in bin.
    */
  def isotonicFromBins(bins: DataFrame): DataFrame = {
    val b = bins.groupBy(col("bin"))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("n_pos")).as("n_pos"))
    // single-partition windows: deliberate — the frame is the bin
    // grid, bounded by the score range, never by the corpus
    val wOrd = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val idx = b
      .withColumn("__i", row_number().over(Window.orderBy(col("bin"))))
      .withColumn("__N", sum(col("n_docs")).over(wOrd))
      .withColumn("__P", sum(col("n_pos")).over(wOrd))
    val lo = idx.select(col("__i").as("i"),
      (col("__N") - col("n_docs")).as("n0"),
      (col("__P") - col("n_pos")).as("p0"))
    val hi = idx.select(col("__i").as("j"),
      col("__N").as("n1"), col("__P").as("p1"))
    val pairs = lo.join(hi, col("i") <= col("j"))
      .withColumn("__rate",
        expr("(1000000 * (p1 - p0)) div (n1 - n0)"))
    // min over j' >= j (per i): running min from the right
    val wRight = Window.partitionBy(col("i")).orderBy(col("j").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fitted = pairs
      .withColumn("__rmin", min(col("__rate")).over(wRight))
      // rows with this j carry exactly the i <= j candidates
      .groupBy(col("j")).agg(max(col("__rmin")).as("fitted_ppm"))
    idx.join(fitted, col("__i") === col("j"))
      .select(col("bin"), col("n_docs"), col("n_pos"),
        expr("(1000000 * n_pos) div n_docs").as("raw_ppm"),
        col("fitted_ppm"))
  }

  /** Bin a scored frame and fit: score div binDiv defines the grid. */
  def isotonicCalibration(scored: DataFrame, scoreCol: String,
      labelCol: String, binDiv: Long): DataFrame = {
    require(binDiv >= 1, s"binDiv must be >= 1, got $binDiv")
    isotonicFromBins(
      scored.groupBy(expr(s"$scoreCol div $binDiv").as("bin"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col(labelCol).cast("long")).as("n_pos")))
  }
}
