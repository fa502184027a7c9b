package graft.tools

import org.apache.spark.sql.functions._

import graft.Session
import graft.ops.Sampling

/** Scale probe for token-budget sampling: N synthetic docs across 20
  * sources, budget sized to keep ~30% of each source. Compares the
  * shipped two-level bucket/prefix-sum shape against the naive
  * `SUM OVER (PARTITION BY source ORDER BY digest)` formulation —
  * the latter runs ONE task per source regardless of cluster size
  * (here: 20 tasks for 32 cores; at 100 TB, 20 tasks for 10k cores).
  *
  * Usage: runMain graft.tools.TokenBudgetProbe [numDocsThousands]
  */
object TokenBudgetProbe {
  def main(args: Array[String]): Unit = {
    val nK = args.headOption.map(_.toInt).getOrElse(1000)
    val n = nK * 1000L
    val spark = Session.get("token-budget-probe")
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.range(n)
      .select(col("id"),
        concat(lit("src"), pmod(col("id"), lit(20))).as("source"),
        (pmod(xxhash64(col("id"), lit(7)), lit(200)) + 20).as("n_tok"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count()
    // ~30% of each source's ≈ n/20 · 119.5 expected tokens
    val budget = (n / 20) * 120 * 3 / 10

    val t0 = System.nanoTime()
    val kept = Sampling.tokenBudgetSample(docs, col("id"), col("source"),
      col("n_tok"), budget).count()
    val twoLevel = (System.nanoTime() - t0) / 1e9

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(md5(col("id").cast("string")), col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val t1 = System.nanoTime()
    val keptNaive = docs
      .withColumn("cb", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .where(col("cb") < budget).count()
    val naive = (System.nanoTime() - t1) / 1e9

    println(f"""{"workload":"token_budget","docs":$n,"budget":$budget,"kept":$kept,"kept_naive":$keptNaive,"two_level_sec":$twoLevel%.2f,"naive_window_sec":$naive%.2f}""")
    require(kept == keptNaive, "formulations must agree")
    spark.stop()
  }
}
