package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-token-budget bins — the
  * step that turns a curated corpus into training sequences ("pack docs
  * into 4096-token rows").
  *
  * Deterministic CONTIGUOUS-FILL packing: within a shard, documents are
  * taken in id order and a document starts a new bin whenever the
  * running token total would cross the budget... approximately — the
  * simple exact-SQL-portable rule used here is bin = floor(exclusive
  * running total / budget): a document straddling a budget boundary is
  * assigned to the bin its first token falls in (training pipelines
  * then split or pad at the boundary; over-long documents spill across
  * several bins by construction). This rule is a pure prefix-sum — no
  * driver loop, no per-bin state — and any SQL engine reproduces it
  * bit-identically, unlike true first-fit bin packing (inherently
  * sequential) which at corpus scale nobody runs globally anyway.
  *
  * Sharding bounds the window: the prefix sum partitions by shard
  * (pmod(id, shards)), so parallelism is `shards` and no global sort
  * exists. At 100 TB you pick shards ≈ a few × cores-in-cluster; each
  * shard's window sorts only its own ids (range-partitioned sort,
  * spill-safe).
  */
object Packing {

  /** (id, shard, n_tokens, bin, bin_start) per document with ≥1 token.
    * `bin_start` is the document's offset in its shard's token stream —
    * `bin` = floor(bin_start / budget).
    */
  def packSequences(df: DataFrame, idCol: String, tokenCount: Column,
      budget: Int, shards: Int): DataFrame = {
    require(budget > 0 && shards > 0, "budget and shards must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol), pmod(col(idCol), lit(shards)).as("shard"),
        tokenCount.as("n_tokens"))
      .where(col("n_tokens") > 0)
      .withColumn("bin_start",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      // integral DIV, not floor(double /): bit-exact for ALL long
      // offsets (double division is only quotient-exact below 2^53)
      // and identical to the oracle's integer // by construction
      .withColumn("bin", expr(s"bin_start DIV $budget"))
  }
}
