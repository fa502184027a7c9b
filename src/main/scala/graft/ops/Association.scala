package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Association statistics over (basket, item) data — support,
  * confidence, and lift for item pairs, the classic market-basket /
  * co-click signal a curation pipeline uses to find correlated
  * sources, templates, or near-boilerplate item combinations.
  *
  * Scale shape (the a-priori property does the work): item counts are
  * ONE hash aggregate; items below `minItemCount` are dropped BEFORE
  * the pair self-join — an infrequent item can never belong to a
  * frequent pair, so the quadratic stage only ever sees the frequent
  * vocabulary. The pair join itself is keyed on the basket id (the
  * `coOccurrenceEdges` shape, same basket-size cap guard: per-basket
  * cost is |basket|², which the cap keeps bounded), and the pair
  * aggregate is partial→final on (a, b). The basket total crosses as
  * a broadcast one-row frame.
  *
  * Determinism: counts are exact BIGINTs; lift and confidence are one
  * fixed IEEE double tree each over those counts —
  * lift = (n_ab·n)/(n_a·n_b), confidence = n_ab/n_a — identical
  * cross-engine.
  */
object Association {

  /** Unordered frequent-pair lift table: (item_a < item_b, n_ab, n_a,
    * n_b, lift, confidence) with confidence for the a→b direction.
    * `minItemCount` prunes items before the pair join (a-priori);
    * `minPairCount` prunes the output.
    */
  def pairLift(df: DataFrame, groupCol: String, itemCol: String,
      minItemCount: Long = 2L, minPairCount: Long = 2L,
      maxGroupSize: Long = 10000L): DataFrame = {
    // checkpointed: the distinct basket frame feeds the guard job, the
    // item counts, BOTH pair-join sides, and the basket total — five
    // consumers; without the cut each would replay the distinct
    // (the coOccurrenceEdges rule)
    val g = df.select(col(groupCol).as("g"), col(itemCol).as("i")).distinct()
      .localCheckpoint(true)
    val worst = g.groupBy(col("g")).agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("mx")).head()
    if (!worst.isNullAt(0)) {
      val mx = worst.getLong(0)
      require(mx <= maxGroupSize,
        s"pairLift: largest $groupCol basket has $mx distinct items " +
          s"(cap $maxGroupSize) — the pair join would emit ~${mx * mx} " +
          "pairs for that basket alone; cap or sample upstream")
    }
    val frequent = g.groupBy(col("i")).agg(count(lit(1)).as("c"))
      .where(col("c") >= minItemCount)
    val fg = g.join(frequent, Seq("i"))
    val pairs = fg.select(col("g"), col("i").as("a"), col("c").as("n_a"))
      .join(fg.select(col("g"), col("i").as("b"), col("c").as("n_b")),
        Seq("g"))
      .where(col("a") < col("b"))
      .groupBy(col("a"), col("b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minPairCount)
    val n = g.agg(countDistinct(col("g")).as("__n"))
    pairs.crossJoin(broadcast(n))
      .select(col("a").as("item_a"), col("b").as("item_b"),
        col("n_ab"), col("n_a"), col("n_b"),
        ((col("n_ab").cast("double") * col("__n")) /
          (col("n_a").cast("double") * col("n_b"))).as("lift"),
        (col("n_ab").cast("double") / col("n_a")).as("confidence"))
  }
}
