package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** RFM (recency / frequency / monetary) segmentation — the classic
  * behavioral-segmentation primitive: every user scored 1..buckets on
  * each axis by equi-depth rank, then labeled with the composite
  * segment code.
  *
  * Determinism: frequency and recency are exact integers; monetary
  * accumulates in DECIMAL(12,2) (one final double cast for output);
  * each axis is ranked under a TOTAL order (metric, user_id) and
  * scored with the windowless floor formula (Ranking.equiDepthScore) —
  * fully engine-replayable.
  *
  * Shape at scale: one user-keyed aggregate collapses the event corpus
  * to |users| rows; each axis then pays one Ranking.globalRank pass
  * (range partition + bounded offset frame — NO single-partition
  * window over users); the user count joins back as a broadcast
  * 1-row frame. A 10⁹-user base ranks distributed on every axis.
  */
object Segmentation {

  def rfmSegments(events: DataFrame, userCol: String, tsCol: String,
      valCol: String, buckets: Int = 5): DataFrame = {
    require(buckets >= 2, "need at least 2 buckets")
    val m = events.groupBy(col(userCol)).agg(
      count(lit(1)).as("freq"),
      max(unix_micros(col(tsCol))).as("last_us"),
      sum(col(valCol).cast(DecimalType(12, 2))).as("__mon"))
    val n = m.agg(count(lit(1)).as("__nu"))
    val ranked = Seq(
      ("last_us", "r_rn"), ("freq", "f_rn"), ("__mon", "m_rn"))
      .foldLeft(m) { case (acc, (metric, out)) =>
        Ranking.globalRank(acc, Seq(col(metric), col(userCol)), out)
      }
    def score(rn: String) =
      Ranking.equiDepthScore(col(rn), col("__nu"), buckets)
    ranked.crossJoin(broadcast(n))
      .select(col(userCol), col("freq"),
        col("__mon").cast("double").as("monetary"),
        score("r_rn").as("r_score"),
        score("f_rn").as("f_score"),
        score("m_rn").as("m_score"))
      .withColumn("segment", concat(
        col("r_score").cast("string"), lit("-"),
        col("f_score").cast("string"), lit("-"),
        col("m_score").cast("string")))
  }
}
