package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Session
import graft.text.FuzzyJoin

/** Stage-cardinality probe for the SYNTHETIC fuzzy-join scale bench:
  * reproduces FuzzyBench's catalog generation at a parameterized size
  * and counts every intermediate (gram rows, distinct grams, tf
  * distribution head, prefix rows, candidate occurrences, distinct
  * pairs) so candidate blowups are attributable to a stage instead of
  * guessed at from a full-pipeline OOM/spill failure.
  *
  * Usage: runMain graft.tools.FuzzyScaleProbe [entitiesThousandsPerSide] [q]
  */
object FuzzyScaleProbe {
  def main(args: Array[String]): Unit = {
    val nK = args.headOption.map(_.toInt).getOrElse(100)
    val n = nK * 1000L
    val q = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val threshold = 0.8
    val spark = Session.get("fuzzy-scale-probe")
    def pin(df: DataFrame) = df.localCheckpoint(true)
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val vocab = typedLit((0 until 20000).map { i =>
      java.lang.Long.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(s"v$i").toLong
          * 2654435761L | (1L << 62)).take(12)
    })
    def entity(base: org.apache.spark.sql.Column, mutate: org.apache.spark.sql.Column) =
      concat_ws(" ", transform(sequence(lit(0), lit(11)),
        i => when(mutate && i === 0, lit("mutatedtoken"))
          .otherwise(element_at(vocab,
            pmod(xxhash64(base, i), lit(20000)).cast("int") + 1))))

    val left = pin(spark.range(n).select(col("id"),
      entity(col("id"), lit(false)).as("entity")))
    val right = pin(spark.range(n).select(col("id"),
      when(pmod(col("id"), lit(10)) === 1, entity(col("id"), lit(true)))
        .otherwise(entity(col("id") + n, lit(false))).as("entity")))
    println(s"[probe] left=${left.count()} right=${right.count()}")

    val exL = timed("gram L (pin)")(pin(FuzzyJoin.charGramFrame(left, "id", "entity", q)))
    val exR = timed("gram R (pin)")(pin(FuzzyJoin.charGramFrame(right, "id", "entity", q)))
    println(s"[probe] gramRowsL=${exL.count()} gramRowsR=${exR.count()}")

    val tf = pin(exL.union(exR).groupBy(col("s")).agg(count(lit(1)).as("tf")))
    println(s"[probe] distinctGrams=${tf.count()}")
    tf.orderBy(col("tf").desc).limit(10).collect()
      .foreach(r => println(s"[probe]   hot gram tf=${r.getLong(1)}"))

    def prefix(ex: DataFrame) = {
      val cnt = count(lit(1)).over(Window.partitionBy(col("id")))
      val rn = row_number().over(
        Window.partitionBy(col("id")).orderBy(col("tf"), col("s")))
      ex.join(tf, Seq("s"))
        .select(col("id"), col("s"), cnt.as("n"), rn.as("rn"))
        .where(col("rn") <= col("n") - ceil(lit(threshold) * col("n")) + 1)
    }
    val preL = timed("prefix L (pin)")(pin(prefix(exL)))
    val preR = timed("prefix R (pin)")(pin(prefix(exR)))
    println(s"[probe] prefixRowsL=${preL.count()} prefixRowsR=${preR.count()}")

    // postings-length distribution of the PREFIX index (what the
    // candidate join actually multiplies)
    val postL = preL.groupBy(col("s")).agg(count(lit(1)).as("pl"))
    val postR = preR.groupBy(col("s")).agg(count(lit(1)).as("pr"))
    val prod = postL.join(postR, Seq("s"))
      .agg(sum(col("pl") * col("pr")).as("candOccUpper"),
        max(col("pl")).as("maxPostL"), max(col("pr")).as("maxPostR"))
      .collect()(0)
    println(s"[probe] candidate occurrences (pre-filter)=${prod.getLong(0)} " +
      s"maxPostingL=${prod.getLong(1)} maxPostingR=${prod.getLong(2)}")

    val reqOverlap = lit(threshold / (1.0 + threshold)) *
      (col("n_l") + col("n_r")) - 0.5
    val candidates = preL
      .withColumnsRenamed(Map("id" -> "left_id", "n" -> "n_l", "rn" -> "rn_l"))
      .join(preR.withColumnsRenamed(
        Map("id" -> "right_id", "n" -> "n_r", "rn" -> "rn_r")), Seq("s"))
      .where(col("n_r") >= lit(threshold) * col("n_l") - 0.5 &&
        col("n_l") >= lit(threshold) * col("n_r") - 0.5 &&
        lit(1) + least(col("n_l") - col("rn_l"), col("n_r") - col("rn_r"))
          >= reqOverlap)
      .select(col("left_id"), col("right_id"))
    val cand = timed("candidates (pin)")(pin(candidates))
    println(s"[probe] candOccAfterFilters=${cand.count()} " +
      s"distinctPairs=${cand.distinct().count()}")
    spark.stop()
  }
}
