package graft.tools

import org.apache.spark.sql.functions._

import graft.{Session, sources}

/** End-to-end timing of the fuzzy-join pipeline at a given SF dir,
  * min-of-N with cache clears (the bench protocol). The stage-level
  * numbers that sized q and the positional filter are recorded in
  * SCALE_NOTES ("Fuzzy entity-resolution join").
  */
object FuzzyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = Session.get("fuzzy-probe")
    val entity = concat_ws(" ", col("p_name"), col("p_brand"),
      col("p_type"), col("p_size").cast("string"))
    val parts = sources.Tables.part(spark, sfDir)
      .select(col("p_partkey").as("id"), entity.as("entity"))
    val times = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      graft.text.FuzzyJoin.fuzzyJoinTop1(
        parts.where(col("id") % 2 === 0), parts.where(col("id") % 2 === 1),
        "id", "entity", threshold = 0.8)
        .write.format("noop").mode("overwrite").save()
      spark.sharedState.cacheManager.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[probe] fuzzy_join_top1 min=${times.min}%.2f s " +
      times.map(t => f"$t%.2f").mkString("[", " ", "]"))
    spark.stop()
  }
}
