package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.DataFrame
import graft.{Session, sources}

object FuzzyStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Session.get("fuzzy-stage-probe")
    def pin(df: DataFrame) = df.localCheckpoint(true)
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val q = 5; val threshold = 0.8
    val entity = concat_ws(" ", col("p_name"), col("p_brand"),
      col("p_type"), col("p_size").cast("string"))
    val parts = sources.Tables.part(spark, sfDir)
      .select(col("p_partkey").as("id"), entity.as("entity"))
    val left = parts.where(col("id") % 2 === 0)
    val right = parts.where(col("id") % 2 === 1)
    // warm
    left.write.format("noop").mode("overwrite").save()
    import graft.text.FuzzyJoin
    val exL = timed("gram L (pin)")(pin(FuzzyJoin.charGramFrame(left, "id", "entity", q)))
    val exR = timed("gram R (pin)")(pin(FuzzyJoin.charGramFrame(right, "id", "entity", q)))
    val tf = exL.union(exR).groupBy(col("s")).agg(count(lit(1)).as("tf"))
    def prefix(ex: DataFrame) = {
      val n = count(lit(1)).over(Window.partitionBy(col("id")))
      val rn = row_number().over(
        Window.partitionBy(col("id")).orderBy(col("tf"), col("s")))
      ex.join(tf, Seq("s"))
        .select(col("id"), col("s"), n.as("n"), rn.as("rn"))
        .where(col("rn") <= col("n") - ceil(lit(threshold) * col("n")) + 1)
    }
    val preL = timed("prefix L (pin)")(pin(prefix(exL)))
    val preR = timed("prefix R (pin)")(pin(prefix(exR)))
    println(s"[probe] preL=${preL.count()} preR=${preR.count()}")
    val candidates = preL.withColumnsRenamed(Map("id" -> "left_id", "n" -> "n_l", "rn" -> "rn_l"))
      .join(preR.withColumnsRenamed(Map("id" -> "right_id", "n" -> "n_r", "rn" -> "rn_r")), Seq("s"))
      .where(col("n_r") >= lit(threshold) * col("n_l") - 0.5 &&
        col("n_l") >= lit(threshold) * col("n_r") - 0.5)
      .select(col("left_id"), col("right_id"))
    val cand = timed("candidates (pin)")(pin(candidates))
    println(s"[probe] candidates=${cand.count()}")
    def sets(ex: DataFrame, idName: String, shName: String) =
      pin(ex.groupBy(col("id").as(idName)).agg(collect_set(col("s")).as(shName)))
    val setsL = timed("sets L (pin)")(sets(exL, "left_id", "sh_l"))
    val setsR = timed("sets R (pin)")(sets(exR, "right_id", "sh_r"))
    val verified = cand
      .join(setsL, Seq("left_id")).join(setsR, Seq("right_id"))
      .withColumn("common", size(array_intersect(col("sh_l"), col("sh_r"))))
      .withColumn("jaccard", col("common") /
        (size(col("sh_l")) + size(col("sh_r")) - col("common")))
      .where(col("jaccard") >= threshold)
    val ver = timed("verify+top1")(
      verified.withColumn("rn", row_number().over(Window.partitionBy(col("left_id"))
        .orderBy(col("jaccard").desc, col("right_id"))))
      .where(col("rn") === 1)
      .select(col("left_id"), col("right_id"), col("jaccard")))
    println(s"[probe] top1=${ver.count()}")
    spark.stop()
  }
}
