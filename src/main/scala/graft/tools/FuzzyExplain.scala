package graft.tools
import org.apache.spark.sql.functions._
import graft.{Session, sources}
object FuzzyExplain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Session.get("fuzzy-explain")
    val entity = concat_ws(" ", col("p_name"), col("p_brand"),
      col("p_type"), col("p_size").cast("string"))
    val parts = sources.Tables.part(spark, sfDir)
      .select(col("p_partkey").as("id"), entity.as("entity"))
    val df = graft.text.FuzzyJoin.fuzzyJoinTop1(
      parts.where(col("id") % 2 === 0), parts.where(col("id") % 2 === 1),
      "id", "entity", threshold = 0.8)
    df.write.format("noop").mode("overwrite").save()
    // AQE-final plan after execution
    println(df.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Window") || l.contains("Checkpoint") || l.contains("Scan"))
      .map(_.trim.take(160)).mkString("\n"))
    spark.stop()
  }
}
