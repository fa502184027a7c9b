package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}
import org.apache.spark.sql.types.StructType

/** Format-dispatching reader: parquet / orc / csv / json by extension or
  * explicit format, with the options a data pipeline wants by default
  * (csv headers + type inference or supplied schema, multiline-off
  * ndjson). The reference is parquet-only; these are the extended
  * engine's additional sources — all Spark builtins, all of which
  * support predicate/projection pushdown (parquet) or at least
  * projection pruning at the parser level (csv/json columns are only
  * materialized if selected).
  */
object MultiFormat {

  def read(spark: SparkSession, path: String,
      format: Option[String] = None,
      schema: Option[StructType] = None): DataFrame = {
    val fmt = format.getOrElse {
      val lower = path.toLowerCase.stripSuffix("/")
      if (lower.endsWith(".csv")) "csv"
      else if (lower.endsWith(".json") || lower.endsWith(".ndjson")) "json"
      else if (lower.endsWith(".orc")) "orc"
      else "parquet"
    }
    val base: DataFrameReader = spark.read
    val withSchema = schema.fold(base)(base.schema)
    fmt match {
      case "csv" =>
        val r = withSchema.option("header", "true")
        (if (schema.isEmpty) r.option("inferSchema", "true") else r).csv(path)
      case "json" => withSchema.json(path)
      case "orc" => withSchema.orc(path)
      case "parquet" => withSchema.parquet(path)
      case other => withSchema.format(other).load(path)
    }
  }

  /** Symmetric writer (mode overwrite), for sinks in any of the three
    * formats. Partition columns optional.
    */
  def write(df: DataFrame, path: String, format: String = "parquet",
      partitionBy: Seq[String] = Nil): Unit = {
    val w0 = df.write.mode("overwrite")
    val w = if (partitionBy.nonEmpty) w0.partitionBy(partitionBy: _*) else w0
    format match {
      case "csv" => w.option("header", "true").csv(path)
      case "json" => w.json(path)
      case _ => w.format(format).save(path)
    }
  }
}
