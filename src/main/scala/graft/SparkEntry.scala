package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{QueryDef, Registry}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All queries live in graft.queries.* as QueryDefs (Spark impl + DuckDB
  * oracle SQL); this object is just the assembly point.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Registry.all.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops →
    * driver records a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    Registry.all.collect {
      case q if q.oracle.isDefined => q.name -> q.oracle.get
    }.toMap

  /** Vacuous-output floors (QueryDef.minDistinct), enforced by Verify. */
  def minDistinct: Map[String, (String, Long)] =
    Registry.all.collect {
      case q if q.minDistinct.isDefined => q.name -> q.minDistinct.get
    }.toMap

  /** Subset used by Bench. */
  def headlineQueries: Seq[QueryDef] = Registry.all.filter(_.headline)
}
