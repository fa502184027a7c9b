package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: a Spark implementation plus (when SQL-expressible)
  * a DuckDB oracle over the same parquet tables. Column names MUST match
  * between the two — the driver sorts columns by name and hashes values.
  *
  * Determinism rules used throughout the registry:
  *  - Aggregates over non-integral doubles go through exact DECIMAL
  *    arithmetic, then one final cast to DOUBLE (same mathematical value
  *    on both engines → identical IEEE double → identical hash).
  *  - Integral-valued doubles (l_quantity) sum exactly below 2^53 — safe.
  *  - Every LIMIT carries a total ORDER BY (unique tiebreaker).
  *  - Counts / sums of integers are CAST AS BIGINT in the oracle (DuckDB
  *    widens integer SUM to HUGEINT otherwise).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false,
    // Vacuous-output guard (round-12 verdict #7, mechanizing the
    // binDiv=1e5 one-bin catch): (column, floor) — the result must
    // contain at least `floor` DISTINCT values of `column`, or Verify
    // fails loudly. A pooling/fitting query that degenerates to one
    // group passes a hash gate trivially (the oracle degenerates the
    // same way); this floor is the engine-side check that the query
    // still exercises the semantics it exists to show.
    minDistinct: Option[(String, Long)] = None)

object Registry {
  /** All query modules, assembled by SparkEntry. Central vacuous-output
    * floors ([[Floors]]) fill in minDistinct for every query that does
    * not declare its own inline.
    */
  def all: Seq[QueryDef] =
    (RelationalQueries.all ++ AdvancedQueries.all ++ FunctionQueries.all ++
      PipelineQueries.all ++ TextQueries.all ++ SimilarityQueries.all ++
      MultimodalQueries.all ++ GraphQueries.all)
      .map(q => q.copy(minDistinct =
        q.minDistinct.orElse(Floors.byName.get(q.name))))
}
