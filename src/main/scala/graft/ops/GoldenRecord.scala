package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity consolidation — the "golden record" step after matching
  * (fuzzy join / near-dup clustering / sessionization): all records of
  * one entity collapse to a single canonical row, each attribute
  * resolved to its MODE (most frequent non-null value, ties to the
  * smallest value — a deterministic total rule), plus the canonical id
  * (smallest member id) and the member count.
  *
  * Scale shape: one (key) aggregate for the base row plus one
  * (key, value) → (key) aggregate pair PER ATTRIBUTE — the mode needs
  * per-value counts, and doing it as |attrs| keyed aggregates keeps
  * every shuffle row narrow (key + one value + count) instead of
  * carrying the whole record. All joins are on the entity key the
  * frames are already partitioned by; attribute frames are
  * entity-sized. The argmax is the integer min-struct trick
  * ((−count, value) ascending), no windows.
  */
object GoldenRecord {

  /** One canonical row per key: (keys..., canonical_id, n_records,
    * mode_<attr>...). Attributes with only NULL values in a group
    * yield NULL (left join).
    */
  def consolidate(df: DataFrame, keyCols: Seq[String], idCol: String,
      attrCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty,
      "need key and attribute columns")
    val base = df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("canonical_id"),
        count(lit(1)).as("n_records"))
    attrCols.foldLeft(base) { (acc, a) =>
      val mode = df.where(col(a).isNotNull)
        .groupBy(keyCols.map(col) :+ col(a): _*)
        .agg(count(lit(1)).as("__c"))
        .groupBy(keyCols.map(col): _*)
        .agg(min(struct((-col("__c")).as("nc"), col(a).as("v"))).as("__m"))
        .select(keyCols.map(col) :+ col("__m.v").as(s"mode_$a"): _*)
      acc.join(mode, keyCols, "left")
    }
  }
}
