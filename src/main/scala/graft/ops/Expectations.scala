package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the pre-ingest audit a
  * training pipeline runs before a corpus slice is allowed in (null
  * keys, out-of-range values, enum drift, duplicate keys, dangling
  * foreign keys). One row per check: (check_name, violations, total,
  * passed).
  *
  * Shape at scale — the whole audit is ONE pass over the fact table:
  *  - row-level checks (not-null / in-range / in-set) fuse into a
  *    single partial→final aggregate of sum(when(violated, 1));
  *  - foreign-key checks become membership flags via LEFT joins
  *    against the (distinct, usually broadcast) dimension key sets,
  *    feeding the SAME aggregate — no per-check anti-join jobs;
  *  - uniqueness rides the same scan as count(distinct key)
  *    (violations = total − distinct).
  * A 100-TB fact table pays one read + one aggregate regardless of
  * how many checks are declared; only the distinct-count adds a
  * key-hashed exchange.
  */
object Expectations {

  /** Referential-integrity audit: for each declared FK edge, the
    * child-row count, orphan count (child rows whose FK value has no
    * parent — NULL FKs are NOT orphans, they're the NotNull check's
    * job), and orphan ppm. The star-schema health check a pipeline
    * runs before trusting any join: an orphan rate that moves is an
    * upstream-extract bug surfacing.
    *
    * Scale shape: one LEFT ANTI join per edge against the DISTINCT
    * parent key — never wider than the key column. The broadcast
    * decision is left to AQE: the distinct already forces a shuffle,
    * and AQE re-plans the anti join from the ACTUAL post-distinct
    * size, so a dimension edge (customer, part, supplier) converts to
    * broadcast at runtime while a fact-sized parent (the orders edge
    * under lineitem, billions of distinct keys at 100 TB) stays a
    * shuffled anti join. A hard broadcast() hint here would force the
    * full distinct o_orderkey set onto the driver at any SF — the
    * one-size-fits-all hint is exactly wrong for a mixed edge list.
    * Counts are BIGINTs; ppm is one integral division (children ≤
    * ~9.2e12 for the LONG bound, the ppm-family rule).
    */
  def fkOrphans(edges: Seq[(String, DataFrame, String, DataFrame, String)])
      : DataFrame = {
    require(edges.nonEmpty)
    edges.map { case (edge, child, fk, parent, pk) =>
      val keys = parent.select(col(pk).as("__pk")).distinct()
      val nonNull = child.where(col(fk).isNotNull)
      val orphans = nonNull
        .join(keys, col(fk) === col("__pk"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      val totals = nonNull.agg(count(lit(1)).as("n_children"))
      totals.crossJoin(orphans)
        .select(lit(edge).as("edge"), col("n_children"), col("n_orphans"),
          when(col("n_children") > 0,
            expr("n_orphans * 1000000 div n_children")).as("orphan_ppm"))
    }.reduce(_ unionByName _)
  }

  /** Functional-dependency audit: for each candidate determinant →
    * dependent pair, how many determinant groups map to MORE than one
    * dependent value — the schema-contract check ("order key
    * determines customer", "part key determines brand") that catches
    * silent denormalization drift and bad joins before they poison a
    * training table.
    *
    * Scale shape: ONE two-level aggregate per pair — groupBy(A)
    * count(distinct B) is realized as groupBy(A,B)→groupBy(A), both
    * with map-side partials, so the shuffle carries distinct (A,B)
    * combos, never rows. Violation rate is one integral ppm division.
    * Output per pair: (fd, n_groups, n_violating, violation_ppm).
    */
  def fdAudit(df: DataFrame,
      pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty)
    pairs.map { case (a, b) =>
      df.groupBy(col(a).as("__a"), col(b).as("__b"))
        .agg(count(lit(1)).as("__n"))
        .groupBy(col("__a"))
        .agg(count(lit(1)).as("__nvals"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("__nvals") > 1, 1L).otherwise(0L))
            .as("n_violating"))
        .select(lit(s"$a->$b").as("fd"), col("n_groups"),
          col("n_violating"),
          expr("(1000000 * n_violating) div n_groups")
            .as("violation_ppm"))
    }.reduce(_ unionByName _)
  }

  sealed trait Check { def name: String }

  /** `column` must be non-NULL. */
  final case class NotNull(column: String) extends Check {
    val name = s"not_null($column)"
  }

  /** Non-NULL values of `column` must lie in [lo, hi] (NULLs are
    * NotNull's business, not a range violation).
    */
  final case class InRange(column: String, lo: Column, hi: Column)
      extends Check {
    val name = s"in_range($column)"
  }

  /** Non-NULL values of `column` must be one of `values`. */
  final case class InSet(column: String, values: Seq[Any]) extends Check {
    val name = s"in_set($column)"
  }

  /** `column` must be unique across the table (COUNT-DISTINCT
    * semantics: NULLs are not counted as a key).
    */
  final case class Unique(column: String) extends Check {
    val name = s"unique($column)"
  }

  /** Every non-NULL `column` value must exist in `dimColumn` of the
    * dimension frame (referential integrity). `dimName` labels the
    * check.
    */
  final case class ForeignKey(column: String, dim: DataFrame,
      dimColumn: String, dimName: String) extends Check {
    val name = s"fk($column->$dimName.$dimColumn)"
  }

  /** Run every check in one fused pass. Output: (check_name,
    * violations BIGINT, total BIGINT, passed INT) — integer columns
    * only, so any engine replays the audit exactly.
    */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "audit needs at least one check")
    // FK membership flags first: each LEFT join tags rows whose key
    // was found; the joins feed the single aggregate below.
    val fks = checks.collect { case f: ForeignKey => f }
    val flagged = fks.zipWithIndex.foldLeft(df) { case (acc, (f, i)) =>
      val keys = f.dim.select(col(f.dimColumn).as(f.column)).distinct()
        .withColumn(s"__fk_$i", lit(1))
      acc.join(keys, Seq(f.column), "left")
    }
    val violated: Check => Column = {
      case NotNull(c) => col(c).isNull
      case InRange(c, lo, hi) =>
        col(c).isNotNull && (col(c) < lo || col(c) > hi)
      case InSet(c, vs) => col(c).isNotNull && !col(c).isin(vs: _*)
      case f: ForeignKey =>
        col(f.column).isNotNull &&
          col(s"__fk_${fks.indexOf(f)}").isNull
      case u: Unique =>
        throw new IllegalStateException(s"unreachable: ${u.name}")
    }
    val aggs =
      count(lit(1)).as("__total") +:
        checks.zipWithIndex.map {
          case (u: Unique, i) =>
            (count(lit(1)) - countDistinct(col(u.column))).as(s"__v_$i")
          case (c, i) =>
            sum(when(violated(c), 1L).otherwise(0L)).as(s"__v_$i")
        }
    val one = flagged.agg(aggs.head, aggs.tail: _*)
    // unpivot the 1-row aggregate into one row per check
    val stacked = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check_name"),
        coalesce(col(s"__v_$i").cast("long"), lit(0L)).as("violations"))
    }
    one.select(explode(array(stacked: _*)).as("c"), col("__total"))
      .select(col("c.check_name"), col("c.violations"),
        col("__total").cast("long").as("total"),
        when(col("c.violations") === 0L, 1).otherwise(0)
          .cast("int").as("passed"))
  }
}
