package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-OVERLAP self-join: pair rows whose [start, end] ranges
  * intersect — "which sessions were open at the same time", "which
  * validity windows collide". The third member of the join family next
  * to [[AsOfJoin]] (point → latest interval) and [[RangeJoin]] (point ±
  * tolerance → point): here BOTH sides are intervals.
  *
  * A raw `a.s <= b.e AND b.s <= a.e` predicate has no equi-key, so
  * Spark plans a broadcast-nested-loop (all-pairs — dead at any scale).
  * The scale shape is the GRID: quantize time into `cellWidth`-sized
  * cells, explode every interval onto the cells it covers, equi-join on
  * the cell, then apply the exact overlap predicate. Each true pair is
  * emitted exactly ONCE without a distinct: a pair overlapping in
  * several shared cells is attributed to the single cell containing
  * `greatest(a.start, b.start)` — both intervals cover that instant
  * (overlap means max(start) <= min(end)), and it lies in exactly one
  * cell.
  *
  * 100 TB: one shuffle per side on the cell id; per-cell work is
  * (cell density)², never global all-pairs — size `cellWidth` near the
  * typical interval length so most intervals explode to 1-2 cells and
  * cells stay thin. A long-tail interval pays (len/cellWidth) cell
  * rows carrying only (ids, start, end) — payloads join back later by
  * id. Dense cells (everyone online at the same hour) are inherent to
  * the question; AQE skew-split handles the residual imbalance because
  * the join is a plain equi-join.
  *
  * Bounds must be non-negative longs in one unit (epoch seconds, epoch
  * days): `div` truncates toward zero, so negative bounds would
  * misalign cells between engines (DuckDB `//` floors).
  */
object IntervalJoin {

  /** All unordered pairs {a, b}, a ≠ b, with
    * [a.start, a.end] ∩ [b.start, b.end] ≠ ∅, identity and ordering
    * given by the `idCols` tuple (lexicographic; must be unique per
    * row). Output: idCols prefixed `a_`/`b_`, plus `overlap` =
    * least(ends) − greatest(starts) (≥ 0; 0 = point contact).
    */
  def selfOverlap(df: DataFrame, idCols: Seq[String], startCol: String,
      endCol: String, cellWidth: Long): DataFrame = {
    require(idCols.nonEmpty && cellWidth > 0)
    val base = df.select(
      struct(idCols.map(col): _*).as("__id"),
      col(startCol).cast("long").as("__s"),
      col(endCol).cast("long").as("__e"))
    def cells(side: DataFrame, tag: String): DataFrame = side.select(
      col("__id").as(s"__id_$tag"),
      col("__s").as(s"__s_$tag"), col("__e").as(s"__e_$tag"),
      explode(sequence(expr(s"__s div ${cellWidth}L"),
        expr(s"__e div ${cellWidth}L"))).as("__cell"))
    val a = cells(base, "a").withColumnRenamed("__cell", "__cell_a")
    val b = cells(base, "b").withColumnRenamed("__cell", "__cell_b")
    val pairs = a.join(b, col("__cell_a") === col("__cell_b"))
      .where(col("__id_a") < col("__id_b") &&
        col("__s_a") <= col("__e_b") && col("__s_b") <= col("__e_a") &&
        col("__cell_a") ===
          expr(s"greatest(__s_a, __s_b) div ${cellWidth}L"))
    val named = idCols.flatMap { c =>
      Seq(col("__id_a").getField(c).as(s"a_$c"),
        col("__id_b").getField(c).as(s"b_$c"))
    }
    pairs.select(named :+
      (least(col("__e_a"), col("__e_b")) -
        greatest(col("__s_a"), col("__s_b"))).as("overlap"): _*)
  }
}
