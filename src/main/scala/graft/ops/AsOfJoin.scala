package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the most recent right row with
  * `rightTs <= leftTs` within the same key — the standard "latest state
  * at event time" join (quotes→trades, clicks→purchases).
  *
  * Spark has no ASOF JOIN operator; the preference-order analysis
  * (SURVEY §7.3, guide tier (a)) says compose builtins before reaching
  * for a custom LogicalPlan/Strategy — and the classic union + window
  * technique expresses these semantics exactly, scalably:
  *
  *   1. union both sides into one stream tagged with side + payload
  *   2. one window, partitioned by key, ordered by (ts, rightFirst):
  *      `last(right_payload, ignoreNulls)` over unbounded-preceding
  *   3. keep left rows; the carried payload IS the as-of match
  *
  * Cost: ONE shuffle on the key + one sort — the same price a custom
  * SortMergeAsOfJoinExec would pay, with AQE/skew handling for free.
  * Right rows sort before left rows at equal ts (inclusive match).
  *
  * A custom physical operator would only win by merging pre-sorted
  * bucketed inputs without re-sort; documented as future work, not
  * needed for semantics.
  */
object AsOfJoin {

  /** @param left       probe side (each row gets a match or null)
    * @param right      build side (state/events to look up)
    * @param keys       equi-join key column names (present both sides)
    * @param leftTs     left ordering column
    * @param rightTs    right ordering column
    * @param rightPayload right columns to carry (renamed as given)
    * @return left columns + rightPayload columns (null when no prior
    *         right row exists — left-outer as-of semantics)
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      rightPayload: Map[String, String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadCols = rightPayload.values.toSeq

    val taggedRight = right.select(
      (keys.map(col) :+ col(rightTs).as("__ts") :+ lit(0).as("__side")) ++
        rightPayload.map { case (src, dst) => col(src).as(dst) }: _*)
    val taggedLeft = left.select(
      (keys.map(col) :+ col(leftTs).as("__ts") :+ lit(1).as("__side")) ++
        leftCols.filterNot(keys.contains).map(col): _*)

    val unioned = taggedRight.unionByName(taggedLeft, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = payloadCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.where(col("__side") === 1)
      .select(leftCols.map(col) ++ payloadCols.map(col): _*)
  }

  /** FORWARD as-of: for each left row, the NEXT right row with
    * `rightTs >= leftTs` in the same key — time-to-next-event
    * semantics (click → next purchase, alert → next deploy). The
    * mirror of [[asOf]]: same union, the window runs current-row →
    * unbounded-following with `first(ignoreNulls)`, and LEFT rows sort
    * before right at equal ts so the match is inclusive. Same one
    * key-shuffle + one sort cost.
    *
    * Tie caveat (same as asOf): multiple right rows at one (key, ts)
    * make the pick engine-arbitrary unless the payload is itself the
    * tie-identical column (e.g. the ts) — declared queries use it so.
    */
  def asOfForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      rightPayload: Map[String, String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadCols = rightPayload.values.toSeq

    val taggedRight = right.select(
      (keys.map(col) :+ col(rightTs).as("__ts") :+ lit(1).as("__side")) ++
        rightPayload.map { case (src, dst) => col(src).as(dst) }: _*)
    val taggedLeft = left.select(
      (keys.map(col) :+ col(leftTs).as("__ts") :+ lit(0).as("__side")) ++
        leftCols.filterNot(keys.contains).map(col): _*)

    val unioned = taggedRight.unionByName(taggedLeft, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val carried = payloadCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, first(col(c), ignoreNulls = true).over(w))
    }
    carried.where(col("__side") === 0)
      .select(leftCols.map(col) ++ payloadCols.map(col): _*)
  }
}
