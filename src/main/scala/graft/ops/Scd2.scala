package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 maintenance — the changelog-to-
  * history operator every warehouse dimension (and every versioned
  * training-corpus attribute: a document's license, a user's consent
  * state, a source's quality tier) needs. Two halves:
  *
  *  - `historyFromChangeLog`: collapse an append-only changelog of
  *    (key, ts, attrs) upserts into validity intervals — one row per
  *    RUN of unchanged tracked attributes, carrying valid_from /
  *    valid_to / is_current.
  *  - `applyChanges`: roll an existing history forward with a new
  *    changelog slice (the nightly MERGE): closed rows pass through
  *    untouched, each key's current row is re-opened as a synthetic
  *    changelog row and re-collapsed together with the incoming slice,
  *    so an incoming run that continues the current attributes EXTENDS
  *    the open interval instead of opening a spurious new version.
  *    apply(history(A), B) ≡ history(A ∪ B) for any time-split A/B —
  *    the equivalence the declared query hash-proves.
  *
  * Contract: the changelog is append-only per key — every incoming ts
  * in `applyChanges` is strictly later than the key's open-interval
  * valid_from (late/backfilled rows need a rebuild, as in every SCD2
  * store). Attribute equality is judged on an engine-portable md5 row
  * digest (SnapshotDiff.rowDigest), so NULL attributes compare
  * correctly and the compare never re-reads wide payloads.
  *
  * Shape at scale: everything is keyed by the dimension key — the
  * run-collapse is two window passes over ONE hash-partitioning (the
  * second pass runs on the collapsed, version-sized frame), no
  * self-joins, no global sort. A 10⁹-key dimension shuffles once.
  */
object Scd2 {

  private val VF = "valid_from"
  private val VT = "valid_to"
  private val CUR = "is_current"

  /** Collapse a changelog into SCD2 history. `tieCol` breaks equal-ts
    * ordering deterministically (an event id / offset; must be
    * non-negative — applyChanges reserves Long.MinValue for the
    * re-opened current rows it prepends).
    */
  def historyFromChangeLog(changes: DataFrame, keyCols: Seq[String],
      tsCol: String, tieCol: String, attrCols: Seq[String]): DataFrame = {
    val keyed = changes.select(
      keyCols.map(col) ++ Seq(
        col(tsCol).as("__ts"), col(tieCol).cast("long").as("__tie")) ++
        attrCols.map(col) :+
        SnapshotDiff.rowDigest(attrCols.map(col)).as("__h"): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__tie"))
    // A run starts where the digest differs from the previous row's
    // (null-safe: the key's first row always starts a run).
    val starts = keyed
      .withColumn("__new", !((lag(col("__h"), 1) over w) <=> col("__h")))
      .where(col("__new"))
    // valid_to = the next run's start; computed on the collapsed frame
    // (version-sized, not changelog-sized) under the same partitioning.
    // Ordered by (__ts, __tie), not __ts alone: two runs of one key CAN
    // start at the same instant (equal-ts attribute flips, and
    // applyChanges' re-opened row at ts = valid_from meeting a
    // same-instant incoming row) — without the tiebreaker the lead()
    // assignment of valid_to / is_current would be nondeterministic.
    val w2 = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__tie"))
    starts
      .withColumn(VT, lead(col("__ts"), 1) over w2)
      .select(keyCols.map(col) ++ attrCols.map(col) ++ Seq(
        col("__ts").as(VF), col(VT),
        col(VT).isNull.as(CUR)): _*)
  }

  /** Roll `history` forward with a strictly-later changelog slice.
    * Closed rows pass through; current rows are re-expressed as
    * changelog rows (ts = valid_from, tie = Long.MinValue so they sort
    * before any same-instant incoming row) and re-collapsed together
    * with the slice. Output schema identical to historyFromChangeLog.
    *
    * The strictly-later contract is ENFORCED, not just documented
    * (`enforceAppendOnly`, on by default): a backfilled row — incoming
    * ts ≤ its key's open valid_from — would silently rewrite the open
    * interval while leaving the already-closed rows it actually
    * belongs under untouched, i.e. a wrong history with no error. The
    * guard counts such rows with ONE key-hash join of the slice
    * against the |keys|-sized open frame (the Sessionize null-user
    * pattern: a bounded eager check that fails LOUDLY) and aborts
    * with a sample of offending keys; late data needs a rebuild via
    * historyFromChangeLog.
    */
  def applyChanges(history: DataFrame, changes: DataFrame,
      keyCols: Seq[String], tsCol: String, tieCol: String,
      attrCols: Seq[String], enforceAppendOnly: Boolean = true): DataFrame = {
    if (enforceAppendOnly) {
      val open = history.where(col(CUR))
        .select(keyCols.map(col) :+ col(VF).as("__open_vf"): _*)
      val late = changes
        .select(keyCols.map(col) :+ col(tsCol).cast("long").as("__ts"): _*)
        .join(open, keyCols)
        .where(col("__ts") <= col("__open_vf"))
      val sample = late.select(keyCols.map(col): _*).limit(3).collect()
      require(sample.isEmpty,
        s"Scd2.applyChanges: changelog rows at or before their key's " +
          s"open valid_from (e.g. keys ${sample.mkString(", ")}) — " +
          "late/backfilled data silently corrupts an incremental " +
          "merge; rebuild with historyFromChangeLog instead")
    }
    val closed = history.where(!col(CUR))
    val reopened = history.where(col(CUR)).select(
      keyCols.map(col) ++ Seq(
        col(VF).as(tsCol), lit(Long.MinValue).as(tieCol)) ++
        attrCols.map(col): _*)
    val slice = changes.select(
      keyCols.map(col) ++ Seq(
        col(tsCol), col(tieCol).cast("long").as(tieCol)) ++
        attrCols.map(col): _*)
    val recollapsed = historyFromChangeLog(
      reopened.unionByName(slice), keyCols, tsCol, tieCol, attrCols)
    closed.select(recollapsed.columns.map(col): _*)
      .unionByName(recollapsed)
  }

  /** Point-in-time enrichment — the SERVE path of the history (the
    * feature-store "as-of the event" join): each fact row picks up the
    * attribute version that was valid AT ITS OWN timestamp,
    * `valid_from ≤ fact.ts < valid_to` (open interval: valid_to NULL).
    * Left join: facts predating their key's first version (or with no
    * history at all) keep NULL attributes instead of dropping — the
    * training-data contract, where a missing historical feature must
    * surface as null, never as a silently dropped example.
    *
    * Shape at scale: ONE key-equi sort-merge join with the interval
    * predicate as a residual filter — versions of a key are disjoint,
    * so each fact matches at most one history row (no fan-out), and
    * nothing shuffles except on the dimension key both sides already
    * aggregate by. No window over facts, no per-fact history scan.
    */
  def pointInTimeJoin(facts: DataFrame, history: DataFrame,
      keyCols: Seq[String], tsCol: String,
      attrCols: Seq[String]): DataFrame = {
    val f = facts.as("f")
    val h = history
      .select(keyCols.map(col) ++ attrCols.map(col) :+
        col(VF) :+ col(VT): _*)
      .as("h")
    val keyEq = keyCols.map(k => col(s"f.$k") === col(s"h.$k"))
      .reduce(_ && _)
    val inInterval = col(s"f.$tsCol") >= col(s"h.$VF") &&
      (col(s"h.$VT").isNull || col(s"f.$tsCol") < col(s"h.$VT"))
    f.join(h, keyEq && inInterval, "left")
      .select(facts.columns.map(c => col(s"f.$c")) ++
        attrCols.map(c => col(s"h.$c")) :+ col(s"h.$VF"): _*)
  }
}
