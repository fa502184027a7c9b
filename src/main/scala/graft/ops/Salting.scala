package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation for EXTREME key skew — the cases AQE's
  * skew-join splitting doesn't cover (single-stage aggregations where
  * one group key holds a disproportionate share of rows, e.g. the
  * empty-location "" bucket in taxi data or a null-ish user id).
  *
  * Two-stage salted aggregation: add a deterministic salt derived from
  * the full row hash, pre-aggregate on (keys, salt) — spreading the hot
  * key over `saltBuckets` reducers — then final-aggregate on the keys.
  * For algebraic aggregates (count/sum/min/max) the two-stage result is
  * exactly the direct result; the helper takes the partial→final
  * expression pairs explicitly so that stays true by construction.
  *
  * Note Spark's hash aggregate already does map-side partial
  * aggregation, which handles MOST skew; salting matters when the
  * post-shuffle reduce of a single key is itself the bottleneck (very
  * high distinct-input cardinality per hot key, e.g. collect-like or
  * distinct aggregations).
  */
object Salting {

  /** Per-ROW salt, not a row-content hash: fully identical duplicate
    * rows (the classic extreme-skew shape — repeated empty/null
    * records) would all hash to one bucket, defeating the spread
    * exactly when it matters. monotonically_increasing_id is a
    * partition-local counter → pmod round-robins rows across buckets
    * uniformly whatever their content. Nondeterministic assignment is
    * fine: the salt only routes rows; algebraic partial→final
    * aggregation is invariant to the routing.
    */
  private def rowSalt(saltBuckets: Int): Column =
    pmod(monotonically_increasing_id(), lit(saltBuckets.toLong))

  /** Salted count: groupBy(keys).count() with the hot-key reduce spread
    * over saltBuckets partitions.
    */
  def saltedCount(df: DataFrame, keys: Seq[String], saltBuckets: Int): DataFrame = {
    val salted = df.withColumn("__salt", rowSalt(saltBuckets))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as("count"))
  }

  /** General salted aggregation: `partials` computes per-(keys, salt)
    * partial aggregates; `finals` folds partials per keys.
    * Example — sum + max:
    * {{{
    * saltedAgg(df, Seq("k"), 32,
    *   Seq(sum($"v").as("s"), max($"v").as("m")),
    *   Seq(sum($"s").as("s"), max($"m").as("m")))
    * }}}
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int,
      partials: Seq[Column], finals: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", rowSalt(saltBuckets))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(finals.head, finals.tail: _*)
  }

  /** Salted equijoin for extreme key skew on the FACT side: fact rows
    * are round-robined over `saltBuckets` sub-keys and the other side
    * is replicated once per bucket (explode over the salt range), so a
    * hot join key's rows land on `saltBuckets` reducers instead of
    * one. Join semantics are EXACT: each fact row matches precisely
    * the replica carrying its salt, so (key, salt) equijoin ≡ key
    * equijoin row-for-row. `joinType` is limited to inner/left: a
    * right/full outer would surface the replicas themselves.
    *
    * When to reach for it: AQE's skew-join splitting already rescues
    * sort-merge joins it can measure; manual salting is the portable
    * form — it survives join-strategy changes (shuffled-hash joins,
    * which AQE's splitter does not cover in every release), pre-planned
    * bucketed layouts, and skew that only materializes after upstream
    * transforms. The price is `saltBuckets`× replication of the other
    * side's SHUFFLE (not storage); size the bucket count to the hot
    * key's excess, not to parallelism.
    */
  def saltedJoin(fact: DataFrame, other: DataFrame, key: String,
      saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left" ||
      joinType == "left_outer", "saltedJoin supports inner/left only")
    val salted = fact.withColumn("__salt", rowSalt(saltBuckets))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
