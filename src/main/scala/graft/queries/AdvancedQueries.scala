package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ops.AsOfJoin
import graft.sources.Tables

/** Second-wave relational coverage: as-of join, correlated/scalar
  * subqueries (decorrelated by Catalyst), exact percentiles, bag-union,
  * approximate distinct sketches.
  */
object AdvancedQueries {

  /** As-of join: each purchase attached to the user's most recent
    * prior (or same-second) click. Epoch-second timestamps per the
    * engine-portability rule; DuckDB oracle uses its native ASOF JOIN —
    * equal-second click ties carry identical payloads, so both engines
    * agree even though tie-pick is arbitrary.
    */
  private val qAsOf = QueryDef(
    "q_asof_purchase_click",
    (s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          col("ts").cast("long").as("purchase_ts_s"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts").cast("long").as("c_ts"))
      AsOfJoin.asOf(purchases, clicks, Seq("user_id"),
          leftTs = "purchase_ts_s", rightTs = "c_ts",
          rightPayload = Map("c_ts" -> "click_ts_s"))
        .where(col("click_ts_s").isNotNull)
        .select(col("event_id"), col("user_id"), col("purchase_ts_s"),
          col("click_ts_s"),
          (col("purchase_ts_s") - col("click_ts_s")).as("gap_s"))
    },
    Some("""
      WITH p AS (
        SELECT event_id, user_id, epoch_us(ts) // 1000000 AS purchase_ts_s
        FROM events WHERE event_type = 'purchase'),
      c AS (
        SELECT user_id, epoch_us(ts) // 1000000 AS click_ts_s
        FROM events WHERE event_type = 'click')
      SELECT p.event_id, p.user_id, p.purchase_ts_s, c.click_ts_s,
        p.purchase_ts_s - c.click_ts_s AS gap_s
      FROM p ASOF JOIN c
        ON p.user_id = c.user_id AND p.purchase_ts_s >= c.click_ts_s"""))

  /** FORWARD as-of join (AsOfJoin.asOfForward): each click attached to
    * the user's NEXT purchase at or after it — time-to-convert. Same
    * union + window shape as the backward join, mirrored; payload is
    * the purchase ts itself, so equal-ts ties are hash-safe. The
    * oracle replays the union trick portably (MIN over the following
    * frame ignores the click rows' NULL payloads).
    */
  private val qAsOfForward = QueryDef(
    "q_asof_forward_purchase",
    (s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"),
          col("ts").cast("long").as("click_ts_s"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").cast("long").as("p_ts"))
      AsOfJoin.asOfForward(clicks, purchases, Seq("user_id"),
          leftTs = "click_ts_s", rightTs = "p_ts",
          rightPayload = Map("p_ts" -> "purchase_ts_s"))
        .where(col("purchase_ts_s").isNotNull)
        .select(col("event_id"), col("user_id"), col("click_ts_s"),
          col("purchase_ts_s"),
          (col("purchase_ts_s") - col("click_ts_s")).as("wait_s"))
    },
    Some("""
      WITH c AS (
        SELECT event_id, user_id, epoch_us(ts) // 1000000 AS ts_s
        FROM events WHERE event_type = 'click'),
      p AS (
        SELECT user_id, epoch_us(ts) // 1000000 AS p_ts
        FROM events WHERE event_type = 'purchase'),
      u AS (
        SELECT user_id, ts_s, 0 AS side, event_id,
          CAST(NULL AS BIGINT) AS p_ts FROM c
        UNION ALL
        SELECT user_id, p_ts AS ts_s, 1 AS side,
          CAST(NULL AS BIGINT) AS event_id, p_ts FROM p),
      w AS (
        SELECT user_id, side, event_id, ts_s,
          MIN(p_ts) OVER (PARTITION BY user_id ORDER BY ts_s, side
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
            AS purchase_ts_s
        FROM u)
      SELECT event_id, user_id, ts_s AS click_ts_s, purchase_ts_s,
        purchase_ts_s - ts_s AS wait_s
      FROM w WHERE side = 0 AND purchase_ts_s IS NOT NULL"""))

  /** Scalar/correlated subquery (Catalyst decorrelates to a join):
    * customers whose balance beats their nation's average.
    */
  private val qAboveAvg = QueryDef(
    "q_above_nation_avg_balance",
    (s, d) => {
      val c = Tables.customer(s, d)
      val natAvg = c.groupBy(col("c_nationkey").as("nk"))
        .agg((sum(col("c_acctbal").cast(DecimalType(12, 2))).cast("double") /
          count(lit(1))).as("avg_bal"))
      c.join(broadcast(natAvg), col("c_nationkey") === col("nk"))
        .where(col("c_acctbal") > col("avg_bal"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_above"))
    },
    Some("""
      SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_above
      FROM customer c
      WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
      GROUP BY c_nationkey"""))

  /** Exact percentiles (sort-based aggregate, linear interpolation —
    * same definition in Spark `percentile` and DuckDB `quantile_cont`).
    */
  private val qPercentile = QueryDef(
    "q_quantity_percentiles",
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.25)").as("p25"),
          expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, 0.75)").as("p75"),
          expr("percentile(l_extendedprice, 0.9)").as("price_p90")),
    Some("""
      SELECT l_returnflag,
        quantile_cont(l_quantity, 0.25) AS p25,
        quantile_cont(l_quantity, 0.5) AS p50,
        quantile_cont(l_quantity, 0.75) AS p75,
        quantile_cont(l_extendedprice, 0.9) AS price_p90
      FROM lineitem GROUP BY l_returnflag"""))

  /** approx_percentile (t-digest-style sketch) under the same
    * accuracy-contract pattern as q_approx_distinct: the sketch value
    * is engine-specific, so the query declares the EXACT percentiles
    * plus booleans asserting the approximation landed within the
    * accuracy implied by its precision parameter. l_extendedprice p90
    * with accuracy 1000 must fall within the exact p85–p95 band.
    *
    * ONE array-form percentile aggregate, not three scalar ones: each
    * scalar `percentile` builds its own value buffer over every input
    * row, so the array form is ~3× less aggregation state and work
    * (measured 3.3 s → 1.8 s at sf0.1).
    */
  private val qApproxPct = QueryDef(
    "q_approx_percentiles",
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_extendedprice, array(0.85, 0.9, 0.95))").as("pct"),
          expr("approx_percentile(l_extendedprice, 0.9, 1000)").as("ap"))
        .select(col("l_returnflag"),
          element_at(col("pct"), 2).as("p90_exact"),
          (col("ap") >= element_at(col("pct"), 1) &&
            col("ap") <= element_at(col("pct"), 3))
            .as("approx_in_band")),
    Some("""
      SELECT l_returnflag,
        quantile_cont(l_extendedprice, 0.9) AS p90_exact,
        TRUE AS approx_in_band
      FROM lineitem GROUP BY l_returnflag"""))

  /** UNION ALL (bag semantics — duplicates preserved then recounted). */
  private val qUnionAll = QueryDef(
    "q_union_all_priorities",
    (s, d) => {
      val o = Tables.orders(s, d)
      val h1 = o.where(col("o_orderdate") <
        lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderpriority"))
      val h2 = o.where(col("o_totalprice") > 300000.0)
        .select(col("o_orderpriority"))
      h1.unionAll(h2)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
    },
    Some("""
      SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n FROM (
        SELECT o_orderpriority FROM orders
        WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        UNION ALL
        SELECT o_orderpriority FROM orders WHERE o_totalprice > 300000.0)
      GROUP BY o_orderpriority"""))

  /** HLL approximate distinct, declared as its ACCURACY CONTRACT: the
    * raw sketch estimate is engine-specific (can't hash-match an
    * oracle), so the query outputs the exact distinct counts plus
    * booleans asserting the HLL estimate landed within 15% (3σ of the
    * default 5% rsd) of each — the oracle pins the exact counts and
    * expects both flags TRUE. A broken HLL or a broken tolerance goes
    * red; the estimate still runs end-to-end.
    */
  private val qApprox = QueryDef(
    "q_approx_distinct",
    (s, d) => {
      // NOT one agg with two countDistincts + two HLLs: Catalyst plans
      // multi-distinct via Expand (row count × 3) and the HLL buffers
      // then churn through the expanded copies too — measured 3.6 s vs
      // 1.5 s at sf0.1 for this split form. Two narrow distinct
      // pre-aggs (partial map-side) + one sketch agg + a 3-row join is
      // also the 100 TB-friendly shape: each shuffle carries one
      // (flag, key) stream, never an expanded union of them.
      val li = Tables.lineitem(s, d)
      val orders = li.select(col("l_returnflag"), col("l_orderkey")).distinct()
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_orders_exact"))
      val parts = li.select(col("l_returnflag"), col("l_partkey")).distinct()
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_parts_exact"))
      val approx = li.groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_orderkey")).as("ao"),
          approx_count_distinct(col("l_partkey")).as("ap"))
      orders.join(parts, "l_returnflag").join(approx, "l_returnflag")
        .select(
          col("l_returnflag"), col("n_orders_exact"), col("n_parts_exact"),
          (abs(col("ao") - col("n_orders_exact")) <=
            col("n_orders_exact") * 0.15).as("approx_orders_ok"),
          (abs(col("ap") - col("n_parts_exact")) <=
            col("n_parts_exact") * 0.15).as("approx_parts_ok"))
    },
    Some("""
      SELECT l_returnflag,
        CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders_exact,
        CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts_exact,
        TRUE AS approx_orders_ok,
        TRUE AS approx_parts_ok
      FROM lineitem GROUP BY l_returnflag"""))

  /** Bucketed interval join: click events within ±10 minutes of each
    * purchase for the same user (graft.ops.RangeJoin — quantized
    * buckets + equi-join + exact filter; Spark has no native range-join
    * strategy, a raw inequality predicate plans as a per-key nested
    * loop). dt is exact micros — no division, no float.
    */
  private val qRange = QueryDef(
    "q_range_join_purchase_click",
    (s, d) => {
      val ev = Tables.events(s, d)
      graft.ops.RangeJoin.withinSeconds(
        ev.where(col("event_type") === "purchase"),
        ev.where(col("event_type") === "click"),
        keyCol = "user_id", idCol = "event_id", tsCol = "ts",
        toleranceSec = 600L)
        .select(col("k").as("user_id"), col("left_id").as("purchase_id"),
          col("right_id").as("click_id"),
          (unix_micros(col("right_ts")) - unix_micros(col("left_ts")))
            .as("dt_us"))
    },
    Some("""
      WITH p AS (
        SELECT user_id, event_id, ts FROM events
        WHERE event_type = 'purchase'),
      c AS (
        SELECT user_id, event_id, ts FROM events WHERE event_type = 'click')
      SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
        epoch_us(c.ts) - epoch_us(p.ts) AS dt_us
      FROM p JOIN c ON p.user_id = c.user_id
      WHERE abs(epoch_us(c.ts) - epoch_us(p.ts)) <= 600000000"""))

  /** Deterministic engine-portable sampling (graft.ops.Sampling): the
    * md5-hex threshold selects the same ~25% of documents in any
    * engine — the reproducible-curation primitive. The oracle IS the
    * reproducibility check.
    */
  private val qSample = QueryDef(
    "q_sample_by_key",
    (s, d) =>
      graft.ops.Sampling.sampleByKey(
        Tables.documents(s, d), col("doc_id"), rate = 0.25)
        .select(col("doc_id"), col("lang"), col("source")),
    Some("""
      SELECT doc_id, lang, source FROM documents
      WHERE md5(CAST(doc_id AS VARCHAR)) < '40000000'"""))

  /** Deterministic train/val/test assignment (graft.ops.Sampling
    * .assignSplit): md5-range partitioning of the key space — each doc
    * lands in exactly one split, stably under re-runs, appends, and
    * engine changes (the property that keeps eval sets uncontaminated
    * as the corpus grows). Map-side CASE, no shuffle; the query rolls
    * the assignment up to per-split × per-source counts.
    */
  private val qSplit = QueryDef(
    "q_dataset_split",
    (s, d) =>
      graft.ops.Sampling.assignSplit(
        Tables.documents(s, d), col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy(col("split"), col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars")),
    Some(s"""
      WITH assigned AS (
        SELECT source, n_chars,
          CASE WHEN md5(CAST(doc_id AS VARCHAR)) <
                 '${graft.ops.Sampling.hexThreshold(0.8)}' THEN 'train'
               WHEN md5(CAST(doc_id AS VARCHAR)) <
                 '${graft.ops.Sampling.hexThreshold(0.9)}' THEN 'val'
               ELSE 'test' END AS split
        FROM documents)
      SELECT split, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      FROM assigned GROUP BY split, source"""))

  /** Spatial neighbor join (graft.ops.GeoJoin.neighborPairs): all
    * customer pairs within 10,000 micro-units of each other on a
    * synthetic integer coordinate plane (md5-spread from the key —
    * the Sampling.hexThreshold pattern — so both engines derive
    * identical, genuinely 2-D-uniform points; the round-10 LCG
    * lattice put no two sf0.01 customers within radius, making the
    * green row vacuous). Grid-cell 3×3 probe + exact BIGINT
    * squared-distance filter — never the n² cross product; pairs are
    * integer-exact, so the oracle replays the set.
    */
  private val qGeoJoin = QueryDef(
    "q_geo_neighbor_join",
    (s, d) => {
      def coord(tag: String) = pmod(
        conv(substring(md5(concat_ws(":", lit(tag), col("c_custkey"))),
          1, 13), 16, 10).cast("long"), lit(1000000L))
      val pts = Tables.customer(s, d).select(col("c_custkey").as("id"),
        coord("gx").as("x"), coord("gy").as("y"))
      graft.ops.GeoJoin.neighborPairs(pts, "id", "x", "y", radius = 10000L)
    },
    Some("""
      WITH pts AS (
        SELECT c_custkey AS id,
          CAST(CAST(('0x' || substr(md5('gx:' || c_custkey), 1, 13))
            AS UBIGINT) % 1000000 AS BIGINT) AS x,
          CAST(CAST(('0x' || substr(md5('gy:' || c_custkey), 1, 13))
            AS UBIGINT) % 1000000 AS BIGINT) AS y
        FROM customer),
      cells AS (
        SELECT id, x, y, x // 10000 AS cx, y // 10000 AS cy FROM pts),
      probe AS (
        SELECT id AS id_a, x AS xa, y AS ya,
          cx + dx.v AS cx, cy + dy.v AS cy
        FROM cells, (VALUES (-1), (0), (1)) dx(v),
          (VALUES (-1), (0), (1)) dy(v)),
      pairs AS (
        SELECT p.id_a, b.id AS id_b,
          (p.xa - b.x) * (p.xa - b.x) + (p.ya - b.y) * (p.ya - b.y)
            AS dist2
        FROM probe p JOIN cells b ON p.cx = b.cx AND p.cy = b.cy
        WHERE p.id_a < b.id)
      SELECT id_a, id_b, CAST(dist2 AS BIGINT) AS dist2 FROM pairs
      WHERE dist2 <= 100000000"""))

  /** Snapshot diff / CDC (graft.ops.SnapshotDiff.diff): per-key
    * added/removed/changed between two versions of a keyed dataset —
    * the incremental-recompute primitive (feed only the delta to the
    * expensive downstream). The "new" snapshot is derived in both
    * engines from orders: keys %11=0 deleted, %7=0 restated, %13=0
    * re-added under offset keys. The engine decides changed-vs-same on
    * a map-side md5 row digest; the oracle compares column values —
    * identical sets (md5 is collision-free for any feasible input).
    */
  private val qSnapshotDiff = QueryDef(
    "q_snapshot_diff",
    (s, d) => {
      val orders = Tables.orders(s, d)
      val oldS = orders.select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_orderpriority"))
      val newS = orders.where(col("o_orderkey") % 11 =!= 0)
        .select(col("o_orderkey"), col("o_custkey"),
          when(col("o_orderkey") % 7 === 0, lit("RESTATED"))
            .otherwise(col("o_orderstatus")).as("o_orderstatus"),
          col("o_orderpriority"))
        .unionByName(orders.where(col("o_orderkey") % 13 === 0)
          .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
            col("o_custkey"), lit("NEW").as("o_orderstatus"),
            col("o_orderpriority")))
      graft.ops.SnapshotDiff.diff(oldS, newS, Seq("o_orderkey"),
        Seq("o_custkey", "o_orderstatus", "o_orderpriority"))
    },
    Some("""
      WITH olds AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
        FROM orders),
      news AS (
        SELECT o_orderkey, o_custkey,
          CASE WHEN o_orderkey % 7 = 0 THEN 'RESTATED'
               ELSE o_orderstatus END AS o_orderstatus,
          o_orderpriority
        FROM orders WHERE o_orderkey % 11 <> 0
        UNION ALL
        SELECT o_orderkey + 10000000, o_custkey, 'NEW', o_orderpriority
        FROM orders WHERE o_orderkey % 13 = 0),
      j AS (
        SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
          o.o_custkey AS old_o_custkey, n.o_custkey AS new_o_custkey,
          o.o_orderstatus AS old_o_orderstatus,
          n.o_orderstatus AS new_o_orderstatus,
          o.o_orderpriority AS old_o_orderpriority,
          n.o_orderpriority AS new_o_orderpriority,
          (o.o_orderkey IS NULL) AS is_add, (n.o_orderkey IS NULL) AS is_del
        FROM olds o FULL OUTER JOIN news n ON o.o_orderkey = n.o_orderkey)
      SELECT o_orderkey,
        CASE WHEN is_add THEN 'added' WHEN is_del THEN 'removed'
             ELSE 'changed' END AS change_type,
        old_o_custkey, new_o_custkey, old_o_orderstatus,
        new_o_orderstatus, old_o_orderpriority, new_o_orderpriority
      FROM j
      WHERE is_add OR is_del
        OR old_o_custkey IS DISTINCT FROM new_o_custkey
        OR old_o_orderstatus IS DISTINCT FROM new_o_orderstatus
        OR old_o_orderpriority IS DISTINCT FROM new_o_orderpriority"""))

  /** Deterministic training-order shuffle with SCALABLE global
    * enumeration (graft.ops.Sampling.shuffledIndex): md5-shuffled
    * global position + 128-doc shard id, computed with the two-level
    * prefix-sum shape (256 digest-prefix range buckets, per-bucket
    * windows, broadcast offsets) instead of the single-partition
    * `row_number() OVER (ORDER BY ...)` the oracle is allowed to use
    * at sf scale — same result, scalable plan.
    */
  private val qShuffle = QueryDef(
    "q_training_shuffle",
    (s, d) =>
      graft.ops.Sampling.shuffledIndex(
        Tables.documents(s, d).select(col("doc_id")),
        col("doc_id"), seed = 42L, shardSize = 128L),
    Some("""
      SELECT doc_id,
        CAST(ROW_NUMBER() OVER w AS BIGINT) AS shuffle_pos,
        CAST((ROW_NUMBER() OVER w - 1) // 128 AS BIGINT) AS shard
      FROM documents
      WINDOW w AS (ORDER BY md5(CAST(doc_id AS VARCHAR) || ':42'), doc_id)"""))

  /** Weighted source mixing (graft.ops.Sampling.mixSources): the
    * corpus-composition step — each source sampled at its own rate in
    * one map-side CASE-threshold filter, deterministic in any engine.
    * Spec here: src0 fully, src1 half, src2 quarter, src3 a tenth,
    * every other source dropped (a mixing spec is a whitelist).
    */
  private val qMixSources = QueryDef(
    "q_source_mixing",
    (s, d) =>
      graft.ops.Sampling.mixSources(
        Tables.documents(s, d).select(col("doc_id"), col("source")),
        col("doc_id"), col("source"),
        Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25, "src3" -> 0.1)),
    Some("""
      SELECT doc_id, source FROM documents
      WHERE CASE source
          WHEN 'src0' THEN TRUE
          WHEN 'src1' THEN md5(CAST(doc_id AS VARCHAR)) < '80000000'
          WHEN 'src2' THEN md5(CAST(doc_id AS VARCHAR)) < '40000000'
          WHEN 'src3' THEN md5(CAST(doc_id AS VARCHAR)) < '19999999'
          ELSE FALSE
        END"""))

  /** Temperature-flattened mixing at τ=1/2
    * (Sampling.temperatureMixSqrt): sources sampled ∝ ⌊√n⌋/⌊√n_max⌋ —
    * the corpus-balancing rule that keeps tail sources from being
    * drowned — with per-source thresholds computed IN THE PLAN from
    * the counts. τ is pinned to 1/2 because IEEE sqrt is correctly
    * rounded on every engine (pow is not), so the oracle replays
    * count → ⌊√n⌋ → ratio → hex threshold → md5 draw bit-exactly.
    *
    * The synthetic documents table is source-UNIFORM (equal counts →
    * every p = 1 → the exhibit would be vacuous), so sources are
    * regrouped deterministically into a skewed macro-mix first —
    * head 50%, mid 30%, two 10% tails — making the flattening branch
    * (p < 1 thresholds) do real selection under the hash compare.
    */
  private val qTemperatureMix = QueryDef(
    "q_temperature_mix",
    (s, d) => graft.ops.Sampling.temperatureMixSqrt(
      Tables.documents(s, d).select(
        when(pmod(col("doc_id"), lit(10)) < 5, lit("head"))
          .when(pmod(col("doc_id"), lit(10)) < 8, lit("mid"))
          .otherwise(concat(lit("tail"), pmod(col("doc_id"), lit(10))))
          .as("source"),
        col("doc_id")),
      col("source"), col("doc_id")),
    Some("""
      WITH docs AS (
        SELECT CASE WHEN doc_id % 10 < 5 THEN 'head'
                    WHEN doc_id % 10 < 8 THEN 'mid'
                    ELSE 'tail' || CAST(doc_id % 10 AS VARCHAR) END AS source,
          doc_id
        FROM documents),
      counts AS (
        SELECT source,
          CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS w
        FROM docs GROUP BY source),
      mx AS (SELECT MAX(w) AS wmax FROM counts),
      thr AS (
        SELECT source,
          CASE WHEN w >= wmax THEN 'g'
               ELSE printf('%08x', CAST(FLOOR(
                 (CAST(w AS DOUBLE) / CAST(wmax AS DOUBLE))
                   * 4294967296.0) AS BIGINT)) END AS t
        FROM counts CROSS JOIN mx)
      SELECT d.source, d.doc_id
      FROM docs d JOIN thr ON d.source = thr.source
      WHERE md5(CAST(d.doc_id AS VARCHAR)) < thr.t"""))

  /** Incremental aggregate maintenance (SnapshotDiff.maintainSumAgg):
    * two deterministic snapshot versions of orders (v1 drops key%89,
    * v2 drops key%97 and bumps key%13's cents — so adds, removes, AND
    * group-value changes all occur), the per-priority (count, cents)
    * aggregate of v1 maintained forward by the diff. The ORACLE is the
    * direct aggregate over v2 — a green row proves
    * maintain(agg(v1), diff(v1,v2)) ≡ agg(v2) without rescanning v1.
    */
  private val qIncrementalAgg = QueryDef(
    "q_incremental_agg",
    (s, d) => {
      val cents = col("o_totalprice").cast(DecimalType(12, 2))
        .multiply(lit(100)).cast("long")
      val base = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"),
          cents.as("cents"))
      val v1 = base.where(col("o_orderkey") % 89 =!= 0)
      val v2 = base.where(col("o_orderkey") % 97 =!= 0)
        .withColumn("cents", when(col("o_orderkey") % 13 === 0,
          col("cents") + 1000L).otherwise(col("cents")))
      val oldAgg = v1.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
      val changes = graft.ops.SnapshotDiff.diff(v1, v2,
        Seq("o_orderkey"), Seq("o_orderpriority", "cents"))
      graft.ops.SnapshotDiff
        .maintainSumAgg(oldAgg, changes, "o_orderpriority", "cents")
        .select(col("o_orderpriority"), col("n").as("n_orders"),
          col("s").as("sum_cents"))
    },
    Some("""
      SELECT o_orderpriority,
        CAST(COUNT(*) AS BIGINT) AS n_orders,
        CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
          + CASE WHEN o_orderkey % 13 = 0 THEN 1000 ELSE 0 END)
          AS BIGINT) AS sum_cents
      FROM orders WHERE o_orderkey % 97 <> 0
      GROUP BY o_orderpriority"""))

  /** STREAMING materialized-view maintenance (streaming/
    * StreamingViewMaintenance): the maintained (priority → count, sum)
    * view as the state of one continuous aggregation over change-flow
    * rows — seed view in drain 1, the v1→v2 changeset lands as a
    * second file-source increment, base table never rescanned. Shares
    * q_incremental_agg's oracle (the direct v2 aggregate): the
    * maintain ≡ recompute law, proven for the continuous maintainer.
    */
  private val qStreamIncrementalAgg = QueryDef(
    "q_stream_incremental_agg",
    (s, d) => graft.streaming.StreamingViewMaintenance
      .runBatchEquivalent(s, d),
    Some("""
      SELECT o_orderpriority,
        CAST(COUNT(*) AS BIGINT) AS n_orders,
        CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
          + CASE WHEN o_orderkey % 13 = 0 THEN 1000 ELSE 0 END)
          AS BIGINT) AS sum_cents
      FROM orders WHERE o_orderkey % 97 <> 0
      GROUP BY o_orderpriority"""))

  /** Stratified fixed-n sampling (Sampling.stratifiedFixedN): the 5
    * smallest md5 draws per source — equal-allocation selection via
    * the partial pair-top-k (no per-group window sort). Oracle
    * replays draws and the (13-hex-prefix, id) rank order.
    */
  private val qStratified = QueryDef(
    "q_stratified_sample",
    (s, d) =>
      graft.ops.Sampling.stratifiedFixedN(
        Tables.documents(s, d), col("doc_id"), col("source"), n = 5),
    Some("""
      SELECT source AS group_key, CAST(rn AS INT) AS rank, doc_id AS id
      FROM (
        SELECT source, doc_id,
          ROW_NUMBER() OVER (PARTITION BY source
            ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 13), doc_id)
            AS rn
        FROM documents)
      WHERE rn <= 5"""))

  /** Deterministic negative sampling (ops/NegativeSampling): 4
    * contrastive negatives per document from a 10% md5-threshold pool,
    * draws = md5(anchor:candidate), per-anchor ranking via the partial
    * pair-top-k (no N×pool window). The oracle replays pool, draws,
    * and the (13-hex-prefix, id) rank order exactly.
    */
  private val qNegatives = QueryDef(
    "q_negative_samples",
    (s, d) =>
      graft.ops.NegativeSampling.negativeSamples(
        Tables.documents(s, d).select(col("doc_id")),
        "doc_id", k = 4, poolRate = 0.1),
    Some("""
      WITH pool AS (
        SELECT doc_id AS neg_id FROM documents
        WHERE md5(CAST(doc_id AS VARCHAR)) < '19999999'),
      d AS (
        SELECT a.doc_id AS anchor_id, p.neg_id,
          md5(a.doc_id || ':' || p.neg_id) AS draw
        FROM documents a CROSS JOIN pool p
        WHERE a.doc_id <> p.neg_id)
      SELECT anchor_id, CAST(rn AS INT) AS rank, neg_id FROM (
        SELECT anchor_id, neg_id,
          ROW_NUMBER() OVER (PARTITION BY anchor_id
            ORDER BY substr(draw, 1, 13), neg_id) AS rn
        FROM d)
      WHERE rn <= 4"""))

  /** The PAST-BROADCAST rung of the same operator, forced
    * (maxBroadcastPool=0): pool hash-sharded into 64 buckets, anchors
    * replicated across shards, shuffle-join on the shard key, same
    * partial pair-top-k with the same comparator — the output must be
    * bit-identical, so it shares q_negative_samples' full-replay
    * oracle verbatim (the salted-join ≡ plain-join proof pattern,
    * applied to the rung a 100 TB pool actually needs).
    */
  private val qNegativesSharded = QueryDef(
    "q_negative_samples_sharded",
    (s, d) =>
      graft.ops.NegativeSampling.negativeSamples(
        Tables.documents(s, d).select(col("doc_id")),
        "doc_id", k = 4, poolRate = 0.1,
        maxBroadcastPool = 0L, shards = 64),
    Some("""
      WITH pool AS (
        SELECT doc_id AS neg_id FROM documents
        WHERE md5(CAST(doc_id AS VARCHAR)) < '19999999'),
      d AS (
        SELECT a.doc_id AS anchor_id, p.neg_id,
          md5(a.doc_id || ':' || p.neg_id) AS draw
        FROM documents a CROSS JOIN pool p
        WHERE a.doc_id <> p.neg_id)
      SELECT anchor_id, CAST(rn AS INT) AS rank, neg_id FROM (
        SELECT anchor_id, neg_id,
          ROW_NUMBER() OVER (PARTITION BY anchor_id
            ORDER BY substr(draw, 1, 13), neg_id) AS rn
        FROM d)
      WHERE rn <= 4"""))

  /** The COMPUTE-scale rung of negative sampling
    * (NegativeSampling.negativeSamplesByIndex): O(anchors × k) draw
    * work under its own spec — dense bucket-major pool index, per-
    * anchor candidate indices md5(anchor:j) mod P, join on index,
    * reject self/duplicates, rank by draw number. The rank-spec rungs
    * above pay anchors×|pool| digests BY SPEC; this is the rung a
    * 10⁹-anchor × 10⁸-pool corpus actually runs. The oracle replays
    * the whole spec: the index assignment (one bucket-major
    * ROW_NUMBER), the 52-bit hex-prefix draw, and the min-j dedupe.
    */
  private val qNegativesDraws = QueryDef(
    "q_negative_samples_draws",
    (s, d) =>
      graft.ops.NegativeSampling.negativeSamplesByIndex(
        Tables.documents(s, d).select(col("doc_id")),
        "doc_id", k = 4, poolRate = 0.1),
    Some("""
      WITH pool AS (
        SELECT doc_id AS neg_id FROM documents
        WHERE md5(CAST(doc_id AS VARCHAR)) < '19999999'),
      idx AS (
        SELECT neg_id,
          ROW_NUMBER() OVER (ORDER BY neg_id % 256, neg_id) - 1 AS pidx
        FROM pool),
      p AS (SELECT COUNT(*) AS pn FROM pool),
      draws AS (
        SELECT a.doc_id AS anchor_id, j.j,
          CAST(('0x' || substr(md5(a.doc_id || ':' || j.j), 1, 13))
            AS UBIGINT) % p.pn AS pidx
        FROM documents a
        CROSS JOIN (SELECT unnest(range(12)) AS j) j
        CROSS JOIN p),
      hits AS (
        SELECT d.anchor_id, MIN(d.j) AS j, i.neg_id
        FROM draws d JOIN idx i USING (pidx)
        WHERE i.neg_id <> d.anchor_id
        GROUP BY d.anchor_id, i.neg_id)
      SELECT anchor_id, CAST(rn AS INT) AS rank, neg_id FROM (
        SELECT anchor_id, neg_id,
          ROW_NUMBER() OVER (PARTITION BY anchor_id ORDER BY j) AS rn
        FROM hits)
      WHERE rn <= 4"""))

  /** WEIGHTED negative sampling
    * (NegativeSampling.negativeSamplesWeighted): draws ∝ n_chars —
    * the word2vec-style frequency-weighted draw — still O(anchors×k):
    * each pool doc owns a cumulative-weight interval (bucket-major
    * prefix sum), a draw u = md5(anchor:j) mod totalW picks the
    * containing interval via a bin equi-join. The oracle replays the
    * weight line (one total-order window), the 52-bit draws, and the
    * interval containment as a plain inequality join.
    */
  private val qNegativesWeighted = QueryDef(
    "q_negative_samples_weighted",
    (s, d) =>
      graft.ops.NegativeSampling.negativeSamplesWeighted(
        Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", k = 4, poolRate = 0.1),
    Some("""
      WITH pool AS (
        SELECT doc_id AS neg_id, CAST(n_chars AS BIGINT) AS w
        FROM documents
        WHERE md5(CAST(doc_id AS VARCHAR)) < '19999999' AND n_chars > 0),
      iv AS (
        SELECT neg_id,
          COALESCE(SUM(w) OVER (ORDER BY neg_id % 256, neg_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lo,
          COALESCE(SUM(w) OVER (ORDER BY neg_id % 256, neg_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + w AS hi
        FROM pool),
      tot AS (SELECT SUM(w) AS tw FROM pool),
      draws AS (
        SELECT a.doc_id AS anchor_id, j.j,
          CAST(('0x' || substr(md5(a.doc_id || ':' || j.j), 1, 13))
            AS UBIGINT) % t.tw AS u
        FROM documents a
        CROSS JOIN (SELECT unnest(range(12)) AS j) j
        CROSS JOIN tot t),
      hits AS (
        SELECT d.anchor_id, MIN(d.j) AS j, i.neg_id
        FROM draws d JOIN iv i ON d.u >= i.lo AND d.u < i.hi
        WHERE i.neg_id <> d.anchor_id
        GROUP BY 1, 3)
      SELECT anchor_id, CAST(rn AS INT) AS rank, neg_id FROM (
        SELECT anchor_id, neg_id,
          ROW_NUMBER() OVER (PARTITION BY anchor_id ORDER BY j) AS rn
        FROM hits)
      WHERE rn <= 4"""))

  /** Token-budget mixing (Sampling.tokenBudgetSample): keep each
    * source's md5-shuffle prefix until 2000 tokens — the mixture
    * primitive specified in TOKENS (how training mixes are actually
    * written) rather than doc rates. The engine runs the two-level
    * bucket/prefix-sum shape (no per-source global window); the
    * oracle replays the SEMANTIC rule — exclusive running token sum
    * in (digest, id) order < budget — as one window, which is
    * affordable at oracle scale and pins the identical kept set.
    */
  private val qTokenBudget = QueryDef(
    "q_token_budget_mix",
    (s, d) => {
      val docs = Tables.documents(s, d)
      graft.ops.Sampling.tokenBudgetSample(
        docs.select(col("doc_id"), col("source"),
          graft.text.TextFunctions.tokenCount(col("text")).cast("long")
            .as("n_tok")),
        col("doc_id"), col("source"), col("n_tok"), budget = 2000L)
    },
    Some("""
      WITH t AS (
        SELECT doc_id, source,
          CAST(CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\s+')) END
            AS BIGINT) AS n_tok,
          md5(CAST(doc_id AS VARCHAR)) AS dg
        FROM documents),
      c AS (
        SELECT doc_id, source, n_tok,
          COALESCE(SUM(n_tok) OVER (
            PARTITION BY source ORDER BY dg, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        FROM t)
      SELECT doc_id, source, n_tok FROM c WHERE cb < 2000"""))

  /** Sequence packing (graft.ops.Packing): documents → fixed
    * token-budget bins per shard, as one window prefix-sum (no driver
    * loop, no global sort — the window partitions by shard). The
    * oracle replays the same prefix-sum rule in SQL.
    */
  private val qPacking = QueryDef(
    "q_sequence_packing",
    (s, d) =>
      graft.ops.Packing.packSequences(
        Tables.documents(s, d),
        "doc_id", graft.text.TextFunctions.tokenCount(col("text")),
        budget = 512, shards = 8),
    Some("""
      WITH t AS (
        SELECT doc_id, doc_id % 8 AS shard,
          CAST(CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS INT)
            AS n_tokens
        FROM documents),
      nz AS (SELECT * FROM t WHERE n_tokens > 0)
      SELECT doc_id, shard, n_tokens,
        CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
          AS bin_start,
        CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 512
          AS BIGINT) AS bin
      FROM nz"""))

  /** Packing-efficiency readout over the SAME packing (the number a
    * training-infra owner actually watches): per shard — docs, bins,
    * token volume, and fill_ppm = tokens·10⁶ div (bins·budget). Fill
    * can exceed 10⁶ because boundary-straddling docs belong to the
    * bin their first token falls in (packSequences' documented rule);
    * a fill materially below 10⁶ means the shard's tail bin is
    * draining the average and the shard count is too high for the
    * corpus.
    */
  private val qPackingEfficiency = QueryDef(
    "q_packing_efficiency",
    (s, d) =>
      graft.ops.Packing.packSequences(
        Tables.documents(s, d),
        "doc_id", graft.text.TextFunctions.tokenCount(col("text")),
        budget = 512, shards = 8)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("bin")).as("n_bins"),
          sum(col("n_tokens").cast("long")).as("sum_tokens"))
        .withColumn("fill_ppm",
          expr("(sum_tokens * 1000000) div (n_bins * 512)")),
    Some("""
      WITH t AS (
        SELECT doc_id, doc_id % 8 AS shard,
          CAST(CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS INT)
            AS n_tokens
        FROM documents),
      nz AS (SELECT * FROM t WHERE n_tokens > 0),
      p AS (
        SELECT doc_id, shard, n_tokens,
          CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard
            ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 512
            AS BIGINT) AS bin
        FROM nz)
      SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(COUNT(DISTINCT bin) AS BIGINT) AS n_bins,
        CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
        CAST((SUM(n_tokens) * 1000000) // (COUNT(DISTINCT bin) * 512)
          AS BIGINT) AS fill_ppm
      FROM p GROUP BY shard"""))

  /** Two-stage salted aggregation (graft.ops.Salting) — the manual
    * extreme-skew mitigation. The oracle is the PLAIN group-by: for
    * algebraic aggregates the salted two-stage result is exactly the
    * direct result by construction, and this check pins that identity
    * (row-routing salt must not leak into values). All aggregates here
    * are order-independent exacts (integer-valued double sum, max,
    * count), so the hash compare is safe.
    */
  private val qSalted = QueryDef(
    "q_salted_agg",
    (s, d) =>
      graft.ops.Salting.saltedAgg(
        Tables.lineitem(s, d), Seq("l_returnflag"), saltBuckets = 32,
        partials = Seq(sum(col("l_quantity")).as("p_qty"),
          max(col("l_extendedprice")).as("p_max"),
          count(lit(1)).as("p_n")),
        finals = Seq(sum(col("p_qty")).as("sum_qty"),
          max(col("p_max")).as("max_price"),
          sum(col("p_n")).as("n_rows"))),
    Some("""
      SELECT l_returnflag,
        SUM(l_quantity) AS sum_qty,
        MAX(l_extendedprice) AS max_price,
        CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM lineitem GROUP BY l_returnflag"""))

  /** Salted skew JOIN (ops/Salting.saltedJoin): lineitem fact rows
    * round-robin over 8 salt buckets, orders replicated once per
    * bucket, equijoin on (l_orderkey=o_orderkey, salt) — the manual
    * spread for a hot join key that AQE's skew splitter can't always
    * reach (shuffled-hash joins, pre-bucketed layouts). Declared as an
    * IDENTITY exhibit like q_salted_agg: the salted join must equal
    * the plain join row-for-row, checked through an order-priority
    * revenue rollup so the oracle is the unsalted SQL join.
    */
  private val qSaltedJoin = QueryDef(
    "q_salted_join",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .withColumnRenamed("l_orderkey", "o_orderkey")
      val joined = graft.ops.Salting.saltedJoin(
        li, Tables.orders(s, d), "o_orderkey", saltBuckets = 8)
      joined.groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_items"),
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").as("sum_price"))
    },
    Some("""
      SELECT o_orderpriority,
        CAST(COUNT(*) AS BIGINT) AS n_items,
        SUM(l_quantity) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority"""))

  /** Runtime Bloom-pruned fact-fact join (graft.ops.BloomJoin): a
    * selective orders slice builds a Bloom sketch of its keys; the
    * sketch prunes lineitem MAP-SIDE before the join shuffle (the
    * explicit form of Spark's runtime row-level filtering). Declared
    * as an IDENTITY exhibit like q_salted_join: false positives die in
    * the exact join, so pruned ≡ plain — the oracle is the unpruned
    * SQL join and the hash compare is the proof. PlanSpec asserts the
    * might_contain filter sits in the scan stage below the exchange —
    * the property that cuts the fact shuffle to ~(selectivity + fpp)
    * of the corpus at 100 TB.
    */
  private val qBloomJoin = QueryDef(
    "q_bloom_join_revenue",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .withColumnRenamed("l_orderkey", "o_orderkey")
      val o = Tables.orders(s, d)
        .where(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
      graft.ops.BloomJoin
        .bloomPrunedJoin(li, o, "o_orderkey", "o_orderkey")
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_items"),
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").as("sum_price"))
    },
    Some("""
      SELECT o_orderpriority,
        CAST(COUNT(*) AS BIGINT) AS n_items,
        SUM(l_quantity) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY o_orderpriority"""))

  /** Build-once memo for the bucketed layout (same contract as the
    * served IVF index): the QUERY is the co-located join; rewriting the
    * bucketed tables per invocation would time the layout build, which
    * at deployment is a one-time write decision.
    */
  private val builtBucketed =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Storage-bucketed co-located join (graft.ops.Bucketing): orders and
    * lineitem pre-bucketed AND pre-sorted on the order key → the join
    * plan has ZERO exchanges and zero sorts (PlanSpec-asserted) — the
    * scan satisfies the join's distribution and ordering requirements.
    * At 100 TB this is the layout that removes the fact-fact shuffle
    * from every downstream join on the key. Same rollup as
    * q_salted_join, so the oracle is the plain SQL join — bucketed ≡
    * plain, hash-checked.
    */
  private val qBucketedJoin = QueryDef(
    "q_bucketed_join_revenue",
    (parent, d) => {
      // Spark 3+ ignores the written per-bucket sort on read unless
      // this (misleadingly "legacy") conf is on — without it the SMJ
      // re-sorts data that is already sorted on disk. Scope it to a
      // CLONED session (shared SparkContext + catalog, own SQLConf —
      // the StreamingRun.withStatePartitions pattern) so nothing else
      // on the parent session plans under a conf it didn't ask for.
      // One-file-per-bucket is the other precondition (see
      // Bucketing.writeBucketed).
      val s = parent.newSession()
      s.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      // tag embeds a content fingerprint of both source tables — a
      // testdata regeneration mints a new path/table pair and forces a
      // layout rebuild instead of serving stale buckets; it also keeps
      // the first invocation's one-time write out of later min-of-N
      // runs only when the data is actually unchanged
      val tag = d.replaceAll("[^A-Za-z0-9]", "_") + "_" +
        graft.util.DataFingerprint.of(s, s"$d/lineitem.parquet") + "_" +
        graft.util.DataFingerprint.of(s, s"$d/orders.parquet")
      val base = System.getProperty("java.io.tmpdir") + s"/graft_bucketed_$tag"
      if (builtBucketed.add(base)) {
        graft.ops.Bucketing.writeBucketed(Tables.lineitem(s, d),
          s"graft_li_b_$tag", s"$base/lineitem", "l_orderkey", 16)
        graft.ops.Bucketing.writeBucketed(
          Tables.orders(s, d).withColumnRenamed("o_orderkey", "l_orderkey"),
          s"graft_ord_b_$tag", s"$base/orders", "l_orderkey", 16)
      }
      val li = graft.ops.Bucketing.readBucketed(s, s"graft_li_b_$tag")
      val ord = graft.ops.Bucketing.readBucketed(s, s"graft_ord_b_$tag")
      // merge hint: without it AQE broadcasts the small side at test SF
      // and the exhibit would not exercise the co-located SMJ path
      li.hint("merge").join(ord, Seq("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_items"),
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").as("sum_price"))
    },
    Some("""
      SELECT o_orderpriority,
        CAST(COUNT(*) AS BIGINT) AS n_items,
        SUM(l_quantity) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority"""))

  /** Top-3 prices per supplier via the partial top-k Aggregator
    * (functions/TopKAggregator) — the map-side alternative to the
    * window row_number formulation (q_window_top3_per_supplier): the
    * shuffle carries ≤k doubles per (mapper, key), not every row. The
    * oracle is the window formulation, proving the two top-k shapes
    * agree exactly.
    */
  private val qTopKAgg = QueryDef(
    "q_topk_agg_prices_per_supplier",
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_suppkey"))
        .agg(graft.functions.TopKAggregator.top_k(3)(col("l_extendedprice"))
          .as("top"))
        .select(col("l_suppkey"), posexplode(col("top")))
        .select(col("l_suppkey"), (col("pos") + 1).cast("int").as("rank"),
          col("col").as("price")),
    Some("""
      SELECT l_suppkey, CAST(rn AS INT) AS rank, price FROM (
        SELECT l_suppkey, l_extendedprice AS price,
          ROW_NUMBER() OVER (PARTITION BY l_suppkey
            ORDER BY l_extendedprice DESC) AS rn
        FROM lineitem)
      WHERE rn <= 3"""))

  /** Shuffle-strategy advisor (Profiling.aggKeyAdvice): exact per-key
    * mass profiles for four candidate grouping keys of lineitem and
    * the partitioning decision each implies at parallelism 32 — the
    * auto-tuning readout that routes hot keys to
    * `Salting.saltedAgg` before the job runs. l_orderkey/l_suppkey
    * profile as plain hash; l_returnflag/l_linestatus (2-3 values
    * carrying ~half the rows each) trip the 1/P line and get salt
    * factors sized to sink the hottest key back under it.
    */
  private val qAggAdvice = QueryDef(
    "q_agg_strategy_advice",
    (s, d) => graft.ops.Profiling.aggKeyAdvice(
      Tables.lineitem(s, d),
      Seq("l_orderkey" -> col("l_orderkey"),
        "l_suppkey" -> col("l_suppkey"),
        "l_returnflag" -> col("l_returnflag"),
        "l_linestatus" -> col("l_linestatus")),
      parallelism = 32),
    Some {
      def leg(k: String) = s"""
        SELECT '$k' AS group_key, n_rows, n_distinct, max_freq,
          (max_freq * 1000000) // n_rows AS mass_share_ppm
        FROM (
          SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
            CAST(COUNT(*) AS BIGINT) AS n_distinct,
            CAST(MAX(c) AS BIGINT) AS max_freq
          FROM (SELECT COUNT(*) AS c FROM lineitem GROUP BY $k))"""
      s"""
      WITH stats AS (${Seq("l_orderkey", "l_suppkey", "l_returnflag",
          "l_linestatus").map(leg).mkString(" UNION ALL ")})
      SELECT group_key, n_rows, n_distinct, max_freq, mass_share_ppm,
        CASE WHEN mass_share_ppm >= 31250 THEN 'salted_two_stage'
             ELSE 'plain_hash' END AS advice,
        CAST(CASE WHEN mass_share_ppm >= 31250
          THEN LEAST(32, GREATEST(2, mass_share_ppm // 31250))
          ELSE 1 END AS BIGINT) AS salt_factor
      FROM stats"""
    })

  /** Streaming twin of the shuffle-strategy advisor
    * (streaming/StreamingAdvice — the StreamingKeySkew pattern):
    * per-key counts for the user_id and event_type candidates
    * maintained as streaming aggregations with O(|keys|) state, the
    * advice fold running on each counts snapshot through the batch
    * code path. The live control input of a partition router. The
    * oracle computes the same two advice rows directly over events.
    */
  private val qStreamAdvice = QueryDef(
    "q_stream_agg_advice",
    (s, d) => graft.streaming.StreamingAdvice.runBatchEquivalent(s, d),
    Some {
      def leg(k: String) = s"""
        SELECT '$k' AS group_key, n_rows, n_distinct, max_freq,
          (max_freq * 1000000) // n_rows AS mass_share_ppm
        FROM (
          SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
            CAST(COUNT(*) AS BIGINT) AS n_distinct,
            CAST(MAX(c) AS BIGINT) AS max_freq
          FROM (SELECT COUNT(*) AS c FROM events GROUP BY $k))"""
      s"""
      WITH stats AS (${Seq("user_id", "event_type")
          .map(leg).mkString(" UNION ALL ")})
      SELECT group_key, n_rows, n_distinct, max_freq, mass_share_ppm,
        CASE WHEN mass_share_ppm >= 31250 THEN 'salted_two_stage'
             ELSE 'plain_hash' END AS advice,
        CAST(CASE WHEN mass_share_ppm >= 31250
          THEN LEAST(32, GREATEST(2, mass_share_ppm // 31250))
          ELSE 1 END AS BIGINT) AS salt_factor
      FROM stats"""
    })

  /** Incremental JOIN-view maintenance
    * (SnapshotDiff.maintainJoinView): the orders⋈customer view rolled
    * forward from the two key-level changesets alone — fact keys
    * deleted/restated/added, dim keys deleted/segment-moved — never
    * recomputing the full join. The oracle IS the law: it computes the
    * direct A2⋈B2 join, so the hash check proves
    * maintain(A1⋈B1, Δ) ≡ A2⋈B2 row-for-row.
    */
  private val qIncrementalJoinView = QueryDef(
    "q_incremental_join_view",
    (s, d) => {
      val orders = Tables.orders(s, d)
      val cust = Tables.customer(s, d)
      val a1 = orders.select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"))
      val a2 = orders.where(col("o_orderkey") % 11 =!= 0)
        .select(col("o_orderkey"), col("o_custkey"),
          when(col("o_orderkey") % 7 === 0, lit("RESTATED"))
            .otherwise(col("o_orderstatus")).as("o_orderstatus"))
        .unionByName(orders.where(col("o_orderkey") % 13 === 0)
          .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
            col("o_custkey"), lit("NEW").as("o_orderstatus")))
      val b1 = cust.select(col("c_custkey"), col("c_mktsegment"))
      val b2 = cust.where(col("c_custkey") % 17 =!= 0)
        .select(col("c_custkey"),
          when(col("c_custkey") % 9 === 0, lit("MOVED"))
            .otherwise(col("c_mktsegment")).as("c_mktsegment"))
      val v1 = a1.join(b1, col("o_custkey") === col("c_custkey"))
        .drop("c_custkey")
      val dA = graft.ops.SnapshotDiff
        .diff(a1, a2, Seq("o_orderkey"), Seq("o_custkey", "o_orderstatus"))
        .select(col("o_orderkey"))
      val dB = graft.ops.SnapshotDiff
        .diff(b1, b2, Seq("c_custkey"), Seq("c_mktsegment"))
        .select(col("c_custkey"))
      graft.ops.SnapshotDiff.maintainJoinView(v1, a2, b2, dA, dB,
        "o_orderkey", "o_custkey", "c_custkey")
    },
    Some("""
      WITH a2 AS (
        SELECT o_orderkey, o_custkey,
          CASE WHEN o_orderkey % 7 = 0 THEN 'RESTATED'
               ELSE o_orderstatus END AS o_orderstatus
        FROM orders WHERE o_orderkey % 11 <> 0
        UNION ALL
        SELECT o_orderkey + 10000000, o_custkey, 'NEW'
        FROM orders WHERE o_orderkey % 13 = 0),
      b2 AS (
        SELECT c_custkey,
          CASE WHEN c_custkey % 9 = 0 THEN 'MOVED'
               ELSE c_mktsegment END AS c_mktsegment
        FROM customer WHERE c_custkey % 17 <> 0)
      SELECT a2.o_orderkey, a2.o_custkey, a2.o_orderstatus,
        b2.c_mktsegment
      FROM a2 JOIN b2 ON a2.o_custkey = b2.c_custkey"""))

  /** Grid-density clustering (GeoJoin.gridDensityClusters — the
    * DBSCAN idea at cell granularity, CLIQUE-family): cells with >= 3
    * points are core, 8-adjacent core cells merge via 3 min-label
    * component rounds, points inherit their cell's cluster (sparse
    * cells -> -1 noise; point-level border absorption is omitted by
    * spec — it is order-dependent at ties and cannot be
    * hash-checked). Everything past the one cell-count aggregate
    * runs on the occupied-cell frame.
    */
  private val qGridDbscan = QueryDef(
    "q_grid_density_clusters",
    (s, d) => {
      def coord(tag: String) = pmod(
        conv(substring(md5(concat_ws(":", lit(tag), col("c_custkey"))),
          1, 13), 16, 10).cast("long"), lit(1000000L))
      val pts = Tables.customer(s, d).select(col("c_custkey").as("id"),
        coord("gx").as("x"), coord("gy").as("y"))
      graft.ops.GeoJoin.gridDensityClusters(pts, "id", "x", "y",
        cellSize = 50000L, minPts = 3L, iters = 3)
    },
    Some("""
      WITH pts AS (
        SELECT c_custkey AS id,
          CAST(CAST(('0x' || substr(md5('gx:' || c_custkey), 1, 13))
            AS UBIGINT) % 1000000 AS BIGINT) AS x,
          CAST(CAST(('0x' || substr(md5('gy:' || c_custkey), 1, 13))
            AS UBIGINT) % 1000000 AS BIGINT) AS y
        FROM customer),
      cells AS (
        SELECT id, x // 50000 AS cx, y // 50000 AS cy FROM pts),
      cnt AS (SELECT cx, cy, COUNT(*) AS n FROM cells GROUP BY 1, 2),
      core AS (
        SELECT cx, cy, cx * 1048576 + cy AS cell FROM cnt WHERE n >= 3),
      e AS (
        SELECT a.cell AS src, b.cell AS dst
        FROM core a
        CROSS JOIN (VALUES (-1), (0), (1)) dx(v)
        CROSS JOIN (VALUES (-1), (0), (1)) dy(v)
        JOIN core b ON b.cx = a.cx + dx.v AND b.cy = a.cy + dy.v
        WHERE NOT (dx.v = 0 AND dy.v = 0)),
      c0 AS (SELECT cell AS id, cell AS label FROM core),
      c1 AS (
        SELECT n.id, LEAST(n.label, COALESCE(m.minl, n.label)) AS label
        FROM c0 n LEFT JOIN (
          SELECT e.dst AS id, MIN(l.label) AS minl
          FROM e JOIN c0 l ON e.src = l.id
          GROUP BY 1) m ON m.id = n.id),
      c2 AS (
        SELECT n.id, LEAST(n.label, COALESCE(m.minl, n.label)) AS label
        FROM c1 n LEFT JOIN (
          SELECT e.dst AS id, MIN(l.label) AS minl
          FROM e JOIN c1 l ON e.src = l.id
          GROUP BY 1) m ON m.id = n.id),
      c3 AS (
        SELECT n.id, LEAST(n.label, COALESCE(m.minl, n.label)) AS label
        FROM c2 n LEFT JOIN (
          SELECT e.dst AS id, MIN(l.label) AS minl
          FROM e JOIN c2 l ON e.src = l.id
          GROUP BY 1) m ON m.id = n.id),
      fin AS (SELECT id AS cell, label FROM c3)
      SELECT c.id, c.cx, c.cy,
        CAST(COALESCE(f.label, -1) AS BIGINT) AS cluster
      FROM cells c
      LEFT JOIN core k ON k.cx = c.cx AND k.cy = c.cy
      LEFT JOIN fin f ON f.cell = k.cell"""))

  def all: Seq[QueryDef] = Seq(qGridDbscan, qAsOf, qAsOfForward, qAboveAvg, qPercentile, qApproxPct,
    qUnionAll, qApprox, qRange, qGeoJoin, qSample, qSplit, qSnapshotDiff, qIncrementalJoinView, qAggAdvice, qStreamAdvice, qShuffle, qMixSources, qTemperatureMix, qTokenBudget, qNegatives, qNegativesSharded, qNegativesDraws, qNegativesWeighted, qStratified, qIncrementalAgg, qStreamIncrementalAgg,
    qPacking, qPackingEfficiency, qSalted, qSaltedJoin, qBloomJoin, qBucketedJoin, qTopKAgg)
}
