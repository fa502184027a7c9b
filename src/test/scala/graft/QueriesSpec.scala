package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Smoke + shape tests for the declared query surface on sf0.001.
  * Exact value parity vs DuckDB is checked by tools/check_oracle.py /
  * the driver's gate; here we assert structural invariants.
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Session.builder("test", "4").getOrCreate()
  val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("doc query counts match the registry (no stale counts)") {
    val declared = graft.queries.Registry.all.size
    val withOracle = graft.queries.Registry.all.count(_.oracle.isDefined)
    def read(f: String) = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f)),
      java.nio.charset.StandardCharsets.UTF_8)
    val readme = read("README.md")
    assert(readme.contains(s"($declared queries, $withOracle with"),
      s"README count stale: registry has $declared/$withOracle")
    assert(read("COVERAGE.md").contains(s"($withOracle/$withOracle at sf0.01"),
      s"COVERAGE.md oracle count stale: $withOracle")
    assert(read(".claude/skills/verify/SKILL.md")
        .contains(s"$withOracle/$withOracle as of"),
      s"verify SKILL.md count stale: $withOracle")
  }

  test("declared outputs are atomic-typed (driver harness hashability)") {
    // The driver's oracle harness canonicalizes by sorting every column
    // in pandas; array/map/struct cells are unhashable there and turn a
    // correct query into an `err` row. Library operators may return
    // arrays — the DECLARED projection must serialize them.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    SparkEntry.queries.foreach { case (name, fn) =>
      val bad = fn(spark, sf).schema.fields.filter(f => f.dataType match {
        case _: ArrayType | _: MapType | _: StructType => true
        case _ => false
      })
      assert(bad.isEmpty,
        s"$name declares non-atomic columns ${bad.map(_.name).mkString(",")}")
    }
  }

  test("every oracleSql key has a queries entry") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("all queries run, have stable schemas, and return rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, name)
      assert(df.columns.distinct.length == df.columns.length,
        s"$name has duplicate column names")
      // >0-rows floor: a 0-row hash match against the oracle proves
      // only that both engines return empty (q_geo_neighbor_join went
      // vacuous for two rounds this way). Queries legitimately empty
      // at sf0.001 (q_hour_pivot_min20's HAVING >= 20 at 6k events)
      // must still be non-vacuous at the sf0.01 GATE scale.
      if (fn(spark, sf).count() == 0)
        assert(fn(spark, "/root/testdata/sf0.01").count() > 0,
          s"$name returns 0 rows at BOTH sf0.001 and the sf0.01 gate " +
            "— its green oracle row is vacuous")
    }
  }

  test("central floors match tools/floor_check.py and name real columns") {
    // The floor table lives twice: graft.queries.Floors (enforced by
    // Verify) and tools/floor_check.py (validated against all-SF
    // dumps). They must be IDENTICAL — a floor present in one place
    // only is either unenforced or unvalidated.
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("tools/floor_check.py")),
      java.nio.charset.StandardCharsets.UTF_8)
    val trip = """\("(q_[a-z0-9_]+)", "([a-z0-9_]+)", (\d+)\)""".r
    val py = trip.findAllMatchIn(src)
      .map(m => m.group(1) -> ((m.group(2), m.group(3).toLong))).toMap
    assert(py.nonEmpty && py.size > 100, s"parsed only ${py.size} floors")
    assert(py == graft.queries.Floors.byName,
      "Floors.byName and tools/floor_check.py diverge: " +
        s"py-only=${py.keySet -- graft.queries.Floors.byName.keySet} " +
        s"scala-only=${graft.queries.Floors.byName.keySet -- py.keySet} " +
        "value-diffs=" + py.collect {
          case (k, v) if graft.queries.Floors.byName.get(k).exists(_ != v) =>
            s"$k: py=$v scala=${graft.queries.Floors.byName(k)}"
        }.mkString(","))
    // a typo'd name in Floors.byName is otherwise silently dropped —
    // Registry.all fills floors via orElse keyed on EXISTING query
    // names, so an unknown key would simply never enforce (r14 ADVICE)
    val names = graft.queries.Registry.all.map(_.name).toSet
    assert(graft.queries.Floors.byName.keySet.subsetOf(names),
      "Floors.byName names unknown queries (typo — the floor would " +
        "never enforce): " +
        (graft.queries.Floors.byName.keySet -- names).mkString(","))
    // every declared floor (central + inline) must name a query that
    // exists and a column in its output schema — a typo'd floor would
    // otherwise only surface as a withdrawn dump at Verify time
    SparkEntry.minDistinct.foreach { case (name, (c, floor)) =>
      assert(SparkEntry.queries.contains(name), s"floor on unknown $name")
      assert(floor >= 2, s"$name floor $floor is vacuous itself")
      val cols = SparkEntry.queries(name)(spark, sf).columns
      assert(cols.contains(c),
        s"$name floor column '$c' not in ${cols.mkString(",")}")
    }
  }

  test("every query is floored or explicitly exempt — the sweep is self-enforcing") {
    // r14 verdict #1: the 139-floor sweep was a hand-maintained list;
    // nothing stopped a future pooling query from shipping floorless
    // and decaying the guard back toward the 3/266 state r13 caught.
    // This test makes the partition EXACT: a new query must either
    // declare a minDistinct floor or be consciously added to
    // Floors.exempt under a reviewed category — and a removed/renamed
    // query cannot leave a stale exempt entry behind.
    val all = graft.queries.Registry.all
    val floored = all.filter(_.minDistinct.nonEmpty).map(_.name).toSet
    val names = all.map(_.name).toSet
    val exempt = graft.queries.Floors.exempt
    assert(exempt.subsetOf(names),
      "stale exempt entries for queries that no longer exist: " +
        (exempt -- names).mkString(","))
    assert((exempt & floored).isEmpty,
      "queries both floored and exempt (exempt list must stay tight): " +
        (exempt & floored).mkString(","))
    val uncovered = names -- floored -- exempt
    assert(uncovered.isEmpty,
      "queries with neither a minDistinct floor nor an exempt entry — " +
        "declare a floor or add them to Floors.exempt with a category: " +
        uncovered.mkString(","))
  }

  test("hour pivot has 24 hour columns and totals equal row count") {
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.events(spark, sf)
    val piv = graft.ops.HourPivot.pivot(ev, col("ts"), Seq("event_type"))
    val hourCols = graft.ops.HourPivot.hourCols
    assert(hourCols.forall(piv.columns.contains))
    val total = piv.select(hourCols.map(c => sum(col(c))).reduce(_ + _))
      .first().getLong(0)
    assert(total == ev.count())
  }

  test("q1 aggregates exactly one row per (returnflag, linestatus)") {
    val df = SparkEntry.queries("q1_pricing_summary")(spark, sf)
    val n = df.count()
    assert(n == df.select("l_returnflag", "l_linestatus").distinct().count())
  }
}
