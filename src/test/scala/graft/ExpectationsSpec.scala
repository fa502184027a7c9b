package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Expectations._

class ExpectationsSpec extends AnyFunSuite {
  lazy val spark = Session.builder("expectations-test", "4").getOrCreate()
  import spark.implicits._

  test("audit: every check type counts its own violations exactly") {
    // id 4 duplicated; id 3 has NULL key + out-of-range value; id 5
    // dangles against the dim; id 2 carries a rogue enum value
    val fact = Seq[(java.lang.Long, java.lang.Long, Double, String)](
      (1L, 10L, 5.0, "A"),
      (2L, 10L, 200.0, "X"),   // range high + enum rogue
      (3L, null, -1.0, "B"),   // null key + range low
      (4L, 20L, 50.0, "A"),
      (4L, 20L, 50.0, "B"),    // duplicate id
      (5L, 99L, 60.0, "B"))    // dangling fk
      .toDF("id", "k", "v", "s")
    val dim = Seq(10L, 20L).toDF("dk")
    val out = audit(fact, Seq(
      NotNull("k"),
      InRange("v", lit(0.0), lit(100.0)),
      InSet("s", Seq("A", "B")),
      Unique("id"),
      ForeignKey("k", dim, "dk", "dim")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    assert(out("not_null(k)") == (1L, 6L, 0))
    assert(out("in_range(v)") == (2L, 6L, 0))  // 200 high, -1 low
    assert(out("in_set(s)") == (1L, 6L, 0))
    assert(out("unique(id)") == (1L, 6L, 0))   // one extra row of id 4
    // NULL k is NOT an fk violation (NotNull's business): only id 5
    assert(out("fk(k->dim.dk)") == (1L, 6L, 0))
  }

  test("audit: clean table passes everything; empty table is all-zero") {
    val fact = Seq((1L, 10L), (2L, 20L)).toDF("id", "k")
    val dim = Seq(10L, 20L).toDF("dk")
    val checks = Seq(NotNull("k"), Unique("id"),
      ForeignKey("k", dim, "dk", "dim"))
    val clean = audit(fact, checks).collect()
    assert(clean.forall(r => r.getLong(1) == 0L && r.getInt(3) == 1))
    val empty = audit(fact.where(lit(false)), checks).collect()
    assert(empty.length == 3)
    assert(empty.forall(r =>
      r.getLong(1) == 0L && r.getLong(2) == 0L && r.getInt(3) == 1))
  }

  test("audit plan: fk joins broadcast, one scan of the fact") {
    val p = SparkEntry.queries("q_dq_audit")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the orders fact is scanned exactly once — all five checks fused
    assert("Scan parquet .*orders".r.findAllIn(p).size <= 1, p)
  }
}
