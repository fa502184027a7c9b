package graft.tools

import org.apache.spark.sql.functions._

import graft.Session
import graft.graph.Graph
import graft.sources.Tables

/** Quiet-box settling run for q_copurchase_triangles (the round-8
  * +22% question: variance vs genuine stage growth): N full-query
  * runs for the spread, then a stage breakdown — edge build,
  * orientation, raw wedge count, closure semi-join — to name where
  * the time actually goes.
  *
  * Usage: runMain graft.tools.TriangleProfile [sfDir] [runs]
  */
object TriangleProfile {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = Session.builder("tri-profile", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $name%-28s $s%8.2f s")
      (s, r)
    }

    // full-query spread, A/B per run: broadcast rung vs shuffle rung
    // (maxBroadcastEdges = 0 forces shuffle) — same JVM, same warmth
    def fullRun(name: String, maxB: Long): Double = {
      val li = Tables.lineitem(spark, sf)
      val edges = Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
      val nodes = li.select(col("l_partkey")).distinct()
      time(name) {
        Graph.triangleCounts(edges, nodes, "l_partkey", maxB)
          .write.format("noop").mode("overwrite").save()
      }._1
    }
    val spread = (1 to runs).map(i => fullRun(s"full-broadcast run $i", 8000000L))
    val spreadSh = (1 to runs).map(i => fullRun(s"full-shuffle run $i", 0L))

    // stage breakdown (each stage materialized once, downstream reuses
    // the checkpoint exactly as the operator does)
    val li = Tables.lineitem(spark, sf)
    val (edgeSec, edges) = time("edges-build+checkpoint") {
      Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
        .localCheckpoint(true)
    }
    val nEdges = edges.count()
    val deg = edges.groupBy(col("src").as("n")).agg(count(lit(1)).as("d"))
    val (orientSec, oriented) = time("orient+checkpoint") {
      edges
        .join(deg.select(col("n").as("src"), col("d").as("ds")), Seq("src"))
        .join(deg.select(col("n").as("dst"), col("d").as("dd")), Seq("dst"))
        .where((col("ds") < col("dd")) ||
          (col("ds") === col("dd") && col("src") < col("dst")))
        .select(col("src").as("lo"), col("dst").as("hi"))
        .localCheckpoint(true)
    }
    val nOriented = oriented.count()
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.hi") === col("e2.lo"))
      .select(col("e1.lo").as("a"), col("e1.hi").as("b"),
        col("e2.hi").as("c"))
    val (wedgeSec, nWedges) = time("wedge-join count")(wedges.count())
    val (closeSec, nTri) = time("closure semi-join count") {
      wedges.join(oriented.as("e3"),
        col("a") === col("e3.lo") && col("c") === col("e3.hi"), "left_semi")
        .count()
    }

    val spreadStr = spread.map(s => f"$s%.2f").mkString("[", ",", "]")
    val spreadShStr = spreadSh.map(s => f"$s%.2f").mkString("[", ",", "]")
    // per-round regression yardstick (round-12 verdict #5): the wedge
    // join's single-run bench swings ±33% on this box, so the recorded
    // number is the N-run MEDIAN — compare medians across rounds, not
    // single draws
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; s(s.length / 2)
    }
    println(f"""{"workload":"triangles","sf":"$sf","broadcast_runs_sec":$spreadStr,"broadcast_median_sec":${median(spread)}%.2f,"shuffle_runs_sec":$spreadShStr,"shuffle_median_sec":${median(spreadSh)}%.2f,"edges":$nEdges,"oriented":$nOriented,"wedges":$nWedges,"triangles_x3":$nTri,"edge_sec":$edgeSec%.2f,"orient_sec":$orientSec%.2f,"wedge_sec":$wedgeSec%.2f,"closure_sec":$closeSec%.2f}""")
    spark.stop()
  }
}
