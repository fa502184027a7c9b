package graft.tools

import org.apache.spark.sql.functions._

import graft.Session
import graft.graph.Graph
import graft.sources.Tables

/** r15 optimization probe (guide §3.1 — pick the strategy
  * deliberately): the triangle closure semi-join sort-merge-sorts 49M
  * wedge rows (StageBreakdown: 79 s task CPU, 478 MB shuffle read in
  * one stage). A shuffled-hash join builds on the 1.2M-row oriented
  * edge side and streams wedges UNSORTED. Same output (semi-join,
  * integer counts). A/B interleaved, same JVM.
  */
object TriangleJoinProbe {
  def main(args: Array[String]): Unit = {
    val spark = Session.builder("tri-join").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val li = Tables.lineitem(spark, sf)

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def build() = {
      val edges = Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
      val nodes = li.select(col("l_partkey")).distinct()
      (edges, nodes)
    }

    def triVariant(hinted: Boolean): org.apache.spark.sql.DataFrame = {
      val (edges, nodes) = build()
      val deg = edges.groupBy(col("src").as("n")).agg(count(lit(1)).as("d"))
      val withDeg = edges
        .join(deg.select(col("n").as("src"), col("d").as("ds")), Seq("src"))
        .join(deg.select(col("n").as("dst"), col("d").as("dd")), Seq("dst"))
      val oriented = withDeg.where(
          (col("ds") < col("dd")) ||
          (col("ds") === col("dd") && col("src") < col("dst")))
        .select(col("src").as("lo"), col("dst").as("hi"))
        .localCheckpoint(true)
      val edgeSide = if (hinted) oriented.hint("shuffle_hash") else oriented
      val tri = oriented.as("e1")
        .join(edgeSide.as("e2"), col("e1.hi") === col("e2.lo"))
        .select(col("e1.lo").as("a"), col("e1.hi").as("b"), col("e2.hi").as("c"))
        .join(edgeSide.as("e3"),
          col("a") === col("e3.lo") && col("c") === col("e3.hi"), "left_semi")
      val corner = tri.select(explode(array(col("a"), col("b"), col("c"))).as("id"))
        .groupBy(col("id")).agg(count(lit(1)).as("n_triangles"))
      nodes.select(col("l_partkey").as("id")).distinct()
        .join(corner, Seq("id"), "left")
        .select(col("id").as("l_partkey"),
          coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
    }

    noop(triVariant(false)); noop(triVariant(true)) // warm
    val t = Array.fill(2)(scala.collection.mutable.ArrayBuffer.empty[Double])
    for (_ <- 1 to 3; h <- Seq(0, 1)) {
      val t0 = System.nanoTime(); noop(triVariant(h == 1))
      t(h) += (System.nanoTime() - t0) / 1e9
    }
    Seq("SMJ (current)", "SHUFFLE_HASH hint").zipWithIndex.foreach { case (nm, i) =>
      val s = t(i).sorted
      println(f"[trijoin] $nm%-20s med=${s(s.length / 2)}%5.2f " +
        s.map(x => f"$x%.2f").mkString("[", " ", "]"))
    }
    val a = triVariant(false).orderBy("l_partkey").collect()
    val b = triVariant(true).orderBy("l_partkey").collect()
    println(s"[trijoin] identity: ${a.sameElements(b)} (${a.length} rows)")
    spark.stop()
  }
}
