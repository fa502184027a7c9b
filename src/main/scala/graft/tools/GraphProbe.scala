package graft.tools

import org.apache.spark.sql.functions._

import graft.Session
import graft.graph.Graph

/** Scale probe for the graph family: a synthetic basket graph (N
  * baskets × 4 items drawn zipf-ishly from M items via hash mixing —
  * hubs emerge naturally) through coOccurrenceEdges, then 3 PageRank
  * iterations and triangle counting. Reports edge count and per-phase
  * wall, so the per-iteration shuffle cost and the wedge-join cost are
  * visible separately.
  *
  * Usage: runMain graft.tools.GraphProbe [numBasketsThousands] [numItemsThousands]
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val nK = args.headOption.map(_.toInt).getOrElse(1000)
    val mK = args.lift(1).map(_.toInt).getOrElse(50)
    val n = nK * 1000L
    val m = mK * 1000L
    val spark = Session.get("graph-probe")

    // item draw: square a uniform hash so low ids are hot (hub skew)
    val baskets = spark.range(n)
      .select(col("id").as("g"),
        explode(sequence(lit(0), lit(3))).as("j"))
      .select(col("g"),
        (pmod(xxhash64(col("g"), col("j")), lit(m)) *
          pmod(xxhash64(col("g"), col("j"), lit(7)), lit(m)) / lit(m))
          .cast("long").as("item"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    baskets.count()

    val t0 = System.nanoTime()
    val edges = Graph.coOccurrenceEdges(baskets, "g", "item")
      .localCheckpoint(true)
    val nEdges = edges.count()
    val edgeSec = (System.nanoTime() - t0) / 1e9

    val nodes = baskets.select(col("item").as("id")).distinct()
      .localCheckpoint(true)
    val nNodes = nodes.count()

    val t1 = System.nanoTime()
    val topRank = Graph.pageRank(edges, nodes, "id", iters = 3)
      .orderBy(col("rank").desc).limit(5).collect()
    val prSec = (System.nanoTime() - t1) / 1e9

    val t2 = System.nanoTime()
    val nTri = Graph.triangleCounts(edges, nodes, "id")
      .agg(sum(col("n_triangles"))).collect()(0).getLong(0) / 3
    val triSec = (System.nanoTime() - t2) / 1e9

    println(f"""{"workload":"graph","baskets":$n,"nodes":$nNodes,"edges":$nEdges,"edge_sec":$edgeSec%.2f,"pagerank3_sec":$prSec%.2f,"triangle_sec":$triSec%.2f,"top_rank":${topRank.head.getLong(1)},"triangles":$nTri}""")
    spark.stop()
  }
}
