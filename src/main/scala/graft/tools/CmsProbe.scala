package graft.tools

import org.apache.spark.sql.functions._

import graft.Session
import graft.ops.Sketches

/** Scale probe for the Count-Min sketch: N synthetic ~100-token docs
  * (the DedupBench generator shape), sketch build + heavy-hitter
  * estimate pass. The sketch build is the interesting number — 4×
  * the token stream through a partial aggregate that emits ≤ 1024
  * rows per map task.
  *
  * Usage: runMain graft.tools.CmsProbe [numDocsThousands]
  */
object CmsProbe {
  def main(args: Array[String]): Unit = {
    val nK = args.headOption.map(_.toInt).getOrElse(200)
    val n = nK * 1000L
    val spark = Session.get("cms-probe")

    val vocab = typedLit((0 until 5000).map(i => s"w$i"))
    val docs = spark.range(n)
      .select(concat_ws(" ", transform(sequence(lit(0), lit(99)),
        i => element_at(vocab,
          pmod(xxhash64(col("id"), i), lit(5000)).cast("int") + 1)))
        .as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count()
    val items = docs.select(explode(
      graft.text.TextFunctions.tokens(col("text"))).as("key"))

    val t0 = System.nanoTime()
    val sketchRows = Sketches.cmsSketch(items, "key", d = 4).count()
    val buildSec = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val top = Sketches.cmsHeavyHitters(items, "key", d = 4, k = 20).collect()
    val hhSec = (System.nanoTime() - t1) / 1e9

    // HLL rides the same token stream: registers + estimate in one pass
    val t2 = System.nanoTime()
    val est = Sketches.hllEstimate(Sketches.hllRegisters(items, "key"))
      .collect()(0).getAs[Double]("hll_raw_estimate")
    val hllSec = (System.nanoTime() - t2) / 1e9

    println(f"""{"workload":"cms","docs":$n,"tokens":${n * 100},"sketch_rows":$sketchRows,"build_sec":$buildSec%.2f,"heavy_hitters_sec":$hhSec%.2f,"top_estimate":${top.head.getLong(1)},"hll_sec":$hllSec%.2f,"hll_estimate":$est%.0f}""")
    spark.stop()
  }
}
