package graft.tools

import org.apache.spark.sql.functions._

import graft.Session
import graft.text.Dedup

/** Scale probe for duplicate-span removal: N synthetic ~100-token docs
  * where a configurable fraction carries one of 50 distinct 16-token
  * boilerplate spans spliced at a deterministic offset — license
  * headers / navigation chrome in miniature. Measures the full
  * dupSpanRemoval pipeline (window hashing, dup discovery, interval
  * merge, map-side cut) and reports removal totals so recall is
  * visible alongside wall time.
  *
  * Usage: runMain graft.tools.DupSpanProbe [numDocsThousands] [pctWithSpan]
  */
object DupSpanProbe {
  def main(args: Array[String]): Unit = {
    val nK = args.headOption.map(_.toInt).getOrElse(200)
    val pct = args.lift(1).map(_.toInt).getOrElse(20)
    val n = nK * 1000L
    val spark = Session.get("dupspan-probe")

    val vocab = typedLit((0 until 20000).map(i => s"w$i"))
    // 50 shared spans, 16 tokens each, over a reserved vocab range
    val spans = typedLit((0 until 50).map(s =>
      (0 until 16).map(j => s"b${s}_$j").mkString(" ")))
    val body = concat_ws(" ", transform(sequence(lit(0), lit(99)),
      i => element_at(vocab,
        pmod(xxhash64(col("id"), i), lit(20000)).cast("int") + 1)))
    val withSpan = col("id") % 100 < pct
    val docs = spark.range(n)
      .select(col("id").as("doc_id"),
        when(withSpan,
          concat_ws(" ",
            element_at(spans, pmod(col("id"), lit(50)).cast("int") + 1), body))
          .otherwise(body).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count()

    val t0 = System.nanoTime()
    val out = Dedup.dupSpanRemoval(docs, "doc_id", "text", k = 8)
    val agg = out.agg(
      count(lit(1)).as("docs"),
      sum(col("n_removed")).as("removed"),
      sum(when(col("n_removed") > 0, 1L).otherwise(0L)).as("docs_cut"))
      .collect()(0)
    val wallSec = (System.nanoTime() - t0) / 1e9

    // every doc with a span shares it with ~n·pct/100/50 others → all
    // span tokens (16) plus the splice-boundary windows must go
    println(f"""{"workload":"dupspan","docs":$n,"pct_with_span":$pct,"docs_cut":${agg.getLong(2)},"tokens_removed":${agg.getLong(1)},"wall_sec":$wallSec%.2f}""")
    spark.stop()
  }
}
