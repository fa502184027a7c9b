package graft.tools

import org.apache.spark.sql.functions._

import graft.Session
import graft.text.NgramLm

/** Scale probe for the bigram-LM fluency scorer beyond the sf tables:
  * N synthetic ~100-token docs (the BpeProbe generator shape), a
  * trusted slice of 10% trains the model, the full corpus is scored.
  * The interesting numbers: model cardinality (bigram vocabulary must
  * stay broadcast-cheap), train wall (two token aggregates), score
  * wall (map-side explode + 2 broadcast joins + per-doc agg).
  *
  * Usage: runMain graft.tools.LmProbe [numDocsThousands]
  */
object LmProbe {
  def main(args: Array[String]): Unit = {
    val nK = args.headOption.map(_.toInt).getOrElse(200)
    val n = nK * 1000L
    val spark = Session.get("lm-probe")

    val vocab = typedLit((0 until 5000).map(i => s"w$i"))
    val docs = spark.range(n)
      .select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(99)),
          i => element_at(vocab,
            pmod(xxhash64(col("id"), i), lit(5000)).cast("int") + 1)))
          .as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = docs.count()
    System.err.println(s"[lm-probe] generated $total docs")

    val t0 = System.nanoTime()
    val model = NgramLm.train(docs.where(col("doc_id") % 10 === 0), "text")
    val nBigrams = model.bigram.count()
    val trainSec = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val scored = NgramLm.score(docs, "doc_id", "text", model)
    val stats = scored.agg(count(lit(1)), avg(col("lm_score_ppm"))).head()
    val scoreSec = (System.nanoTime() - t1) / 1e9

    println(f"""{"workload":"lm_bigram","docs":$total,"model_bigrams":$nBigrams,"train_sec":$trainSec%.2f,"score_sec":$scoreSec%.2f,"scored":${stats.getLong(0)},"mean_score_ppm":${stats.getDouble(1)}%.1f}""")
    spark.stop()
  }
}
