package graft.tools

import org.apache.spark.sql.functions._

import graft.Session
import graft.text.TextFunctions

/** Scale probe for the iterative BPE trainer beyond the sf tables:
  * N synthetic ~100-token documents (DedupBench's deterministic
  * generator shape), `rounds` merge rounds, then the encode pass.
  * Reports wall per phase — the per-round cost is one map-side pair
  * explode + a vocabulary-sized shuffle + a map-side rewrite, so the
  * trainer should scale like rounds × one corpus scan.
  *
  * Usage: runMain graft.tools.BpeProbe [numDocsThousands] [rounds]
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val nK = args.headOption.map(_.toInt).getOrElse(200)
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val n = nK * 1000L
    val spark = Session.get("bpe-probe")

    val vocab = typedLit((0 until 5000).map(i => s"w$i"))
    val docs = spark.range(n)
      .select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(99)),
          i => element_at(vocab,
            pmod(xxhash64(col("id"), i), lit(5000)).cast("int") + 1)))
          .as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = docs.count()
    System.err.println(s"[bpe-probe] generated $total docs")

    val t0 = System.nanoTime()
    val merges = TextFunctions.bpeTrainMerges(docs, "text", rounds)
      .collect().map(r => (r.getString(1), r.getString(2)))
    val trainSec = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val nSyms = TextFunctions.bpeEncodeSymbols(docs, "text", merges.toSeq)
      .count()
    val encodeSec = (System.nanoTime() - t1) / 1e9

    println(f"""{"workload":"bpe_train","docs":$total,"rounds":$rounds,"train_sec":$trainSec%.2f,"encode_sec":$encodeSec%.2f,"merges":"${merges.map(p => p._1 + "+" + p._2).mkString(",")}","encoded_symbols":$nSyms}""")
    spark.stop()
  }
}
