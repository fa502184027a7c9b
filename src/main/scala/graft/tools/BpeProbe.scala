package graft.tools

import org.apache.spark.sql.functions._

import graft.Session
import graft.text.TextFunctions

/** Scale probe for the iterative BPE trainer beyond the sf tables:
  * N synthetic ~100-token documents (DedupBench's deterministic
  * generator shape), trained to `rounds` merges, plus a 1-round run to
  * split INIT cost (the one corpus-sized word-collapse + pair count)
  * from the MARGINAL per-round cost of the merge loop.
  *
  * The round-7 verdict's acceptance bar: at >=100 rounds the marginal
  * per-round cost must be decoupled from corpus size. With the
  * word-count collapse the merge loop only ever touches the distinct-
  * word table (identical across doc counts for this generator's fixed
  * 5000-word vocabulary), so `marginal_per_round_sec` should be ~flat
  * as docs scale 10x while `round1_sec` (init) grows with the corpus.
  *
  * `corpus = flat` swaps in the pathological ALL-TIED corpus (every
  * distinct 2-letter word over a 26-letter alphabet, each once: 676
  * words, every pair count = 1): round-8's no-shared-symbol batch
  * acceptance degraded to 1 merge/driver-round-trip here (the
  * lexicographic tie neighbor always shares its left symbol); the
  * round-9 creation-only rule + current-count replay accepts full
  * batches. Compare `flat` at batchSize 32 vs 1 — the ratio IS the
  * round-trip collapse.
  *
  * Usage: runMain graft.tools.BpeProbe [numDocsThousands] [rounds] [batchSize] [corpus]
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val nK = args.headOption.map(_.toInt).getOrElse(200)
    val rounds = args.lift(1).map(_.toInt).getOrElse(100)
    val batchSize = args.lift(2).map(_.toInt).getOrElse(32)
    val corpusKind = args.lift(3).getOrElse("zipf")
    val n = if (corpusKind == "flat") 676L else nK * 1000L
    val spark = Session.get("bpe-probe")

    val vocab = typedLit((0 until 5000).map(i => s"w$i"))
    val docs = (if (corpusKind == "wide")
      // 50k distinct 8-char words over a 16-letter alphabet — enough
      // distinct substrings that a 30k-merge PRODUCTION train does not
      // saturate (the 5000-word zipf vocab saturates at ~5.1k merges)
      spark.range(n)
        .select(col("id").as("doc_id"),
          concat_ws(" ", transform(sequence(lit(0), lit(99)),
            i => translate(
              substring(md5(pmod(xxhash64(col("id"), i), lit(50000L))
                .cast("string")), 1, 8),
              "0123456789abcdef", "abcdefghijklmnop"))).as("text"))
    else if (corpusKind == "flat")
      spark.range(676)
        .select(col("id").as("doc_id"),
          concat(
            element_at(typedLit(('a' to 'z').map(_.toString)),
              (col("id") / 26).cast("int") + 1),
            element_at(typedLit(('a' to 'z').map(_.toString)),
              pmod(col("id"), lit(26)).cast("int") + 1)).as("text"))
    else
      spark.range(n)
        .select(col("id").as("doc_id"),
          concat_ws(" ", transform(sequence(lit(0), lit(99)),
            i => element_at(vocab,
              pmod(xxhash64(col("id"), i), lit(5000)).cast("int") + 1)))
            .as("text")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = docs.count()
    System.err.println(s"[bpe-probe] generated $total docs")

    // 1 round = init (corpus-sized) + one batch round-trip
    val t0 = System.nanoTime()
    TextFunctions.bpeTrainMerges(docs, "text", rounds = 1, batchSize).count()
    val round1Sec = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val merges = TextFunctions.bpeTrainMerges(docs, "text", rounds, batchSize)
      .orderBy("round")
      .collect().map(r => (r.getString(1), r.getString(2)))
    val trainSec = (System.nanoTime() - t1) / 1e9
    // divide by merges LEARNED — a saturated train returns fewer than
    // requested and the requested count would understate the marginal
    val marginal = (trainSec - round1Sec) / math.max(merges.length - 1, 1)

    // encode with the FULL learned merge table: the native BpeEncode
    // Catalyst expression (foldable merge-table literals → O(1) plan
    // size in merge count; per-row cost is O(applied_merges x len) via
    // the pair->rank hash, independent of table size)
    val t2 = System.nanoTime()
    val nSyms = TextFunctions.bpeEncodeSymbols(docs, "text", merges.toSeq)
      .count()
    val encodeSec = (System.nanoTime() - t2) / 1e9

    // table-size independence: pad the learned table with 9x inert
    // merges (left symbols that cannot occur in any token) — applied
    // work is unchanged, so encode time must stay flat where a
    // walk-the-table encoder grows ~10x
    val padded = merges.toSeq ++
      (0 until 9 * merges.length).map(i => (s"pad$i", "x"))
    val t3 = System.nanoTime()
    val nSymsPad = TextFunctions.bpeEncodeSymbols(docs, "text", padded)
      .count()
    val encodePadSec = (System.nanoTime() - t3) / 1e9
    require(nSymsPad == nSyms,
      s"inert table padding changed the encoding: $nSyms vs $nSymsPad")

    println(f"""{"workload":"bpe_train","docs":$total,"rounds":$rounds,"batch_size":$batchSize,"round1_sec":$round1Sec%.2f,"train_sec":$trainSec%.2f,"marginal_per_round_sec":$marginal%.4f,"encode_all_sec":$encodeSec%.2f,"encode_10x_table_sec":$encodePadSec%.2f,"merges_learned":${merges.length},"encoded_symbols":$nSyms}""")
    spark.stop()
  }
}
