package graft.tools

import org.apache.spark.sql.functions._

import graft.Session
import graft.text.Dedup

/** Scale probe for the near-dup family beyond the sf tables (5k docs):
  * generates N synthetic ~100-token documents with PLANTED near-dups
  * (every doc_id ≡ 1 (mod 100) is its predecessor plus one appended
  * token → Jaccard ≈ 0.97), runs MinHash-LSH end-to-end, and reports
  * wall time + recall of the planted pairs. Deterministic generation
  * (xxhash64-driven word choice), so runs are comparable.
  *
  * Usage: runMain graft.tools.DedupBench [numDocsThousands]
  */
object DedupBench {
  def main(args: Array[String]): Unit = {
    val nK = args.headOption.map(_.toInt).getOrElse(200)
    val n = nK * 1000L
    val spark = Session.get("dedup-bench")
    import spark.implicits._

    val vocab = typedLit((0 until 5000).map(i => s"w$i"))
    // base text: 100 tokens chosen by hash of (base_id, position) —
    // planted dups share base_id = id - 1 and append one extra token
    val docs = spark.range(n)
      .select(col("id").as("doc_id"),
        when(pmod(col("id"), lit(100)) === 1, col("id") - 1)
          .otherwise(col("id")).as("base"),
        (pmod(col("id"), lit(100)) === 1).as("planted"))
      .select(col("doc_id"), col("planted"),
        concat_ws(" ",
          concat_ws(" ", transform(sequence(lit(0), lit(99)),
            i => element_at(vocab,
              pmod(xxhash64(col("base"), i), lit(5000)).cast("int") + 1))),
          when(col("planted"), lit("extraword")).otherwise(lit(""))).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = docs.count() // materialize generation outside the timing
    System.err.println(s"[dedup-bench] generated $total docs")

    val t0 = System.nanoTime()
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
      threshold = 0.5, numHashes = 32, bands = 16,
      estThresholdOpt = Some(0.35))
      .select(col("id_a"), col("id_b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val found = pairs.count()
    val dt = (System.nanoTime() - t0) / 1e9

    val planted = docs.where(col("planted"))
      .select((col("doc_id") - 1).as("id_a"), col("doc_id").as("id_b"))
    val nPlanted = planted.count()
    val recalled = planted.join(pairs, Seq("id_a", "id_b"), "left_semi").count()
    println(f"""{"workload":"minhash_neardup","docs":$total,"seconds":$dt%.2f,"pairs_found":$found,"planted":$nPlanted,"planted_recalled":$recalled}""")

    // full corpus-dedup composite: exact stage + near-dup + components.
    // every planted doc must be dropped (its predecessor is kept).
    val t1 = System.nanoTime()
    val kept = Dedup.dedupCorpus(docs, "doc_id", "text", threshold = 0.5)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nKept = kept.count()
    val dt1 = (System.nanoTime() - t1) / 1e9
    val plantedKept = kept.join(docs.where(col("planted")), Seq("doc_id"),
      "left_semi").count()
    println(f"""{"workload":"corpus_dedup","docs":$total,"seconds":$dt1%.2f,"kept":$nKept,"planted_still_kept":$plantedKept}""")

    // repetition + contamination: map-side gram shapes, should scale
    // near-linearly (no pair joins)
    val t2 = System.nanoTime()
    val nRep = graft.text.TextFunctions
      .repetitionSignals(docs, "doc_id", "text")
      .where(col("repetitive")).count()
    val dt2 = (System.nanoTime() - t2) / 1e9
    println(f"""{"workload":"repetition_signals","docs":$total,"seconds":$dt2%.2f,"flagged":$nRep}""")

    val t3 = System.nanoTime()
    val nCont = Dedup.contaminationFlags(
      docs.where(pmod(col("doc_id"), lit(97)) =!= 0),
      docs.where(pmod(col("doc_id"), lit(97)) === 0),
      "doc_id", "text").where(col("contaminated")).count()
    val dt3 = (System.nanoTime() - t3) / 1e9
    println(f"""{"workload":"contamination","docs":$total,"seconds":$dt3%.2f,"flagged":$nCont}""")

    // SimHash chunk-width scaling: candidate volume is Σ over
    // (chunk, value) buckets of c·(c−1)/2 — a cheap aggregate over the
    // signature frame, measurable even where actually RUNNING the pair
    // join would be quadratic suicide. Configs: 16×4-bit (the pigeonhole
    // h≤15 exhibit), 8×8 (h≤7 guarantee, the library default), 4×16
    // (h≤3 — the corpus-scale point; planted dups sit at h≈0-2). The
    // verified pipeline runs wherever volume fits the budget, reporting
    // wall + planted recall.
    val sigs = Dedup.simhashShingleSignatures(docs, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sigs.count()
    // Where do the PLANTED pairs actually sit in Hamming space? The
    // chunk-width recall story depends on it: pigeonhole covers h <=
    // chunks-1 diff bits; pairs above that are found probabilistically.
    // Cheap: two id-equijoins against the signature frame, no pair join.
    val ham = planted
      .join(sigs.withColumnsRenamed(Map("id" -> "id_a", "sh" -> "sh_a")), Seq("id_a"))
      .join(sigs.withColumnsRenamed(Map("id" -> "id_b", "sh" -> "sh_b")), Seq("id_b"))
      .select(bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("h"))
      .groupBy(col("h")).count().orderBy(col("h")).collect()
    println(s"""{"workload":"planted_hamming","docs":$total,"hist":{${
      ham.map(r => s""""${r.get(0)}":${r.getLong(1)}""").mkString(",")}}}""")
    // Candidate volume above ~1e8 means the verify join ships >100 GB of
    // shingle arrays on this box (measured: 16x4 at 20k docs = 2e8
    // candidates stalled for 20+ min) — report volume only past that.
    val runBudget = 1e8
    for (chunks <- Seq(16, 8, 4)) {
      val bits = 64 / chunks
      val mask = (1L << bits) - 1
      val vol = sigs.select(posexplode(transform(
          sequence(lit(0), lit(chunks - 1)),
          b => call_function("shiftright", col("sh"), (b * bits).cast("int"))
            .bitwiseAND(mask))))
        .groupBy(col("pos"), col("col")).count()
        .agg(sum(col("count") * (col("count") - 1)).as("v"))
        .first().getLong(0) / 2
      if (vol <= runBudget) {
        val t = System.nanoTime()
        val sp = Dedup.simhashVerifiedNearDups(docs, "doc_id", "text",
          threshold = 0.5, chunks = chunks)
          .select(col("id_a"), col("id_b"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nPairs = sp.count()
        val dtS = (System.nanoTime() - t) / 1e9
        val rec = planted.join(sp, Seq("id_a", "id_b"), "left_semi").count()
        sp.unpersist()
        println(f"""{"workload":"simhash_verified","docs":$total,"chunks":$chunks,"bits":$bits,"candidates":$vol,"seconds":$dtS%.2f,"pairs_found":$nPairs,"planted":$nPlanted,"planted_recalled":$rec}""")
      } else
        println(f"""{"workload":"simhash_verified","docs":$total,"chunks":$chunks,"bits":$bits,"candidates":$vol,"skipped":"candidate volume over run budget"}""")
    }
    spark.stop()
  }
}
