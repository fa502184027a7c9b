package graft.tools

import org.apache.spark.sql.functions._

import graft.Session
import graft.text.FuzzyJoin

/** Scale probe for the exact fuzzy join beyond the sf catalogs (10k a
  * side): generates two N-entity catalogs with PLANTED fuzzy matches —
  * every right id ≡ 1 (mod 10) is the same-id left entity with one
  * 12-char token replaced (5-gram Jaccard well above 0.8 on ~12-token
  * strings) — runs fuzzyJoinTop1, and reports wall + planted recall.
  * Deterministic generation (xxhash64-driven token choice).
  *
  * Usage: runMain graft.tools.FuzzyBench [entitiesThousandsPerSide] [q]
  *
  * q defaults to 7 here (not the operator's 5): at probe scales the
  * 16-char hex alphabet saturates the 5-gram space (~280k distinct
  * grams at 100k entities/side — FuzzyScaleProbe), and prefix-join
  * candidates grow as N²/|distinct grams| once postings stop being
  * rare: 92M candidate occurrences at 100k entities (q=5) vs 949k
  * (q=7). Feature WIDTH is the candidate lever — same lesson as the
  * sf catalogs' 3-gram→5-gram move, one alphabet further out.
  */
object FuzzyBench {
  def main(args: Array[String]): Unit = {
    val nK = args.headOption.map(_.toInt).getOrElse(100)
    val n = nK * 1000L
    val q = args.drop(1).headOption.map(_.toInt).getOrElse(7)
    val spark = Session.get("fuzzy-bench")

    // 12 tokens of 12 chars from a 20k-token vocabulary: entity strings
    // ~155 chars, feature space rich enough that prefix postings stay
    // short (the sf catalogs' 899-feature wall is the hard case, not
    // this one — both belong in the record). Tokens are hex digits of a
    // mixed hash — an earlier "tokNNNNN~…" format gave every token the
    // same prefix and shape, collapsing gram diversity and exploding
    // prefix postings into a >60 GB spill at 500k entities; a probe
    // that exists to measure the rich-feature regime must actually
    // generate one (the dense-feature regime is the sf catalogs' job).
    val vocab = typedLit((0 until 20000).map { i =>
      java.lang.Long.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(s"v$i").toLong
          * 2654435761L | (1L << 62)).take(12)
    })
    def entity(base: org.apache.spark.sql.Column, mutate: org.apache.spark.sql.Column) =
      concat_ws(" ", transform(sequence(lit(0), lit(11)),
        i => when(mutate && i === 0, lit("mutatedtoken"))
          .otherwise(element_at(vocab,
            pmod(xxhash64(base, i), lit(20000)).cast("int") + 1))))

    val left = spark.range(n).select(col("id"),
      entity(col("id"), lit(false)).as("entity"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // planted: right id ≡ 1 (mod 10) mirrors left id with one token
    // swapped; everything else is a disjoint base (id + n) — no match.
    val right = spark.range(n).select(col("id"),
      when(pmod(col("id"), lit(10)) === 1, entity(col("id"), lit(true)))
        .otherwise(entity(col("id") + n, lit(false))).as("entity"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    System.err.println(s"[fuzzy-bench] left=${left.count()} right=${right.count()}")

    val t0 = System.nanoTime()
    val matches = FuzzyJoin.fuzzyJoinTop1(left, right, "id", "entity",
      threshold = 0.8, q = q)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val found = matches.count()
    val dt = (System.nanoTime() - t0) / 1e9

    val planted = right.where(pmod(col("id"), lit(10)) === 1)
      .select(col("id").as("left_id"), col("id").as("right_id"))
    val nPlanted = planted.count()
    val recalled = planted.join(matches, Seq("left_id", "right_id"), "left_semi").count()
    println(f"""{"workload":"fuzzy_join_top1","entities_per_side":$n,"seconds":$dt%.2f,"matches":$found,"planted":$nPlanted,"planted_recalled":$recalled}""")
    spark.stop()
  }
}
