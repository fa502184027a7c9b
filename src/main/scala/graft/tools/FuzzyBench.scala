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
  * Usage: runMain graft.tools.FuzzyBench [entitiesThousandsPerSide]
  */
object FuzzyBench {
  def main(args: Array[String]): Unit = {
    val nK = args.headOption.map(_.toInt).getOrElse(100)
    val n = nK * 1000L
    val spark = Session.get("fuzzy-bench")

    // 12 tokens of 12 chars from a 20k-token vocabulary: entity strings
    // ~155 chars, feature space rich enough that prefix postings stay
    // short (the sf catalogs' 899-feature wall is the hard case, not
    // this one — both belong in the record).
    val vocab = typedLit((0 until 20000).map(i => f"tok$i%05d~${i * 2654435761L}%011d".take(12)))
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
      threshold = 0.8)
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
