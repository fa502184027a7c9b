package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale corpora. Four families:
  *
  *  - EXACT: content-hash groupBy. One shuffle on a 128-bit digest;
  *    at 100 TB the digest (16 B) shuffles, never the document text.
  *  - MINHASH + LSH: shingles → k minhash values → b bands of r rows
  *    (k = b·r); documents sharing any band bucket become candidate
  *    pairs, then true Jaccard verifies. The self-join happens per
  *    band BUCKET (tiny groups), never all-pairs — the only quadratic
  *    term is within-bucket, bounded by collision rate.
  *  - SIMHASH: 64-bit sign-aggregated token hash; near-dups have small
  *    Hamming distance. Banding on 4×16-bit chunks finds candidates
  *    with ≤3-chunk disagreement (any exact-matching chunk bucket).
  *  - N-GRAM JACCARD: exact pairwise Jaccard via shingle inverted
  *    index (explode + equi-join + group count) — the verification
  *    primitive, also usable standalone on bounded candidate sets.
  *
  * Everything is built from codegen'd builtins (xxhash64, HOFs, window
  * functions) — no UDFs, no driver-side loops. The reference engine has
  * no dedup surface; this family comes from the north-star extension
  * (SURVEY §7 phase 4/5).
  */
object Dedup {

  /** Exact-duplicate keeper set: first doc_id per identical content.
    * md5 (not xxhash64) so external engines reproduce the key.
    */
  def exactKeepers(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col("__h")).orderBy(col(idCol))
    df.select(col(idCol), md5(col(textCol)).as("__h"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col(idCol), col("__h").as("content_md5"))
  }

  /** Group-count of identical texts (dup statistics). */
  def exactDupStats(df: DataFrame, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_md5"))
      .agg(count(lit(1)).as("n_copies"))
      .where(col("n_copies") > 1)

  /** k minhash values over the shingle set: sig[i] = min over shingles
    * of xxhash64(i, shingle). One aggregate HOF per hash — stays in
    * whole-stage codegen; cost is k × |shingles| hash calls, map-side
    * only.
    */
  def minhashSignature(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => aggregate(shingles, lit(Long.MaxValue),
        (acc, s) => least(acc, xxhash64(i, s))))

  /** LSH candidate pairs from minhash signatures: b bands of r values;
    * band hash = xxhash64 of the band slice; explode → group by
    * (band, hash) bucket → within-bucket pairs via self-join.
    */
  def lshCandidatePairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 32, bands: Int = 8): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val r = numHashes / bands
    val sig = df.select(col(idCol).as("id"),
      minhashSignature(TextFunctions.wordShingles(col(textCol), shingleN),
        numHashes).as("sig"))
      .where(size(col("sig")) > 0)

    val banded = sig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * r + lit(1), lit(r))))))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_hash"))

    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b,
        col("a.band") === col("b.band") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** MinHash-LSH near-dup pairs with exact-Jaccard verification:
    * candidates from banding, then true shingle Jaccard ≥ threshold.
    * The verify join ships only the candidate ids + shingle arrays.
    */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleN: Int = 3, numHashes: Int = 32,
      bands: Int = 8): DataFrame = {
    val cands = lshCandidatePairs(df, idCol, textCol, shingleN, numHashes, bands)
    val sh = df.select(col(idCol).as("id"),
      TextFunctions.wordShingles(col(textCol), shingleN).as("sh"))
    cands
      .join(sh.withColumnsRenamed(Map("id" -> "id_a", "sh" -> "sh_a")), Seq("id_a"))
      .join(sh.withColumnsRenamed(Map("id" -> "id_b", "sh" -> "sh_b")), Seq("id_b"))
      .withColumn("common", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("common") / (size(col("sh_a")) + size(col("sh_b")) - col("common")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 64-bit SimHash over tokens, built entirely from HOFs: per-token
    * xxhash64 → per-bit ±1 votes aggregated into a 64-int vector →
    * sign → packed long. Codegen'd; no UDF.
    */
  def simhash(tokensCol: Column): Column = {
    val votes = aggregate(
      tokensCol,
      array_repeat(lit(0), 64),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc, sequence(lit(0), lit(63)),
          (a, b) => a + when(
            call_function("shiftright", h, b.cast("int")).bitwiseAND(1L) === 1L,
            lit(1)).otherwise(lit(-1)))
      })
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v, b) => when(v > 0,
          call_function("shiftleft", lit(1L), b.cast("int"))).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** SimHash near-dup candidate pairs: band the 64-bit hash into 4
    * 16-bit chunks; any exact chunk match → candidate (catches all
    * pairs with Hamming distance ≤ 3 chunks); verify with true Hamming
    * ≤ maxHamming via bit_count(xor).
    */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 8): DataFrame = {
    val hashed = df.select(col(idCol).as("id"),
      simhash(TextFunctions.tokens(col(textCol))).as("sh"))
    val banded = hashed.select(col("id"), col("sh"),
      posexplode(transform(sequence(lit(0), lit(3)),
        b => call_function("shiftright", col("sh"), (b * 16).cast("int"))
          .bitwiseAND(0xFFFFL))))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "chunk"))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .where(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Exact pairwise n-gram Jaccard over an inverted shingle index:
    * explode distinct shingles, equi-join on shingle, count common,
    * combine with set sizes. Quadratic only within identical-shingle
    * buckets; meant for bounded/sampled id sets or post-LSH candidates.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, threshold: Double = 0.0): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      TextFunctions.wordShingles(col(textCol), shingleN).as("sh"))
      .where(size(col("sh")) > 0)
    val sizes = sh.select(col("id"), size(col("sh")).as("n"))
    val ex = sh.select(col("id"), explode(col("sh")).as("s"))
    val common = ex.as("a").join(ex.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(broadcast(sizes.withColumnsRenamed(Map("id" -> "id_a", "n" -> "n_a"))), Seq("id_a"))
      .join(broadcast(sizes.withColumnsRenamed(Map("id" -> "id_b", "n" -> "n_b"))), Seq("id_b"))
      .withColumn("jaccard", col("common") / (col("n_a") + col("n_b") - col("common")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("common"), col("jaccard"))
  }
}
