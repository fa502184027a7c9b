package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Term-frequency / document-frequency statistics and top-terms-per-doc
  * — the keyword-extraction primitive of a training-data pipeline
  * (topic balancing, dedup explain, corpus QA).
  *
  * Everything stays integer (tf, df counts) until the caller derives a
  * weighting, so results are engine-exact (the declared query ranks by
  * (tf DESC, df ASC, term ASC) — a pure-integer tf-idf ordering: high
  * in-doc frequency, low corpus frequency — and is hash-checked against
  * DuckDB).
  *
  * Scale shape: one (doc, term) hash aggregate (map-side partials — the
  * shuffle carries distinct (doc, term) pairs, not tokens), one |vocab|
  * aggregate for df, a term-keyed join to attach df (AQE broadcasts the
  * df side when small), and a per-doc window for the top-k. No
  * collects; every stage is codegen'd.
  */
object TfIdf {

  /** (doc, term, tf): term counts per document. */
  def termFreq(df: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.ops.Partitioning.fanOut(df)
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** (term, df): number of documents containing each term. */
  def docFreq(tf: DataFrame): DataFrame =
    tf.groupBy(col("term")).agg(count(lit(1)).as("df"))

  /** Inverted index: (term, df, postings, tfs) — the doc-id posting
    * list (ascending) with the parallel term-frequency array, the
    * retrieval structure BM25/boolean search serve from.
    *
    * The df band is applied BEFORE the posting lists materialize:
    * df is computed on the (doc, term) pair frame and out-of-band
    * terms (stopwords above, hapaxes below) are dropped by a term-keyed
    * join, so a corpus-sized stopword list never enters the collect —
    * the aggregate only ever builds lists ≤ maxDf entries. At 100 TB
    * the band IS the sharding policy: head terms that genuinely need
    * full posting lists get dedicated impact-ordered shards in a real
    * serving system; this operator builds the banded middle.
    *
    * Determinism: sort_array over (doc_id, tf) structs — doc_id is
    * unique within a term, so the order is total.
    */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
      n: Int, minDf: Long, maxDf: Long): DataFrame = {
    require(n >= 1, "gram size must be >= 1")
    require(minDf >= 1L && maxDf >= minDf, "need 1 <= minDf <= maxDf")
    // token array aliased in its OWN projection (the shinglesFromTokens
    // pitfall: an inlined split re-runs per element_at in the lambda)
    val toks = df.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("__t"))
    val grams =
      if (n == 1) toks.select(col("doc_id"), explode(col("__t")).as("term"))
      else toks.where(size(col("__t")) >= n)
        .select(col("doc_id"), explode(transform(
          sequence(lit(0), size(col("__t")) - n),
          i => concat_ws(" ",
            (0 until n).map(k => element_at(col("__t"), i + k + 1)): _*)))
          .as("term"))
    val tf = grams.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val kept = docFreq(tf).where(col("df").between(minDf, maxDf))
    tf.join(kept, Seq("term"))
      .groupBy(col("term"), col("df"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("tf"))))
        .as("__p"))
      .select(col("term"), col("df"),
        col("__p.doc_id").as("postings"), col("__p.tf").as("tfs"))
  }

  /** Top-k terms per document by the integer tf-idf ordering
    * (tf DESC, df ASC, term ASC — term as the total tiebreaker).
    */
  def topTermsPerDoc(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val tf = termFreq(df, idCol, textCol)
    val withDf = tf.join(docFreq(tf), Seq("term"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    withDf
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"))
  }
}
