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
