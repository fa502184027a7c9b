package graft.tools

import org.apache.spark.sql.functions._

import graft.Session
import graft.text.Dedup

/** Scale probe: exact prefix-filtered Jaccard join vs banded
  * MinHash-LSH on the same corpus and threshold (1/2). The exact join
  * removes the recall argument — the question is what that costs in
  * CANDIDATES as the corpus grows, since its candidate count is
  * Σ_{prefix tokens} df², driven by the rare tail of the shingle df
  * distribution, while LSH's is driven by band-collision rates.
  *
  * Corpus: sf0.1 documents replicated K× with every token salted by
  * replica id — replicas are mutually dissimilar (cross-replica
  * jaccard ≈ 0), so the true pair population and per-doc structure
  * stay constant per replica and the HONEST scaling law is linear.
  *
  * Usage: runMain graft.tools.PrefixJoinProbe [sfDir] [maxK]
  */
object PrefixJoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxK = args.drop(1).headOption.map(_.toInt).getOrElse(16)
    val spark = Session.get("prefix-join-probe")
    spark.sparkContext.setLogLevel("WARN")
    val base = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))

    for (k <- Seq(1, 4, maxK).distinct.filter(_ <= maxK)) {
      val corpus = spark.range(k).crossJoin(base)
        .select((col("doc_id") * k + col("id")).as("doc_id"),
          when(col("id") === 0, col("text"))
            .otherwise(regexp_replace(col("text"), lit("(\\S+)"),
              concat(lit("$1_r"), col("id").cast("string"))))
            .as("text"))
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      val nDocs = corpus.count()

      // --- prefix join internals: candidate count before verify
      val ex = Dedup.shingleHashFrame(corpus, "doc_id", "text", 3)
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      val dfreq = ex.groupBy(col("s")).agg(count(lit(1)).as("__df"))
      val wId = org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
      val ranked = ex.join(dfreq, Seq("s"))
        .withColumn("__sz", count(lit(1)).over(wId))
        .withColumn("__pos", row_number().over(
          wId.orderBy(col("__df"), col("s"))))
      val prefix = ranked
        .where(col("__pos") <= col("__sz") - expr("(__sz + 1) div 2") + 1)
        .select(col("s"), col("id"), col("__sz"))
      val prefixRows = prefix.count()
      val candPrefix = prefix.as("a").join(prefix.as("b"),
          col("a.s") === col("b.s") && col("a.id") < col("b.id") &&
          col("b.__sz") * 2 >= col("a.__sz") &&
          col("a.__sz") * 2 >= col("b.__sz"))
        .select(col("a.id"), col("b.id")).distinct().count()

      var t0 = System.nanoTime()
      val nExact = Dedup.prefixFilterNearDups(
        corpus, "doc_id", "text", 1, 2).count()
      val tExact = (System.nanoTime() - t0) / 1e9

      // --- LSH at the gate operating point
      val candLsh = Dedup.lshCandidatePairs(
        corpus, "doc_id", "text", 3, 32, 16).distinct().count()
      t0 = System.nanoTime()
      val nLsh = Dedup.minhashNearDups(corpus, "doc_id", "text",
        threshold = 0.5, numHashes = 32, bands = 16,
        estThresholdOpt = Some(0.35)).count()
      val tLsh = (System.nanoTime() - t0) / 1e9

      println(f"[probe] k=$k%2d docs=$nDocs%7d prefixRows=$prefixRows%9d " +
        f"candPrefix=$candPrefix%9d candLsh=$candLsh%9d " +
        f"pairsExact=$nExact%6d pairsLsh=$nLsh%6d " +
        f"tExact=$tExact%7.1fs tLsh=$tLsh%7.1fs")
      corpus.unpersist()
      ex.unpersist()
    }
    spark.stop()
  }
}
