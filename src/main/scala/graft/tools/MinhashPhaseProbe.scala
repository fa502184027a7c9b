package graft.tools

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.text.Dedup

/** r15 optimization probe: phase split of the HEADLINE minhash query at
  * its declared operating point (t=0.5, k=32, 16 bands, est 0.35).
  * HeadlineProfile: wall 2.56 s but 26.8 s of task CPU over 102 tasks —
  * which phase owns it?
  *
  * Phases (cumulative pipelines, differences = per-phase cost):
  *   P1 shingle frame (fanOut + tokenize + zip-explode + xxhash64) to
  *      an eager serialized localCheckpoint — the pinned frame
  *   P2 signatures: groupBy(id) with 32 min(xxhash64(seed_i, s)) aggs
  *   P3 banding self-join + est prefilter + distinct
  *   P4 exact verify (collect_set + 2 joins + array_intersect)
  */
object MinhashPhaseProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Session.builder("mh-phase").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.documents(spark, sf)

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def med(tag: String)(f: => Unit): Double = {
      f // warm
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f
        spark.sharedState.cacheManager.clearCache()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[mhphase] $tag%-34s med=${ts(2)}%5.2f " +
        ts.map(t => f"$t%.2f").mkString("[", " ", "]"))
      ts(2)
    }

    // P1: the pinned shingle frame build (exactly what minhashNearDups pins)
    med("P1 shingle frame -> pinnedSer") {
      val ex = Dedup.shingleHashFrame(docs, "doc_id", "text", 3,
        distinctShingles = false)
      ex.localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER).unpersist(true)
    }

    // build one pinned frame for the downstream phases
    val ex = Dedup.shingleHashFrame(docs, "doc_id", "text", 3,
      distinctShingles = false).localCheckpoint(true,
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)

    val sigAgg = ex.groupBy(col("id")).agg(
      min(xxhash64(lit(0), col("s"))).as("mh_0"),
      (1 until 32).map(i => min(xxhash64(lit(i), col("s"))).as(s"mh_$i")): _*)
    med("P2 signatures (from pinned)")(noop(sigAgg))

    val bandCols = (0 until 16).map { b =>
      xxhash64((b * 2 until (b + 1) * 2).map(i => col(s"mh_$i")): _*)
    }
    val banded = sigAgg.select(col("id") +:
      (0 until 32).map(i => col(s"mh_$i")) :+
      posexplode(array(bandCols: _*)): _*)
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_hash"))
    val est = (0 until 32).map(i =>
      when(col(s"a.mh_$i") === col(s"b.mh_$i"), 1).otherwise(0))
      .reduce(_ + _) / 32.0
    val prefiltered = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        est.as("est_jaccard"))
      .where(col("est_jaccard") >= 0.35)
      .distinct()
    med("P3 sig+banding+est+distinct")(noop(prefiltered))

    med("P4 full pipeline (from pinned)")(
      noop(Dedup.minhashNearDupsFromFrame(ex, 0.5, 32, 16, 0.35)))

    med("FULL headline fn")(
      noop(Dedup.minhashNearDups(docs, "doc_id", "text",
        threshold = 0.5, numHashes = 32, bands = 16,
        estThresholdOpt = Some(0.35))
        .select(col("id_a"), col("id_b"), col("jaccard"))))
    spark.stop()
  }
}
