package graft.tools

import org.apache.spark.sql.functions._

import graft.Session
import graft.text.Dedup

/** Dev probe: persist vs eager localCheckpoint for the shared shingle
  * frame feeding minhashNearDupsFromFrame. The round-4 DedupBench run
  * showed 190 s at 20k docs where round 2 measured 10.9 s — the only
  * code delta on the path is the pinning strategy, so time both on the
  * same corpus in the same JVM.
  */
object PinProbe {
  def main(args: Array[String]): Unit = {
    val nK = args.headOption.map(_.toInt).getOrElse(20)
    val n = nK * 1000L
    val spark = Session.get("pin-probe")
    spark.sparkContext.setLogLevel("WARN")

    val vocab = typedLit((0 until 5000).map(i => s"w$i"))
    val docs = spark.range(n)
      .select(col("id").as("doc_id"),
        when(pmod(col("id"), lit(100)) === 1, col("id") - 1)
          .otherwise(col("id")).as("base"))
      .select(col("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(99)),
          i => element_at(vocab,
            pmod(xxhash64(col("base"), i), lit(5000)).cast("int") + 1)))
          .as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count()

    def run(tag: String, pin: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val ex = pin(Dedup.shingleHashFrame(docs, "doc_id", "text", 3,
        distinctShingles = false))
      val tPin = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val found = Dedup.minhashNearDupsFromFrame(ex, 0.5, 32, 16, 0.35)
        .count()
      val tRun = (System.nanoTime() - t1) / 1e9
      println(f"[pin] $tag%-18s pin=$tPin%6.2f s  pipeline=$tRun%7.2f s  pairs=$found")
      // clearCache() would also evict the shared `docs` input, biasing
      // later variants (they'd regenerate the corpus inside their timed
      // pin step). Re-persist + re-materialize docs so every variant
      // starts from the identical cached-input state.
      spark.sharedState.cacheManager.clearCache()
      docs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      docs.count()
    }

    run("persist", df => {
      val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count(); p
    })
    run("localCheckpoint", _.localCheckpoint(true))
    run("persist2", df => {
      val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count(); p
    })
    spark.stop()
  }
}
