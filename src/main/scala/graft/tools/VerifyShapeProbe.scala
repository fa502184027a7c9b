package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.text.Dedup

/** r15 optimization probe: A/B of exact-Jaccard verification shapes
  * over the headline minhash pipeline's candidate pairs.
  *
  *   V0 current: collect_set over the WHOLE corpus shingle frame, fat
  *      array join, array_intersect (StageBreakdown: 5.9 s CPU for the
  *      corpus-wide set build + a 552 ms single-task join tail)
  *   V1 candidate-only sets: semi-join ex by the pair id set first,
  *      then V0's shape (sets built for candidates only)
  *   V2 join-count: no arrays at all — common = equi-join of the two
  *      candidate-filtered shingle postings counted per pair, sizes as
  *      per-id counts (the inverted-index form the oracle uses)
  *
  * All three must yield identical (id_a, id_b, jaccard) rows.
  */
object VerifyShapeProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Session.builder("verify-shape").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.documents(spark, sf)

    val ex = Dedup.shingleHashFrame(docs, "doc_id", "text", 3,
      distinctShingles = false).localCheckpoint(true,
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)

    // the real candidate frame at the declared operating point
    val sigAgg = ex.groupBy(col("id")).agg(
      min(xxhash64(lit(0), col("s"))).as("mh_0"),
      (1 until 32).map(i => min(xxhash64(lit(i), col("s"))).as(s"mh_$i")): _*)
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
    val pairs = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        est.as("est_jaccard"))
      .where(col("est_jaccard") >= 0.35)
      .distinct()
      .localCheckpoint(true)
    println(s"[vshape] candidate pairs: ${pairs.count()}")

    val threshold = 0.5

    def v0(p: DataFrame): DataFrame = {
      val sh = ex.groupBy(col("id")).agg(collect_set(col("s")).as("sh"))
      p.join(sh.withColumnsRenamed(Map("id" -> "id_a", "sh" -> "sh_a")), Seq("id_a"))
        .join(sh.withColumnsRenamed(Map("id" -> "id_b", "sh" -> "sh_b")), Seq("id_b"))
        .withColumn("common", size(array_intersect(col("sh_a"), col("sh_b"))))
        .withColumn("jaccard",
          col("common") / (size(col("sh_a")) + size(col("sh_b")) - col("common")))
        .where(col("jaccard") >= threshold)
        .drop("sh_a", "sh_b")
    }

    def v1(p: DataFrame): DataFrame = {
      val ids = p.select(col("id_a").as("id"))
        .union(p.select(col("id_b").as("id"))).distinct()
      val sh = ex.join(ids, Seq("id"), "left_semi")
        .groupBy(col("id")).agg(collect_set(col("s")).as("sh"))
      p.join(sh.withColumnsRenamed(Map("id" -> "id_a", "sh" -> "sh_a")), Seq("id_a"))
        .join(sh.withColumnsRenamed(Map("id" -> "id_b", "sh" -> "sh_b")), Seq("id_b"))
        .withColumn("common", size(array_intersect(col("sh_a"), col("sh_b"))))
        .withColumn("jaccard",
          col("common") / (size(col("sh_a")) + size(col("sh_b")) - col("common")))
        .where(col("jaccard") >= threshold)
        .drop("sh_a", "sh_b")
    }

    def v2(p: DataFrame): DataFrame = {
      val ids = p.select(col("id_a").as("id"))
        .union(p.select(col("id_b").as("id"))).distinct()
      val exd = ex.join(ids, Seq("id"), "left_semi").distinct()
        .localCheckpoint(true)
      val sizes = exd.groupBy(col("id")).agg(count(lit(1)).as("sz"))
      val common = exd.toDF("id_a", "s")
        .join(p.select(col("id_a"), col("id_b")), Seq("id_a"))
        .join(exd.toDF("id_b", "s"), Seq("id_b", "s"))
        .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("common"))
      p.join(common, Seq("id_a", "id_b"), "left")
        .withColumn("common", coalesce(col("common"), lit(0L)))
        .join(sizes.toDF("id_a", "sz_a"), Seq("id_a"))
        .join(sizes.toDF("id_b", "sz_b"), Seq("id_b"))
        .withColumn("jaccard",
          col("common") / (col("sz_a") + col("sz_b") - col("common")))
        .where(col("jaccard") >= threshold)
        .select(col("id_a"), col("id_b"), col("est_jaccard"), col("jaccard"))
    }

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val variants = Seq[(String, DataFrame => DataFrame)](
      ("V0 corpus collect_set", v0), ("V1 candidate sets", v1),
      ("V2 join-count", v2))
    variants.foreach { case (_, f) => noop(f(pairs)) } // warm
    val reps = 7
    val times = Array.fill(variants.length)(
      scala.collection.mutable.ArrayBuffer.empty[Double])
    for (_ <- 1 to reps; ((_, f), i) <- variants.zipWithIndex) {
      val t0 = System.nanoTime(); noop(f(pairs))
      times(i) += (System.nanoTime() - t0) / 1e9
    }
    for (((nm, _), i) <- variants.zipWithIndex) {
      val s = times(i).sorted
      println(f"[vshape] $nm%-24s med=${s(s.length / 2)}%5.2f " +
        s.map(t => f"$t%.2f").mkString("[", " ", "]"))
    }
    // identity
    val a = v0(pairs).select("id_a", "id_b", "jaccard")
      .orderBy("id_a", "id_b").collect()
    for ((nm, f) <- variants.drop(1)) {
      val b = f(pairs).select("id_a", "id_b", "jaccard")
        .orderBy("id_a", "id_b").collect()
      val same = a.length == b.length &&
        a.zip(b).forall { case (x, y) => x == y }
      println(s"[vshape] identity V0==$nm: $same (${a.length} vs ${b.length} rows)")
    }
    spark.stop()
  }
}
