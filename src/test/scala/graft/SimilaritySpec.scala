package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.Similarity
import graft.sources.Tables

class SimilaritySpec extends AnyFunSuite {
  lazy val spark: SparkSession = Session.builder("sim-test", "4").getOrCreate()
  val sf = "/root/testdata/sf0.001"

  test("quantized and float cosine agree to quantization error") {
    val emb = Tables.embeddings(spark, sf)
    val both = emb.limit(50).select(
      Similarity.quantizedCosine(col("embedding"), col("embedding")).as("qc"),
      Similarity.cosine(col("embedding"), col("embedding")).as("fc"))
      .collect()
    both.foreach { r =>
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-6)
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-6)
    }
  }

  test("brute-force top-k is ordered, excludes query, k rows") {
    val topk = Similarity.topKByQueryId(Tables.embeddings(spark, sf),
      "vec_id", "embedding", 0L, 10, Similarity.quantizedCosine).collect()
    assert(topk.length == 10)
    assert(!topk.map(_.getLong(0)).contains(0L))
    val scores = topk.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("LSH top-k recall vs brute force is reasonable") {
    val emb = Tables.embeddings(spark, sf)
    val exact = Similarity.topKByQueryId(emb, "vec_id", "embedding",
      0L, 10, Similarity.quantizedCosine).collect().map(_.getLong(0)).toSet
    val approx = Similarity.lshTopK(emb, "vec_id", "embedding", 0L, 10,
      numPlanes = 32, bands = 8).collect().map(_.getLong(0)).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // random unit vectors with no cluster structure are the worst case
    // for sign-LSH; just require meaningfully-better-than-chance recall
    assert(recall >= 0.3, s"recall $recall; exact=$exact approx=$approx")
  }

  test("auto band sizing follows the occupancy rule, prefers few wide bands") {
    // toy corpus: 10·2^4 = 160 ≥ 100 → 4-bit bands (the old hand default)
    assert(Similarity.autoLshBands(32, 100L) == 8)
    // sf-scale: needs 8 bits (10·2^8 = 2560 ≥ 640)
    assert(Similarity.autoLshBands(32, 640L) == 4)
    // 1M vectors: 16-bit bands, the scaladoc's 2×16 example
    assert(Similarity.autoLshBands(32, 1000000L) == 2)
    // beyond the 32-plane budget the cap holds at 2 bands (≥2 for OR)
    assert(Similarity.autoLshBands(32, 100000000L) == 2)
    // auto default produces a runnable plan with sane output
    val emb = Tables.embeddings(spark, sf)
    val topk = Similarity.lshTopK(emb, "vec_id", "embedding", 0L, 5)
      .collect()
    assert(topk.length <= 5 && !topk.map(_.getLong(0)).contains(0L))
  }

  test("IVF top-k: returns k rows, recall beats random-cell baseline") {
    val emb = Tables.embeddings(spark, sf)
    val exact = Similarity.topKByQueryId(emb, "vec_id", "embedding",
      0L, 10, Similarity.quantizedCosine).collect().map(_.getLong(0)).toSet
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", 0L, 10,
      nCells = 16, nProbe = 4).collect()
    assert(ivf.length == 10)
    val recall = (exact & ivf.map(_.getLong(0)).toSet).size.toDouble / exact.size
    // probing 4/16 cells of clusterless random vectors ≈ 25% of data;
    // nearest-cell probing should still beat that baseline comfortably
    assert(recall >= 0.3, s"recall $recall")
    val scores = ivf.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("IVF append: appended index serves the union exactly as a full rebuild") {
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("ivf_append_spec")
      .toString + "/idx"
    Similarity.buildAndWriteIvfIndex(
      emb.where(col("vec_id") % 4 =!= 0), "embedding", dir, nCells = 8)
    Similarity.appendToIvfIndex(
      emb.where(col("vec_id") % 4 === 0), "embedding", dir)
    val index = Similarity.readIvfIndex(spark, dir)
    // every corpus row is in the appended layout exactly once
    assert(index.cells.count() == emb.count())
    assert(index.cells.select("vec_id").distinct().count() == emb.count())
    // appended rows landed in the cell their vector maps to under the
    // FROZEN centroids (probe pruning stays correct for them)
    val reassigned = Similarity.assignCells(
      index.cells.where(col("vec_id") % 4 === 0).select("vec_id", "embedding"),
      "embedding", index.centroids)
      .withColumnRenamed("cell", "cell2")
    val mismatched = index.cells.where(col("vec_id") % 4 === 0)
      .select(col("vec_id"), col("cell"))
      .join(reassigned.select(col("vec_id"), col("cell2")), Seq("vec_id"))
      .where(col("cell") =!= col("cell2")).count()
    assert(mismatched == 0L)
  }

  test("cell assignment covers all rows, cells within range") {
    val emb = Tables.embeddings(spark, sf)
    val cents = Similarity.trainCentroids(emb, "embedding", 8)
    assert(cents.length == 8 && cents.forall(_.length == 64))
    val assigned = Similarity.assignCells(emb, "embedding", cents)
    assert(assigned.count() == emb.count())
    val cells = assigned.select("cell").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(cells.forall(c => c >= 0 && c < 8))
    assert(cells.size > 1, "k-means should produce multiple populated cells")
  }

  test("label centroids: one row per (label, dim), counts sum to table size") {
    val emb = Tables.embeddings(spark, sf)
    val cent = Similarity.labelCentroids(emb, "label", "embedding")
    val n = cent.count()
    val labels = emb.select("label").distinct().count()
    assert(n == labels * 64)
    val total = cent.where(col("pos") === 0)
      .agg(sum("n_vectors")).first().getLong(0)
    assert(total == emb.count())
  }

  test("label outliers: planted anti-centroid vector ranks first, k respected") {
    import spark.implicits._
    // label 0: three aligned vectors + one planted OPPOSITE vector;
    // label 1: independent cluster — per-label isolation
    val rows = Seq(
      (1L, 0, Array(1.0f, 0.1f)), (2L, 0, Array(0.9f, 0.2f)),
      (3L, 0, Array(1.0f, 0.0f)), (4L, 0, Array(-1.0f, -0.1f)),
      (10L, 1, Array(0.0f, 1.0f)), (11L, 1, Array(0.1f, 0.9f)))
      .toDF("vec_id", "label", "embedding")
    val out = Similarity.labelCentroidOutliers(
      rows, "vec_id", "embedding", "label", k = 2)
      .collect().map(r => (r.getInt(1), r.getLong(0), r.getDouble(2)))
    val label0 = out.filter(_._1 == 0).sortBy(_._3)
    assert(label0.head._2 == 4L, s"planted outlier not first: ${label0.toSeq}")
    assert(label0.head._3 < 0, "anti-centroid cosine must be negative")
    assert(out.count(_._1 == 0) == 2 && out.count(_._1 == 1) == 2)
    // exactness: cosine of the planted vector vs the quantized
    // centroid-sum, computed independently
    val qv = Array(-10000L, -1000L)
    val sq = Array((10000 + 9000 + 10000 - 10000).toLong,
      (1000 + 2000 + 0 - 1000).toLong)
    val qdot = qv(0) * sq(0) + qv(1) * sq(1)
    val expected = qdot /
      (math.sqrt((qv(0) * qv(0) + qv(1) * qv(1)).toDouble) *
        math.sqrt((sq(0) * sq(0) + sq(1) * sq(1)).toDouble))
    assert(label0.head._3 == expected, "bit-exact cosine expected")
  }

  test("kNN join: one scan, score-desc id-asc ranks, ties to smaller id, self excluded") {
    import spark.implicits._
    // v1 ≡ v3 (tie at cosine 1 with the v0 query → smaller id first);
    // v2 orthogonal (cosine 0 ranks last)
    val emb = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)),
      (3L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    val out = Similarity.knnJoin(emb, "vec_id", "embedding",
        emb.where(col("vec_id") === 0L), "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 1, 1L), (0L, 2, 3L), (0L, 3, 2L)))
  }

  test("hard negatives: same-label candidates excluded, cosine-desc ranks") {
    import spark.implicits._
    val emb = Seq(
      (0L, Seq(1f, 0f), 0),  // anchor, label 0
      (1L, Seq(3f, 1f), 0),  // nearest of all — but same label: excluded
      (2L, Seq(2f, 1f), 1),  // cos ~0.894 -> rank 1
      (3L, Seq(1f, 2f), 1),  // cos ~0.447 -> rank 2
      (4L, Seq(0f, 1f), 2))  // cos 0      -> cut by k=2
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(emb, "vec_id", "embedding", "label",
        emb.where(col("vec_id") === 0L), k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 1, 2L), (0L, 2, 3L)))
  }

  test("ivfKnnJoin: pruned probing (nProbe < nCells) matches brute knnJoin exactly") {
    import spark.implicits._
    // 4 well-separated direction clusters — with nProbe=2 of 4 cells a
    // query's true neighbors all live in its own cluster's cell, so the
    // pruned search must be BIT-identical to the brute join
    val dirs = Seq(Seq(1f, 0f, 0f), Seq(0f, 1f, 0f),
      Seq(0f, 0f, 1f), Seq(-1f, -1f, 0f))
    val rows = (0 until 200).map { i =>
      val d = dirs(i % 4)
      // deterministic small jitter, keeps clusters tight and separated
      val j = 0.01f * ((i * 37) % 10)
      (i.toLong, Seq(d(0) * 10 + j, d(1) * 10 + j, d(2) * 10 + j))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val queries = emb.where(col("vec_id") < 8)
    val index = Similarity.buildIvfIndex(emb, "embedding", nCells = 4)
    val brute = Similarity.knnJoin(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).sortBy(x => (x._1, x._2))
    val ivf = Similarity.ivfKnnJoin(index, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).sortBy(x => (x._1, x._2))
    assert(ivf.toSeq == brute.toSeq)
    index.cells.unpersist()
  }

  test("pca moments are additive: moments(A union B) == moments(A) + moments(B)") {
    import spark.implicits._
    // the merge law that makes the top component incrementally
    // maintainable at scale: per-batch moment buffers ADD — no
    // re-scan of history when a new batch lands
    val a = Seq(Seq(1f, 2f), Seq(3f, -1f)).toDF("embedding")
    val b = Seq(Seq(-2f, 0.5f), Seq(0f, 4f), Seq(1f, 1f)).toDF("embedding")
    def mom(df: org.apache.spark.sql.DataFrame) = {
      val r = df.agg(graft.sim.Pca.cov_moments(col("embedding")).as("m"))
        .select(col("m.n"), col("m.s"), col("m.p")).head()
      (r.getLong(0), r.getSeq[Long](1).toSeq, r.getSeq[Long](2).toSeq)
    }
    val (na, sa, pa) = mom(a)
    val (nb, sb, pb) = mom(b)
    val (nu, su, pu) = mom(a.unionByName(b))
    assert(nu == na + nb)
    assert(su == sa.zip(sb).map { case (x, y) => x + y })
    assert(pu == pa.zip(pb).map { case (x, y) => x + y })
  }

  test("pca top component: rank-1 data recovers the direction, unit norm") {
    import spark.implicits._
    // points on the line t·(1,2): scatter matrix is rank-1 with
    // eigenvector (1,2)/sqrt(5) -> quantized ~(4472, 8944)
    val df = (-10 to 10).filter(_ != 0)
      .map(t => Seq(t * 0.05f, t * 0.10f)).toDF("embedding")
    val out = graft.sim.Pca.topComponentQ(df, "embedding", iters = 8)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out.size == 2)
    val (a, b) = (out(0), out(1))
    // same sign, ratio 2 to quantization error, unit quantized norm
    assert(a.sign == b.sign && a != 0)
    assert(math.abs(b.toDouble / a - 2.0) < 1e-3)
    assert(math.abs(math.sqrt((a * a + b * b).toDouble) - 10000.0) < 2)
  }

  test("mutual margin pairs: mutual-top1 only, ratio margin, s2<=0 dropped") {
    import spark.implicits._
    // left 0:(2,1) 2:(1,2) 4:(-1,-1); right 1:(3,1) 3:(1,3)
    // cos(0,1)=cos(2,3)=7/sqrt50, cos(0,3)=cos(2,1)=5/sqrt50 — two
    // mutual pairs, each margin (7e8/d)/(5e8/d) with the same norms;
    // left 4 sees only negative cosines -> its s2 <= 0 -> dropped
    val left = Seq((0L, Seq(2f, 1f)), (2L, Seq(1f, 2f)),
      (4L, Seq(-1f, -1f))).toDF("vec_id", "embedding")
    val right = Seq((1L, Seq(3f, 1f)), (3L, Seq(1f, 3f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.mutualMarginPairs(left, right, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    val d = math.sqrt(5e8) * math.sqrt(1e9)
    val m = (7e8 / d) / (5e8 / d)
    assert(out.toSeq == Seq((0L, 1L, m), (2L, 3L, m)))
  }
}
