package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector-similarity operators over an `ArrayType(FloatType)` embedding
  * column: brute-force cosine top-k (the exactness baseline), a
  * random-hyperplane LSH bucketed variant (the scale path), pairwise
  * near-dup detection, and per-label centroids.
  *
  * Two arithmetic modes:
  *  - FLOAT: plain double math via zip_with/aggregate HOFs — fast,
  *    codegen'd, but sum order makes the low bits engine-specific →
  *    queries built on it are rows-only checks.
  *  - QUANTIZED: each component is rounded to a 1e-4 grid as a LONG
  *    (`round(x·10⁴)`); dot products and norms become exact integer
  *    sums (|x|≤1 ⇒ |q|≤10⁴ ⇒ 64-dim dot ≤ 6.4e9 « 2^63, ANSI-safe),
  *    so results are order-independent and bit-identical in any engine —
  *    the DuckDB oracle reproduces them exactly. Cosine then needs one
  *    double division + sqrt on identical inputs → still deterministic.
  *
  * 100 TB notes: brute-force is a broadcast of the query vector — one
  * map-side pass, no shuffle; LSH shuffles once on (band, bucket) whose
  * cardinality is controlled by planesPerBand; near-dup's quadratic
  * term is confined within buckets. Nothing collects to the driver.
  */
object Similarity {

  /** Quantize one float component to the 1e-4 integer grid. */
  private def q(x: Column): Column = round(x.cast("double") * 10000).cast("long")

  /** Exact integer dot product of two quantized vectors. */
  def quantizedDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => q(x) * q(y)), lit(0L), (acc, v) => acc + v)

  def quantizedNormSq(a: Column): Column = quantizedDot(a, a)

  /** Deterministic cosine from quantized components. */
  def quantizedCosine(a: Column, b: Column): Column =
    quantizedDot(a, b) / (sqrt(quantizedNormSq(a)) * sqrt(quantizedNormSq(b)))

  /** Float-path dot/cosine (fast, engine-specific low bits). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Brute-force top-k neighbours of one stored vector: broadcast the
    * single query row, score every vector map-side, global top-k.
    * `scoreFn` picks the arithmetic mode.
    */
  def topKByQueryId(df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int,
      scoreFn: (Column, Column) => Column): DataFrame = {
    val query = df.where(col(idCol) === queryId)
      .select(col(vecCol).as("__qvec"))
    df.crossJoin(broadcast(query))
      .where(col(idCol) =!= queryId)
      .select(col(idCol), scoreFn(col(vecCol), col("__qvec")).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic random hyperplanes (fixed seed → identical plan
    * every run; Spark requirement for resumable/replayable queries).
    * Float components so the native FloatVecDot expression applies.
    */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Float]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rnd.nextGaussian().toFloat))
  }

  /** Sign-random-projection band buckets: `bands` buckets per vector,
    * each from `planesPerBand` hyperplane sign bits. Static plane
    * literals scored through the codegen'd vec_dot (callers must
    * VectorFunctions.register the session) — the HOF dot here was
    * 32 interpreted array traversals per row.
    */
  def lshBuckets(vec: Column, planes: Seq[Seq[Float]], bands: Int): Column = {
    val perBand = planes.size / bands
    val bits: Seq[Column] = planes.map { p =>
      val planeCol = typedLit(p)
      when(graft.functions.VectorFunctions.vec_dot(vec, planeCol) > 0,
        lit(1)).otherwise(lit(0))
    }
    array((0 until bands).map { b =>
      (0 until perBand).foldLeft(lit(0)) { (acc, j) =>
        acc * 2 + bits(b * perBand + j)
      }
    }: _*)
  }

  /** LSH-bucketed approximate top-k for one stored query vector:
    * candidates = vectors sharing ≥1 band bucket with the query, then
    * exact re-scoring of candidates only. At 1000× data the scan is the
    * same, but scoring work drops from N to the bucket-collision count.
    */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String, queryId: Long,
      k: Int, numPlanes: Int = 32, bands: Int = 8, dim: Int = 64,
      scoreFn: (Column, Column) => Column = quantizedCosine): DataFrame = {
    graft.functions.VectorFunctions.register(df.sparkSession)
    val planes = hyperplanes(numPlanes, dim)
    val withBuckets = df.select(col(idCol), col(vecCol),
      posexplode(lshBuckets(col(vecCol), planes, bands)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bucket"))
    val queryBuckets = withBuckets.where(col(idCol) === queryId)
      .select(col("band"), col("bucket"), col(vecCol).as("__qvec"))
    withBuckets
      .join(broadcast(queryBuckets), Seq("band", "bucket"))
      .where(col(idCol) =!= queryId)
      .select(col(idCol), col(vecCol), col("__qvec")).distinct()
      .select(col(idCol), scoreFn(col(vecCol), col("__qvec")).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** All-pairs near-duplicates above a cosine threshold over a bounded
    * id set (sample or post-LSH candidates): quantized arithmetic so
    * the result is oracle-exact.
    *
    * Exploded formulation, not a per-pair vector HOF: one row per
    * (id, dim, component), norms aggregated once per id, pair dots via
    * an equi-join on the dimension index — everything stays in codegen'd
    * hash join/aggregate. (A `pairs × quantizedCosine(a,b)` cross join
    * evaluates 3 interpreted array-aggregates per pair — measured ~15×
    * slower at 400 vectors / 80k pairs.)
    */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val flat = graft.ops.Partitioning.fanOut(df)
      .select(col(idCol).as("id"), posexplode(col(vecCol)))
      .select(col("id"), col("pos").as("i"), q(col("col")).as("qv"))
    val norms = flat.groupBy(col("id")).agg(sum(col("qv") * col("qv")).as("nrm"))
    val dots = flat.as("a").join(flat.as("b"),
        col("a.i") === col("b.i") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(sum(col("a.qv") * col("b.qv")).as("qdot"))
    dots
      .join(broadcast(norms.toDF("id_a", "nrm_a")), Seq("id_a"))
      .join(broadcast(norms.toDF("id_b", "nrm_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("qdot") / (sqrt(col("nrm_a")) * sqrt(col("nrm_b")))).as("cos_q"))
      .where(col("cos_q") >= threshold)
  }

  /** Full-corpus embedding near-dup via LSH banding: vectors sharing a
    * sign-projection band bucket become candidate pairs; exact
    * quantized cosine verifies. The all-pairs quadratic never happens —
    * work is Σ bucket² over (band, bucket) groups, tuned by
    * numPlanes/bands exactly like the text MinHash family.
    */
  def lshNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, numPlanes: Int = 32, bands: Int = 8,
      dim: Int = 64): DataFrame = {
    graft.functions.VectorFunctions.register(df.sparkSession)
    val planes = hyperplanes(numPlanes, dim)
    // distinct over bare id pairs (vectors re-joined afterwards — a
    // distinct dragging two float[64] payloads through the shuffle was
    // the dominant cost), codegen'd vec_dot for bucket signs + verify.
    val banded = graft.ops.Partitioning.fanOut(df)
      .select(col(idCol).as("id"),
        posexplode(lshBuckets(col(vecCol), planes, bands)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bucket"))
    val pairs = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    pairs
      .join(vecs.toDF("id_a", "va"), Seq("id_a"))
      .join(vecs.toDF("id_b", "vb"), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.functions.VectorFunctions.vec_cosine(col("va"), col("vb"))
          .as("cos"))
      .where(col("cos") >= threshold)
  }

  /** IVF (inverted-file) coarse quantizer: k-means cells over the
    * embedding space (spark.ml KMeans — existing op, tier (a)), then
    * search probes only the nProbe cells nearest the query vector.
    *
    * At 100 TB the cell assignment is one map-side pass (k static
    * centroid literals through the codegen'd vec_dot expression) and
    * would be persisted/bucketed BY cell so a query touches
    * nProbe/nCells of the data; here assignment runs inline. Training
    * samples the input (coarse centroids don't need every row).
    */
  def trainCentroids(df: DataFrame, vecCol: String, k: Int,
      seed: Long = 42L, maxIter: Int = 5): Array[Array[Float]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val vecs = df.select(array_to_vector(col(vecCol)).as("features"))
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(maxIter)
      .setInitMode("random") // k-means|| init costs ~10 extra jobs; random
      .fit(vecs)             // init + a few Lloyd iters suffice for coarse cells
    model.clusterCenters.map(_.toArray.map(_.toFloat))
  }

  /** Cell id = argmax over cells of (v·c − ‖c‖²/2) (equivalent to
    * nearest-centroid by L2). Static centroid literals; scoring goes
    * through the native FloatVecDot expression (codegen).
    */
  def assignCells(df: DataFrame, vecCol: String,
      centroids: Array[Array[Float]]): DataFrame = {
    graft.functions.VectorFunctions.register(df.sparkSession)
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      val halfNorm = c.map(x => x.toDouble * x).sum / 2.0
      struct(
        (graft.functions.VectorFunctions.vec_dot(col(vecCol),
          typedLit(c.toSeq)) - lit(halfNorm)).as("score"),
        lit(i).as("cell"))
    }
    df.withColumn("cell",
      array_max(array(scored: _*)).getField("cell"))
  }

  /** IVF approximate top-k for one stored query vector. */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String, queryId: Long,
      k: Int, nCells: Int = 16, nProbe: Int = 4,
      scoreFn: (Column, Column) => Column = quantizedCosine): DataFrame = {
    val centroids = trainCentroids(df, vecCol, nCells)
    val assigned = assignCells(
      graft.ops.Partitioning.fanOut(df), vecCol, centroids)

    val query = assigned.where(col(idCol) === queryId)
      .select(col(vecCol).as("__qvec"))
    // cells ranked by closeness to the query vector, keep nProbe best
    val cellScores = query.select(
      posexplode(array(centroids.zipWithIndex.map { case (c, i) =>
        struct(
          (graft.functions.VectorFunctions.vec_dot(col("__qvec"),
            typedLit(c.toSeq)) -
            lit(c.map(x => x.toDouble * x).sum / 2.0)).as("score"),
          lit(i).as("cell"))
      }: _*)))
      .select(col("col.score").as("score"), col("col.cell").as("cell"))
      .orderBy(col("score").desc, col("cell"))
      .limit(nProbe)
      .select(col("cell"))

    assigned
      .join(broadcast(cellScores), Seq("cell"), "left_semi")
      .where(col(idCol) =!= queryId)
      .crossJoin(broadcast(query))
      .select(col(idCol), scoreFn(col(vecCol), col("__qvec")).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Per-label centroids in exploded (label, pos, value) form: the
    * quantized component sum is exact, the final mean is one double
    * division → oracle-exact and shuffle-friendly (key cardinality =
    * labels × dim, partial aggregation map-side).
    */
  def labelCentroids(df: DataFrame, labelCol: String, vecCol: String): DataFrame =
    df.select(col(labelCol).as("label"), posexplode(col(vecCol)))
      .select(col("label"), col("pos"),
        round(col("col").cast("double") * 10000).cast("long").as("qv"))
      .groupBy(col("label"), col("pos"))
      .agg((sum(col("qv")) / count(lit(1)) / 10000.0).as("centroid"),
        count(lit(1)).as("n_vectors"))
}
