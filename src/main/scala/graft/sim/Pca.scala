package graft.sim

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{col, udaf}

/** Distributed top-principal-component estimation over an embedding
  * column — the building block of embedding post-processing ("all but
  * the top": mean-center, remove the dominant direction) that semantic
  * dedup and retrieval pipelines apply before cosine comparisons.
  *
  * Scale shape: the ONLY pass over data is one typed Aggregator
  * computing exact integer covariance moments — each partition folds
  * rows into a single long[1 + dim + dim(dim+1)/2] buffer (count,
  * component sums, upper-triangle product sums of the 1e4-quantized
  * components) and buffers merge by element-wise addition, so the
  * reduction is order-independent and the shuffle carries ONE buffer
  * per partition. Everything after — the 64×64 scatter matrix and a
  * fixed number of power-iteration steps — is O(dim²·iters) driver
  * math, same tier as k-means' driver Lloyd loop or the PQ codebooks.
  *
  * Determinism (the registry's exact-arithmetic rule): the scatter
  * matrix M = n·P − s·sᵀ is exact integers; it is scaled by a
  * DETERMINISTIC power of ten (truncating division toward zero) so
  * the matvec and its norm² stay inside HUGEINT on the oracle side;
  * each power step is integer matvec → exact norm² → ONE double
  * division and HALF_UP(away-from-zero) re-quantization to the 1e-4
  * grid. The DuckDB oracle replays the entire trajectory — moments,
  * scaling, every iterate — in SQL.
  *
  * The output is the K-step power iterate from the all-ones start
  * (quantized), NOT a converged eigenvector claim: with a spectral
  * gap it converges at rate (λ₂/λ₁)^K; the declared K is part of the
  * operator's contract, like the unrolled k-means trajectories.
  */
object Pca {

  final case class CovBuf(var n: Long, var s: Array[Long], var p: Array[Long])
  final case class CovOut(n: Long, s: Array[Long], p: Array[Long])

  private val covAgg = new Aggregator[Array[Float], CovBuf, CovOut] {
    override def zero: CovBuf = CovBuf(0L, Array.emptyLongArray, Array.emptyLongArray)

    // HALF_UP away from zero, matching ROUND in both engines
    private def q(x: Float): Long = {
      val y = x.toDouble * 10000
      if (y < 0) -math.round(-y) else math.round(y)
    }

    override def reduce(b: CovBuf, v: Array[Float]): CovBuf = {
      if (v == null) return b
      val d = v.length
      if (b.s.length == 0) {
        b.s = new Array[Long](d)
        b.p = new Array[Long](d * (d + 1) / 2)
      }
      val qs = new Array[Long](d)
      var i = 0
      while (i < d) { qs(i) = q(v(i)); b.s(i) += qs(i); i += 1 }
      var t = 0
      i = 0
      while (i < d) {
        var j = i
        while (j < d) { b.p(t) += qs(i) * qs(j); j += 1; t += 1 }
        i += 1
      }
      b.n += 1
      b
    }

    override def merge(x: CovBuf, y: CovBuf): CovBuf = {
      if (x.s.length == 0) return y
      if (y.s.length == 0) return x
      var i = 0
      while (i < x.s.length) { x.s(i) += y.s(i); i += 1 }
      i = 0
      while (i < x.p.length) { x.p(i) += y.p(i); i += 1 }
      x.n += y.n
      x
    }

    override def finish(b: CovBuf): CovOut = CovOut(b.n, b.s, b.p)
    override def bufferEncoder: Encoder[CovBuf] = Encoders.product[CovBuf]
    override def outputEncoder: Encoder[CovOut] = Encoders.product[CovOut]
  }

  /** `cov_moments(embedding)` — one row out: exact integer (n, Σq,
    * upper-triangle Σ qᵢqⱼ) over the quantized components.
    */
  def cov_moments: Column => Column = {
    val fn = udaf(covAgg)
    (c: Column) => fn(c)
  }

  /** The quantized K-step top-component power iterate (dim,
    * q_component on the 1e-4 grid). See the object doc for the exact
    * deterministic trajectory the oracle replays.
    */
  def topComponentQ(df: DataFrame, vecCol: String,
      iters: Int = 8): DataFrame = {
    val spark = df.sparkSession
    val out = df.agg(cov_moments(col(vecCol)).as("m"))
      .select(col("m.n"), col("m.s"), col("m.p")).head()
    require(!out.isNullAt(0) && out.getLong(0) > 0,
      "topComponentQ: input frame has no rows (n = 0)")
    val n = BigInt(out.getLong(0))
    val s = out.getSeq[Long](1).toArray
    val pTri = out.getSeq[Long](2).toArray
    val d = s.length
    require(d > 0, "topComponentQ: zero-dimension vectors")
    // full scatter matrix M = n·P − s·sᵀ (exact)
    val m = Array.ofDim[BigInt](d, d)
    var t = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val v = n * BigInt(pTri(t)) - BigInt(s(i)) * BigInt(s(j))
        m(i)(j) = v; m(j)(i) = v
        j += 1; t += 1
      }
      i += 1
    }
    // deterministic decimal down-scale: keep |M| under 1e9 so the
    // oracle's matvec and norm² fit HUGEINT; truncating division
    // toward zero on both engines
    val maxAbs = m.flatten.map(_.abs).max
    val k = math.max(0, maxAbs.toString.length - 9)
    val sc = BigInt(10).pow(k)
    val ms = m.map(_.map { v =>
      if (v.signum >= 0) v / sc else -((-v) / sc)
    })
    // power iteration from all-ones (quantized 1e4)
    var vq = Array.fill(d)(BigInt(10000))
    var it = 0
    while (it < iters) {
      val mv = Array.tabulate(d) { r =>
        var acc = BigInt(0)
        var c = 0
        while (c < d) { acc += ms(r)(c) * vq(c); c += 1 }
        acc
      }
      val n2 = mv.map(x => x * x).sum
      vq =
        if (n2.signum == 0) Array.fill(d)(BigInt(0))
        else {
          val den = math.sqrt(n2.toDouble)
          mv.map { x =>
            val y = 10000 * (x.toDouble / den)
            BigInt(new java.math.BigDecimal(y)
              .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact())
          }
        }
      it += 1
    }
    import spark.implicits._
    vq.zipWithIndex.map { case (v, dim) => (dim, v.toLong) }
      .toSeq.toDF("dim", "q_component")
  }

  /** ABTT readout: per label, the share of total (uncentered) quantized
    * second moment captured by the top component —
    * Σ (e·u)² / (‖u‖² · Σ ‖e‖²), every term an exact integer
    * (DECIMAL(38,0)), the share ONE double division. In [0, 1] by
    * Cauchy-Schwarz; the "all but the top" projection removes exactly
    * this fraction per label, so a label whose share is high rides the
    * corpus-dominant direction and flattens most under ABTT.
    *
    * Scale shape: [[topComponentQ]]'s one moments pass, then ONE
    * map-side projection pass (u rides the plan as a literal) into a
    * |labels|-row aggregate.
    */
  def abttRemovedShare(df: DataFrame, vecCol: String, labelCol: String,
      iters: Int = 8): DataFrame = {
    import org.apache.spark.sql.functions._
    val u = topComponentQ(df, vecCol, iters).collect()
      .sortBy(_.getInt(0)).map(_.getLong(1))
    val den = u.map(x => x * x).sum
    val uLit = typedlit(u.toSeq)
    def q(x: Column): Column = round(x.cast("double") * 10000).cast("long")
    val num = aggregate(
      zip_with(col(vecCol), uLit, (x, uu) => q(x) * uu),
      lit(0L), (acc, y) => acc + y)
    val nrm2 = aggregate(
      transform(col(vecCol), x => q(x) * q(x)),
      lit(0L), (acc, y) => acc + y)
    df.select(col(labelCol).as("label"), num.as("__num"), nrm2.as("__n2"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("__num").cast("decimal(19,0)") *
          col("__num").cast("decimal(19,0)")).as("__sn2"),
        sum(col("__n2").cast("decimal(38,0)")).as("__se2"))
      .select(col("label"), col("n_vecs"),
        when(col("__se2") > 0 && lit(den) > 0,
          col("__sn2").cast("double") /
            (lit(den).cast("decimal(38,0)") * col("__se2")).cast("double"))
          .as("removed_share"))
  }
}
