package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed custom aggregate: element-wise mean of float vectors, with
  * QUANTIZED accumulation — each component is accumulated as
  * round(x·10⁴) in a long, so the merge is exact integer addition and
  * the result is independent of row/partition order (plain float sums
  * would differ run-to-run under Spark's nondeterministic merge order).
  * The final divide yields doubles on the 1e-4 grid.
  *
  * This is the `Aggregator[IN, BUF, OUT]` extension tier (SURVEY §2.10):
  * partial buffers (long[dim] + count) merge associatively map-side,
  * exactly like a built-in declarative aggregate.
  */
object VectorMeanAggregator {

  final case class Buf(var sums: Array[Long], var n: Long)

  private val agg = new Aggregator[Array[Float], Buf, Array[Double]] {
    override def zero: Buf = Buf(Array.emptyLongArray, 0L)

    // HALF_UP away from zero, matching Spark round() / DuckDB ROUND
    // (Math.round is floor(x+0.5): differs on negative .5 ties)
    private def q(x: Float): Long = {
      val y = x.toDouble * 10000
      if (y < 0) -math.round(-y) else math.round(y)
    }

    override def reduce(b: Buf, v: Array[Float]): Buf = {
      if (v == null) return b
      if (b.sums.length == 0) b.sums = new Array[Long](v.length)
      var i = 0
      val n = math.min(b.sums.length, v.length)
      while (i < n) { b.sums(i) += q(v(i)); i += 1 }
      b.n += 1
      b
    }

    override def merge(x: Buf, y: Buf): Buf = {
      if (x.sums.length == 0) return y
      if (y.sums.length == 0) return x
      var i = 0
      val n = math.min(x.sums.length, y.sums.length)
      while (i < n) { x.sums(i) += y.sums(i); i += 1 }
      x.n += y.n
      x
    }

    override def finish(b: Buf): Array[Double] =
      if (b.n == 0) null
      else b.sums.map(s => s.toDouble / b.n / 10000.0)

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  /** Column function: `vec_mean(embedding)` in a groupBy.agg. */
  def vec_mean: Column => Column = {
    val fn = udaf(agg)
    (c: Column) => fn(c)
  }
}
