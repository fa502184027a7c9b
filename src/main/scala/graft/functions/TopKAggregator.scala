package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Partial top-k per group: a typed Aggregator whose buffer is the
  * running top-k values, merged associatively.
  *
  * Why not `row_number() OVER (PARTITION BY g ORDER BY v DESC) <= k`:
  * the window form SORTS EVERY ROW of every group after shuffling ALL
  * of them — at 100 TB the shuffle is O(rows). This aggregates
  * map-side, so each mapper ships at most k values per group it saw
  * (shuffle O(groups × k × mappers-touching-group)), and the final
  * merge is a k-way array merge — the same partial→final shape as a
  * sum. Same results whenever ties at the k boundary have equal values
  * (emit (rank, value); tie ORDER is undefined in both forms).
  *
  * Buffer is a sorted-descending array (k is small by definition);
  * insertion keeps it sorted — O(k) per row, allocation-free checks for
  * the common below-threshold case.
  */
object TopKAggregator {

  final case class Buf(var top: Array[Double])

  private def makeAgg(k: Int) = new Aggregator[Double, Buf, Array[Double]] {
    override def zero: Buf = Buf(Array.emptyDoubleArray)

    private def insert(b: Buf, v: Double): Buf = {
      val t = b.top
      if (t.length >= k && v <= t(t.length - 1)) return b // fast reject
      val n = math.min(k, t.length + 1)
      val out = new Array[Double](n)
      var i = 0
      // position of v in the sorted-desc array
      while (i < t.length && t(i) >= v) { if (i < n) out(i) = t(i); i += 1 }
      if (i < n) out(i) = v
      var j = i + 1
      while (j < n) { out(j) = t(j - 1); j += 1 }
      b.top = out
      b
    }

    override def reduce(b: Buf, v: Double): Buf = insert(b, v)

    override def merge(x: Buf, y: Buf): Buf = {
      if (y.top.isEmpty) return x
      if (x.top.isEmpty) { x.top = y.top; return x }
      val n = math.min(k, x.top.length + y.top.length)
      val out = new Array[Double](n)
      var i = 0; var j = 0; var o = 0
      while (o < n) {
        if (j >= y.top.length || (i < x.top.length && x.top(i) >= y.top(j))) {
          out(o) = x.top(i); i += 1
        } else { out(o) = y.top(j); j += 1 }
        o += 1
      }
      x.top = out
      x
    }

    override def finish(b: Buf): Array[Double] = b.top

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  /** Column function: `top_k(v)` in a groupBy.agg — returns the k
    * largest values sorted descending.
    */
  def top_k(k: Int): Column => Column = {
    val fn = udaf(makeAgg(k))
    (c: Column) => fn(c)
  }
}
