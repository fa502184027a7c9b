package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Partial top-k of (score, id) PAIRS per group — TopKAggregator's
  * shape (map-side partial top-k, associative k-way merge, shuffle
  * O(groups × k × mappers) instead of a window's O(rows)) carrying a
  * payload id alongside the ranking score. The comparator is total:
  * score DESC, then id ASC — with exact (quantized) scores the result
  * is fully deterministic, including ties at the k boundary, so it
  * hash-matches a `ROW_NUMBER() OVER (ORDER BY score DESC, id)`
  * oracle. The kNN-join operator (Similarity.knnJoin) is the consumer.
  */
object PairTopKAggregator {

  final case class P(score: Double, id: Long)
  final case class Buf(var top: Array[P])

  private def lt(a: P, b: P): Boolean = // "a ranks after b"
    a.score < b.score || (a.score == b.score && a.id > b.id)

  private def makeAgg(k: Int) = new Aggregator[P, Buf, Array[P]] {
    override def zero: Buf = Buf(Array.empty[P])

    override def reduce(b: Buf, v: P): Buf = {
      val t = b.top
      if (t.length >= k && !lt(t(t.length - 1), v)) return b // fast reject
      val n = math.min(k, t.length + 1)
      val out = new Array[P](n)
      var i = 0
      while (i < t.length && !lt(t(i), v)) { if (i < n) out(i) = t(i); i += 1 }
      if (i < n) out(i) = v
      var j = i + 1
      while (j < n) { out(j) = t(j - 1); j += 1 }
      b.top = out
      b
    }

    override def merge(x: Buf, y: Buf): Buf = {
      if (y.top.isEmpty) return x
      if (x.top.isEmpty) { x.top = y.top; return x }
      val n = math.min(k, x.top.length + y.top.length)
      val out = new Array[P](n)
      var i = 0; var j = 0; var o = 0
      while (o < n) {
        if (j >= y.top.length ||
            (i < x.top.length && !lt(x.top(i), y.top(j)))) {
          out(o) = x.top(i); i += 1
        } else { out(o) = y.top(j); j += 1 }
        o += 1
      }
      x.top = out
      x
    }

    override def finish(b: Buf): Array[P] = b.top

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Array[P]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[P]]()
  }

  /** `top_k_pair(k)(score, id)` in a groupBy.agg — the k best
    * (score, id) pairs, sorted score DESC then id ASC. (The case-class
    * input encoder flattens to two SQL arguments.)
    */
  def top_k_pair(k: Int): (Column, Column) => Column = {
    val fn = udaf(makeAgg(k), Encoders.product[P])
    (score: Column, id: Column) => fn(score, id)
  }
}
