package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Trained-BPE token encoder as a native Catalyst expression:
  * `bpe_encode(token, merge_lefts, merge_rights)` — one token string
  * in, the post-merge symbol array out, with the merge table arriving
  * as two FOLDABLE array<string> literals (the broadcast-the-model
  * contract; they are evaluated once per expression instance, not per
  * row).
  *
  * Semantics are EXACTLY the fenced-replace fold of
  * [[graft.text.TextFunctions.bpeTrainMerges]]: merges applied in
  * rank order, each as one greedy left-to-right non-overlapping pass
  * (a merged symbol is never re-examined within its own pass) — the
  * reference loop the randomized CorpusOpsSpec tests pin.
  *
  * The eval does NOT walk the merge table: it looks up each of the
  * token's adjacent pairs in a pair→rank hash (built once per
  * expression instance) and repeatedly merges the leftmost occurrence
  * of the minimal present rank that is ≥ the last-applied rank. That
  * is provably identical to the pass-by-pass fold for ANY table, not
  * just trained ones: (a) one greedy L2R pass ≡ repeatedly merging
  * the pair's leftmost occurrence, because a merge rewrites adjacency
  * only at its own site and the new symbol l+r can equal neither l
  * nor r, so no new occurrence of the SAME pair can appear; (b) the
  * rank pointer enforces the fold's never-revisit rule — a pair
  * created at a lower rank than the last-applied pass is skipped,
  * exactly as the fold skips it (its pass already ran). Cost is
  * O(applied_merges × len) per token, INDEPENDENT of merge-table
  * size — a 30k-merge production vocabulary costs the same as a 40-
  * merge test one — where the pass fold pays O(table × len) even for
  * tokens containing none of the pairs. CodegenFallback: the per-row
  * loop dominates any virtual-call overhead, and the operator sits
  * behind an explode anyway.
  *
  * Unlike the trainer, no fence-character contract is needed here:
  * symbols are array elements — there is no string framing to
  * corrupt, and any code point (including U+0001) encodes correctly.
  */
case class BpeEncode(tok: Expression, lArr: Expression, rArr: Expression)
    extends TernaryExpression with CodegenFallback {

  override def first: Expression = tok
  override def second: Expression = lArr
  override def third: Expression = rArr

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (tok.dataType, lArr.dataType, rArr.dataType) match {
      case (StringType, ArrayType(StringType, _), ArrayType(StringType, _))
          if lArr.foldable && rArr.foldable =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "bpe_encode needs (string token, foldable array<string> lefts, " +
            s"foldable array<string> rights), got ${tok.dataType.catalogString}" +
            s" / ${lArr.dataType.catalogString} / ${rArr.dataType.catalogString}")
    }

  /** pair→(ranks, merged) hash, nested on the left symbol to avoid a
    * tuple allocation per lookup. A duplicate (l, r) entry keeps ALL
    * its ranks (ascending): within one pass a merge cannot recreate
    * its own pair (l+r equals neither l nor r), but a LATER merge
    * whose concatenation equals l or r can — ambiguous decompositions
    * like "aba" from both ("ab","a") and ("a","ba") let a trainer
    * legitimately re-learn an already-merged pair, and the pass fold
    * then merges the recreated occurrences at the duplicate's later
    * rank. The eval picks the minimal stored rank ≥ the pointer, so
    * it follows the fold on such tables too (ranks arrays are length
    * 1 on any dedup-trained table — the scan is free).
    */
  @transient private lazy val rankOf
      : java.util.HashMap[String, java.util.HashMap[String, Array[AnyRef]]] = {
    def strings(e: Expression): Array[String] = {
      val a = e.eval(null).asInstanceOf[ArrayData]
      Array.tabulate(a.numElements())(i => a.getUTF8String(i).toString)
    }
    val ls = strings(lArr)
    val rs = strings(rArr)
    require(ls.length == rs.length,
      s"bpe_encode: ${ls.length} lefts vs ${rs.length} rights")
    val m = new java.util.HashMap[String, java.util.HashMap[String, Array[AnyRef]]]()
    var i = 0
    while (i < ls.length) {
      val inner = m.computeIfAbsent(ls(i),
        _ => new java.util.HashMap[String, Array[AnyRef]]())
      val prev = inner.get(rs(i))
      if (prev eq null)
        inner.put(rs(i), Array[AnyRef](Array(i), ls(i) + rs(i)))
      else
        prev(0) = prev(0).asInstanceOf[Array[Int]] :+ i
      i += 1
    }
    m
  }

  override def nullSafeEval(input: Any, l: Any, r: Any): Any = {
    val t = input.asInstanceOf[UTF8String].toString
    // split into code points (the trainer's substr(i, 1) unit)
    val syms = new Array[String](t.codePointCount(0, t.length))
    var n = 0
    var ci = 0
    while (ci < t.length) {
      val w = Character.charCount(t.codePointAt(ci))
      syms(n) = t.substring(ci, ci + w)
      n += 1
      ci += w
    }
    // merge the leftmost occurrence of the minimal eligible rank
    // (eligible = rank ≥ last applied) until none remains — the exact
    // pass-fold equivalent, O(applied × len), table-size-independent
    var pointer = 0
    val table = rankOf
    var done = n < 2
    while (!done) {
      var best = -1
      var bestPos = -1
      var bestOut: String = null
      var i = 0
      while (i < n - 1) {
        val inner = table.get(syms(i))
        if (inner ne null) {
          val hit = inner.get(syms(i + 1))
          if (hit ne null) {
            // minimal stored rank ≥ pointer (ranks ascending)
            val ranks = hit(0).asInstanceOf[Array[Int]]
            var rk = -1
            var k = 0
            while (rk == -1 && k < ranks.length) {
              if (ranks(k) >= pointer) rk = ranks(k)
              k += 1
            }
            if (rk >= 0 && (best == -1 || rk < best)) {
              best = rk
              bestPos = i
              bestOut = hit(1).asInstanceOf[String]
            }
          }
        }
        i += 1
      }
      if (best == -1) done = true
      else {
        syms(bestPos) = bestOut
        var j = bestPos + 1
        while (j < n - 1) { syms(j) = syms(j + 1); j += 1 }
        n -= 1
        pointer = best
        if (n < 2) done = true
      }
    }
    val arr = new Array[Any](n)
    var i = 0
    while (i < n) {
      arr(i) = UTF8String.fromString(syms(i))
      i += 1
    }
    new GenericArrayData(arr)
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): BpeEncode =
    copy(tok = newFirst, lArr = newSecond, rArr = newThird)
}
