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
  * reference loop the randomized CorpusOpsSpec tests pin. The win
  * over the aggregate-HOF formulation is constant-factor but large:
  * higher-order functions evaluate INTERPRETED and rebuild the whole
  * fenced string once per merge (O(merges) string allocations per
  * token), while this eval runs one in-place array pass per merge and
  * exits early once a token is down to one symbol. Same
  * O(merges × len) bound, ~none of the allocation. CodegenFallback:
  * the per-row loop dominates any virtual-call overhead, and the
  * operator sits behind an explode anyway.
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

  @transient private lazy val (mergeL, mergeR, mergeOut) = {
    def strings(e: Expression): Array[String] = {
      val a = e.eval(null).asInstanceOf[ArrayData]
      Array.tabulate(a.numElements())(i => a.getUTF8String(i).toString)
    }
    val ls = strings(lArr)
    val rs = strings(rArr)
    require(ls.length == rs.length,
      s"bpe_encode: ${ls.length} lefts vs ${rs.length} rights")
    (ls, rs, ls.zip(rs).map { case (l, r) => l + r })
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
    var mi = 0
    while (mi < mergeL.length && n >= 2) {
      val ml = mergeL(mi)
      val mr = mergeR(mi)
      val out = mergeOut(mi)
      // one greedy L2R non-overlapping pass, writing in place
      var read = 0
      var write = 0
      while (read < n) {
        if (read + 1 < n && syms(read) == ml && syms(read + 1) == mr) {
          syms(write) = out
          read += 2
        } else {
          syms(write) = syms(read)
          read += 1
        }
        write += 1
      }
      n = write
      mi += 1
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
