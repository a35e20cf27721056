package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-grams over an ARRAY<STRING> token column: sliding windows of `n`
  * tokens joined by a single space.
  *
  * The composed form — `transform(sequence(...), i -> concat_ws(' ',
  * slice(toks, i, n)))` — evaluates three interpreted higher-order/
  * collection expressions per window, each allocating an intermediate
  * array; it dominates the shingle-based dedup/curation operators the same
  * way the composed dot product dominated similarity (SURVEY.md §8). This
  * is one compiled loop with a single output allocation per window.
  *
  * Semantics: fewer than n tokens → empty array; null tokens are skipped
  * within a window (concat_ws semantics; the engine's tokenizers never
  * produce nulls); a NULL token-array input null-propagates like any
  * binary expression (TextFunctions.wordNgrams coalesces that back to the
  * empty array its previous composed form returned).
  *
  * Registered as SQL function `graft_ngrams(tokens, n)`.
  */
case class WordNgrams(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) if right.foldable =>
      val nv = right.eval(null)
      if (nv != null && nv.asInstanceOf[Int] >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("graft_ngrams requires n >= 1")
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_ngrams requires (ARRAY<STRING>, INT literal)")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_ngrams"

  private lazy val n: Int = right.eval(null).asInstanceOf[Int]
  private val space = UTF8String.fromString(" ")

  override protected def nullSafeEval(arr: Any, ignored: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    val len = a.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](len)
    var hasNull = false
    var t = 0
    while (t < len) {
      if (a.isNullAt(t)) hasNull = true else toks(t) = a.getUTF8String(t)
      t += 1
    }
    val out = new Array[Any](len - n + 1)
    // fast path reuses ONE window buffer across all windows (concatWs
    // copies the bytes, it does not retain the array); the null-skipping
    // slow path only runs for inputs the engine's tokenizers never produce
    val window = new Array[UTF8String](n)
    var i = 0
    while (i < out.length) {
      var j = 0
      while (j < n) { window(j) = toks(i + j); j += 1 }
      out(i) =
        if (!hasNull) UTF8String.concatWs(space, window: _*)
        else UTF8String.concatWs(space, window.filter(_ != null): _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordNgrams =
    copy(left = newLeft, right = newRight)
}
