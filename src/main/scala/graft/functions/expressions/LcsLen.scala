package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Native longest-common-subsequence LENGTH over two ARRAY<STRING> token
  * columns — the ROUGE-L kernel. Sequence DP is not expressible with
  * Spark's built-in collection functions (each DP cell depends on the
  * previous cell of the SAME row), so this is a genuine custom-Expression
  * case, not a convenience: the classic two-row DP runs as one compiled
  * loop per pair, O(min(n,m)) extra memory, zero per-cell allocation.
  *
  * Null semantics: a null ARRAY nulls the result (nullSafeEval); a null
  * ELEMENT simply never matches anything (SQL equality on null), so
  * ragged token lists degrade gracefully instead of nulling the score.
  *
  * The DuckDB twin is the same DP with the row recurrence rewritten as a
  * prefix-max (new[j] = max(prev[j], max_{k<=j, b_k = x}(prev[k-1]+1)),
  * valid because DP rows are monotone) and UNROLLED over a fixed token
  * budget as plain window functions — see TextPack's q232 oracle. DuckDB
  * v1.0's nested list_reduce lambdas mis-evaluate captured outer
  * accumulators at realistic sizes (observed: wrong results at 40+
  * tokens, segfault at 64), so the twin deliberately uses no lambdas.
  */
case class LcsLen(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_lcs requires ARRAY<STRING> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = IntegerType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_lcs"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    LcsLen.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      // the DP loop lives in one static helper; generated code stays a
      // single call, keeping the operator inside whole-stage codegen
      // without inlining a 30-line loop per call site
      s"${ev.value} = graft.functions.expressions.LcsLen.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LcsLen =
    copy(left = newLeft, right = newRight)
}

object LcsLen {

  /** Two-row LCS DP; the shorter array is the DP row. Null elements match
    * nothing. Called from generated code via the static forwarder. */
  def compute(aIn: ArrayData, bIn: ArrayData): Int = {
    // keep the row on the shorter side: O(min(n,m)) memory
    val (a, b) =
      if (aIn.numElements() >= bIn.numElements()) (aIn, bIn) else (bIn, aIn)
    val n = a.numElements()
    val m = b.numElements()
    if (m == 0) return 0
    val prev = new Array[Int](m + 1)
    val cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      val ai = if (a.isNullAt(i - 1)) null else a.getUTF8String(i - 1)
      var j = 1
      while (j <= m) {
        val eq = ai != null && !b.isNullAt(j - 1) &&
          ai.equals(b.getUTF8String(j - 1))
        val diag = if (eq) prev(j - 1) + 1 else 0
        cur(j) = math.max(math.max(prev(j), cur(j - 1)), diag)
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, m + 1)
      i += 1
    }
    prev(m)
  }
}
