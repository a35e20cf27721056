package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** All `m` product-quantization subspace distances in one pass: for
  * vectors split into `m` equal-width subvectors, returns an
  * ARRAY<DOUBLE> of length `m` whose `mi`-th entry is the squared L2
  * distance between the `mi`-th slices of `left` and `right`,
  * accumulated in component order (the PQ.subDist contract — the DuckDB
  * oracle replays the same left-to-right order).
  *
  * The composed form (m × `aggregate(zip_with(slice, slice))`) walks the
  * two arrays m times through interpreted higher-order lambdas and
  * allocates a zipped array per subspace; on the PQ encode join
  * (|corpus| × |codebook| rows) that interpreted loop dominated the q81
  * bench. This is one fused codegen loop over the components, no
  * allocation beyond the m-slot result.
  *
  * Null semantics: NULL if either array is NULL (BinaryExpression
  * default); a NULL *element* contributes NaN to its subspace (same as
  * the composed arithmetic, where `null - x` is null and the aggregate
  * seeds double arithmetic — the engine's vectors are never
  * element-null; the NaN keeps poison visible instead of silently
  * dropping a component). Arrays shorter than m*sub are read as if
  * truncated: components past either length are skipped.
  *
  * Registered as SQL `graft_pq_subdists(x, c, m)`.
  */
case class PqSubDists(left: Expression, right: Expression, m: Int)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) if m >= 1 =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_pq_subdists requires two ARRAY<DOUBLE> inputs and m >= 1")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "graft_pq_subdists"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    PqSubDists.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expressions.PqSubDists.compute($a, $b, $m);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqSubDists =
    copy(left = newLeft, right = newRight)
}

object PqSubDists {
  /** Hot loop shared by interpreted and generated code. Component order
    * inside each subspace is ascending index — bit-for-bit the order the
    * composed `aggregate(zip_with(...))` used. */
  def compute(x: ArrayData, c: ArrayData, m: Int): ArrayData = {
    val n = math.min(x.numElements(), c.numElements())
    val sub = n / m
    val out = new Array[Double](m)
    var mi = 0
    while (mi < m) {
      var acc = 0.0
      var j = mi * sub
      val end = j + sub
      while (j < end) {
        val d =
          if (x.isNullAt(j) || c.isNullAt(j)) Double.NaN
          else x.getDouble(j) - c.getDouble(j)
        acc += d * d
        j += 1
      }
      out(mi) = acc
      mi += 1
    }
    new GenericArrayData(out)
  }
}
