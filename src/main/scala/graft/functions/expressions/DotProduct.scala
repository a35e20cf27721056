package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen dot product over two ARRAY<DOUBLE> columns.
  *
  * The composed form `aggregate(zip_with(a, b, _*_), 0.0, _+_)` is
  * CodegenFallback in Spark — every pair evaluates interpreted lambdas and
  * allocates an intermediate array, which dominates the all-pairs similarity
  * operators (SURVEY.md §7.5 reserved this expression for exactly that
  * case). This fused loop runs inside whole-stage codegen with zero
  * allocation.
  *
  * Arithmetic is bit-identical to the composed form: left-to-right
  * accumulation from 0.0 of `a(i) * b(i)` — the DuckDB oracles rely on that
  * order. Semantics differ from zip_with only for unequal lengths (zip_with
  * null-pads → null result; here the shorter prefix wins) — all engine
  * vectors are fixed-length per model, so the case never arises.
  *
  * Registered as SQL function `graft_dot` by [[graft.GraftExtensions]]; the
  * builder inserts casts, so inputs here are always ARRAY<DOUBLE>.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires ARRAY<DOUBLE> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  /** Always nullable: a null ARRAY ELEMENT nulls the result even when both
    * array columns are non-nullable. Without this override, nullSafeCodeGen
    * would fold ev.isNull to a constant for non-nullable children and the
    * generated assignment below would not compile — silently dropping the
    * whole plan out of codegen. */
  override def nullable: Boolean = true

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      // a null element nulls the whole product — matches the composed
      // zip_with/aggregate form (null * x = null, acc + null = null)
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
