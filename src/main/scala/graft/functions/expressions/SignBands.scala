package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Random-hyperplane LSH band keys over an ARRAY<DOUBLE> vector, fused.
  *
  * The composed form — `array(band_0, …, band_{B-1})` where every band key
  * sums `bitsPerBand` expressions of `when(graft_dot(vec, lit(plane)) >= 0,
  * 1, 0) * 2^j` — materializes `bands × bitsPerBand` separate dot-product
  * expressions in one Project (128 at the defaults). That blows the
  * generated method past the JIT-friendly size, forces splitExpressions /
  * codegen fallback, and re-reads the input array once per plane. This
  * expression computes all projections in ONE compiled loop over a single
  * flat plane matrix: one pass per (plane, element), one output allocation.
  *
  * The hyperplane matrix derives from `seed` alone (Gaussian via
  * `scala.util.Random`, drawn plane-major then element-major — the same
  * order the composed form used), so band keys are deterministic and the
  * expression's arguments stay scalar (clean semantic equality; the matrix
  * is rebuilt lazily per JVM, never serialized in the plan).
  *
  * Semantics per projection match [[DotProduct]]: left-to-right
  * accumulation; the shorter of (dim, vec length) wins; a null ELEMENT
  * nulls the whole result (engine vectors are never element-null).
  */
case class SignBands(child: Expression, dim: Int, bands: Int,
                     bitsPerBand: Int, seed: Long)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _)
      if dim >= 1 && bands >= 1 && bitsPerBand >= 1 && bitsPerBand <= 30 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_sign_bands requires ARRAY<DOUBLE> input, dim/bands/bits >= 1, bits <= 30")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  /** Null element inside the vector nulls the result (see DotProduct). */
  override def nullable: Boolean = true

  override def prettyName: String = "graft_sign_bands"

  /** Flat plane matrix, `(bands*bitsPerBand) × dim`, plane-major. */
  @transient lazy val flatPlanes: Array[Double] = SignBands.planes(dim, bands, bitsPerBand, seed)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(dim, v.numElements())
    val keys = new Array[Int](bands)
    var b = 0
    while (b < bands) {
      var key = 0
      var j = 0
      while (j < bitsPerBand) {
        val off = (b * bitsPerBand + j) * dim
        var acc = 0.0
        var d = 0
        while (d < n) {
          if (v.isNullAt(d)) return null
          acc += v.getDouble(d) * flatPlanes(off + d)
          d += 1
        }
        if (acc >= 0) key |= (1 << j)
        j += 1
      }
      keys(b) = key
      b += 1
    }
    new GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("graftSignPlanes", flatPlanes, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val keys = ctx.freshName("keys")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val off = ctx.freshName("off")
      val acc = ctx.freshName("acc")
      val key = ctx.freshName("key")
      val nullHit = ctx.freshName("nullHit")
      s"""
         |int $n = java.lang.Math.min($dim, $a.numElements());
         |int[] $keys = new int[$bands];
         |boolean $nullHit = false;
         |for (int $b = 0; $b < $bands && !$nullHit; $b++) {
         |  int $key = 0;
         |  for (int $j = 0; $j < $bitsPerBand && !$nullHit; $j++) {
         |    int $off = ($b * $bitsPerBand + $j) * $dim;
         |    double $acc = 0.0;
         |    for (int $d = 0; $d < $n; $d++) {
         |      if ($a.isNullAt($d)) { $nullHit = true; break; }
         |      $acc += $a.getDouble($d) * $planesRef[$off + $d];
         |    }
         |    if (!$nullHit && $acc >= 0) $key |= (1 << $j);
         |  }
         |  $keys[$b] = $key;
         |}
         |${ev.isNull} = $nullHit;
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SignBands =
    copy(child = newChild)
}

object SignBands {
  /** Seeded Gaussian hyperplanes, flat plane-major layout. Draw order is
    * identical to the composed form's
    * `Array.fill(bands*bits)(Seq.fill(dim)(rnd.nextGaussian()))`. */
  def planes(dim: Int, bands: Int, bitsPerBand: Int, seed: Long): Array[Double] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bands * bitsPerBand * dim)(rnd.nextGaussian())
  }
}
