package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ARRAY<DOUBLE> columns via Catalyst higher-order
  * functions — codegen-friendly, no UDFs (SURVEY.md §2.2 P12).
  *
  * Reference semantics: dot product + axpy-style factor updates computed
  * with per-element Java loops (als-ms/SGD.java:182-207,
  * flink-queryable-client/ALSPredict.java:74-82, als-ms/MSE.java:150-154).
  * Here they are column expressions so Catalyst can pipeline them inside
  * whole-stage codegen.
  *
  * Fold order note: `dot` accumulates left-to-right from 0.0, which matches
  * a left-associated `a1*b1 + a2*b2 + …` in ANSI SQL bit-for-bit — relied on
  * by the DuckDB oracles.
  */
object VectorFunctions {

  /** Σ a_i * b_i — a native codegen expression (see
    * [[graft.functions.expressions.DotProduct]]); bit-identical to the
    * composed `aggregate(zip_with(...))` form it replaced, minus the
    * interpreted-lambda and allocation cost that dominated all-pairs
    * similarity scans. */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    // direct expression construction: no function-registry lookup, so the
    // column can be built on any thread regardless of active session
    // (SQL users still get graft_dot via GraftExtensions)
    column(graft.functions.expressions.DotProduct(
      Cast(expression(a), ArrayType(DoubleType)),
      Cast(expression(b), ArrayType(DoubleType))))
  }

  /** Σ a_i² (no sqrt — exact-compare friendly); same fused loop as [[dot]]. */
  def sqNorm(a: Column): Column = dot(a, a)

  /** All `m` PQ subspace squared-L2 distances in one fused pass — an
    * ARRAY<DOUBLE> of length m (see
    * [[graft.functions.expressions.PqSubDists]]); replaces m separate
    * `aggregate(zip_with(slice, slice))` chains on the PQ encode join. */
  def pqSubDists(a: Column, b: Column, m: Int): Column = {
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    column(graft.functions.expressions.PqSubDists(
      Cast(expression(a), ArrayType(DoubleType)),
      Cast(expression(b), ArrayType(DoubleType)), m))
  }

  /** Element-wise sum AGGREGATE over ARRAY<DOUBLE> rows — one mutable
    * buffer per group with map-side combine (see
    * [[graft.functions.expressions.VectorSumAgg]]); replaces
    * posexplode→per-pos-sum→re-assemble and its extra shuffle. */
  def vecSum(a: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    column(graft.functions.expressions.VectorSumAgg(
      Cast(expression(a), ArrayType(DoubleType)))
      .toAggregateExpression())
  }

  /** [[vecSum]]'s exact-integer twin over ARRAY<BIGINT> rows (see
    * [[graft.functions.expressions.VectorSumLongAgg]]): BIGINT adds are
    * associative, so fixed-point vector sums (the q241 Lloyd lattice)
    * reproduce bit-for-bit under any partitioning. */
  def vecSumLong(a: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.{ArrayType, LongType}
    column(graft.functions.expressions.VectorSumLongAgg(
      Cast(expression(a), ArrayType(LongType)))
      .toAggregateExpression())
  }

  def l2Norm(a: Column): Column = sqrt(sqNorm(a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Cosine with the zero-norm guard: x/0 is NaN in Spark (and NaN sorts
    * ABOVE every real under max), while SQL twins yield NULL — emitting
    * NULL here keeps both engines skipping degenerate vectors identically.
    * ONE definition shared by the retrieval packs; [[cosineOrNullSql]] is
    * its DuckDB twin so the guard convention cannot drift. */
  def cosineOrNull(a: Column, b: Column): Column = {
    val den = l2Norm(a) * l2Norm(b)
    when(den === 0.0, lit(null)).otherwise(dot(a, b) / den)
  }

  /** DuckDB twin of [[cosineOrNull]] over ALREADY-DOUBLE list columns of
    * length `dim` (callers cast FLOAT[] once in a CTE; list_transform +
    * list_sum preserves the same sequential fold order as the engine's
    * array aggregate). */
  def cosineOrNullSql(a: String, b: String, dim: Int): String = {
    def dotS(x: String, y: String) =
      s"list_sum(list_transform(generate_series(1, $dim), i -> $x[i] * $y[i]))"
    val den = s"(sqrt(${dotS(a, a)}) * sqrt(${dotS(b, b)}))"
    s"CASE WHEN $den = 0.0 THEN NULL ELSE ${dotS(a, b)} / $den END"
  }

  /** y + alpha * x, elementwise (the SGD update kernel, SGD.java:193-206). */
  def axpy(alpha: Column, x: Column, y: Column): Column =
    zip_with(x, y, (xi, yi) => yi + alpha * xi)

  def scale(a: Column, s: Column): Column = transform(a, x => x * s)

  def add(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x + y)

  def sub(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x - y)

  /** True iff any component is NaN (P11 NaN guard, SGDV0.java:207-226). */
  def anyNaN(a: Column): Column =
    exists(a, x => isnan(x))

  /** Cast an ARRAY<FLOAT> column (e.g. embeddings) to ARRAY<DOUBLE>. */
  def toDoubleArray(a: Column): Column = a.cast("array<double>")
}
