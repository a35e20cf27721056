package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def arr(xs: Double*) = array(xs.map(lit): _*)

  test("dot product matches hand computation") {
    val got = Seq(1).toDF("x")
      .select(dot(arr(1.0, 2.0, 3.0), arr(4.0, 5.0, 6.0)).as("d"))
      .head().getDouble(0)
    assert(got === 1 * 4 + 2 * 5 + 3 * 6.0)
  }

  test("axpy: y + alpha*x") {
    val got = Seq(1).toDF("x")
      .select(axpy(lit(0.5), arr(2.0, 4.0), arr(1.0, 1.0)).as("v"))
      .head().getSeq[Double](0)
    assert(got === Seq(2.0, 3.0))
  }

  test("cosine of identical vectors is 1") {
    val got = Seq(1).toDF("x")
      .select(cosine(arr(1.0, 2.0), arr(1.0, 2.0)).as("c"))
      .head().getDouble(0)
    assert(math.abs(got - 1.0) < 1e-12)
  }

  test("anyNaN flags NaN components") {
    val got = Seq(1).toDF("x").select(
      anyNaN(arr(1.0, Double.NaN)).as("a"),
      anyNaN(arr(1.0, 2.0)).as("b")).head()
    assert(got.getBoolean(0) && !got.getBoolean(1))
  }
}
