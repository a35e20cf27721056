package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Element-wise sum of ARRAY<DOUBLE> rows as a single aggregation —
  * `vecsum([a1..ak]) = [Σa1 .. Σak]`.
  *
  * SURVEY.md §7.5 reserved a TypedImperativeAggregate for exactly this
  * shape (the reference's elementwise-array reduce, ALSMeanVector.scala:33,
  * SGD gradient accumulation): the composed alternative is
  * posexplode → groupBy(key, pos) → re-assemble, which costs an extra
  * shuffle and k× the row volume. This aggregate keeps one mutable
  * Array[Double] buffer per group, supports partial aggregation (map-side
  * combine), and serializes the buffer as packed doubles between stages.
  *
  * Null rows are ignored; the first non-null row fixes the length (all
  * engine vectors are fixed-length per model). Empty groups yield null.
  */
case class VectorSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_vecsum requires ARRAY<DOUBLE>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vecsum"

  override def createAggregationBuffer(): Array[Double] = null

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (buffer == null) {
      val fresh = new Array[Double](n)
      var i = 0
      while (i < n) { fresh(i) = arr.getDouble(i); i += 1 }
      fresh
    } else {
      val m = math.min(n, buffer.length)
      var i = 0
      while (i < m) { buffer(i) += arr.getDouble(i); i += 1 }
      buffer
    }
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    if (b1 == null) return b2
    if (b2 == null) return b1
    val m = math.min(b1.length, b2.length)
    var i = 0
    while (i < m) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Double]): Any =
    if (buffer == null) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    if (buffer == null) return Array.emptyByteArray
    val bb = ByteBuffer.allocate(8 * buffer.length)
    buffer.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    if (bytes.isEmpty) return null
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorSumAgg =
    copy(child = newChildren.head)
}
