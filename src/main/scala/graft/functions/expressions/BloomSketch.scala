package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter build aggregate over STRING rows —
  * `graft_bloom_agg(item, capacity, fpp) -> BINARY`.
  *
  * The scale path for set membership: an anti-join against a reference
  * corpus shuffles the probe side on the join key, but a Bloom filter of
  * the reference is a few hundred KB that BROADCASTS, turning
  * decontamination / cross-corpus dedup membership into a scan-stage
  * filter with zero false NEGATIVES (a true member always hits — the
  * guarantee dedup needs; false positives only over-remove at rate fpp).
  * Spark's own runtime-filter pushdown uses exactly this sketch
  * (`org.apache.spark.util.sketch.BloomFilter`); exposing it as a named
  * aggregate makes the pattern available to queries directly.
  *
  * Deterministic: bit positions depend only on the item bytes and the bit
  * count (fixed by the literal capacity/fpp), and merging partial buffers
  * is a bitwise OR — partitioning and row order cannot change the result.
  *
  * Capacity and fpp must be foldable (the bit width has to agree across
  * every partial buffer or merge is undefined). Null items are skipped.
  */
case class BloomBuildAgg(
    child: Expression,
    capacity: Expression,
    fpp: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] {

  override def children: Seq[Expression] = Seq(child, capacity, fpp)

  private lazy val cap: Long = capacity.eval().asInstanceOf[Number].longValue()
  private lazy val err: Double = fpp.eval().asInstanceOf[Number].doubleValue()

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != StringType)
      return TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_agg requires a STRING item, got ${child.dataType.simpleString}")
    if (!capacity.foldable || !fpp.foldable)
      return TypeCheckResult.TypeCheckFailure(
        "graft_bloom_agg capacity and fpp must be literals")
    (capacity.dataType, fpp.dataType) match {
      case (IntegerType | LongType, DoubleType) =>
        // validate the VALUES during analysis — BloomFilter.create would
        // otherwise throw inside executor buffer creation with a stack
        // trace that never mentions this function
        (capacity.eval(), fpp.eval()) match {
          case (null, _) | (_, null) => TypeCheckResult.TypeCheckFailure(
            "graft_bloom_agg capacity and fpp must not be NULL")
          case (c: Number, _) if c.longValue() <= 0 =>
            TypeCheckResult.TypeCheckFailure(
              s"graft_bloom_agg capacity must be positive, got ${c.longValue()}")
          case (_, f: Number) if f.doubleValue() <= 0.0 || f.doubleValue() >= 1.0 =>
            TypeCheckResult.TypeCheckFailure(
              s"graft_bloom_agg fpp must be in (0, 1), got ${f.doubleValue()}")
          case _ => TypeCheckResult.TypeCheckSuccess
        }
      case (c, f) => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_agg requires (item STRING, capacity INT/LONG, fpp DOUBLE), " +
          s"got (${child.dataType.simpleString}, ${c.simpleString}, ${f.simpleString})")
    }
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom_agg"

  override def createAggregationBuffer(): BloomFilter = BloomFilter.create(cap, err)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buffer.putBinary(v.asInstanceOf[UTF8String].getBytes)
    buffer
  }

  override def merge(b1: BloomFilter, b2: BloomFilter): BloomFilter =
    b1.mergeInPlace(b2)

  override def eval(buffer: BloomFilter): Any = serialize(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buffer.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomBuildAgg =
    copy(child = newChildren(0), capacity = newChildren(1), fpp = newChildren(2))
}

/** Probe a serialized Bloom filter for a STRING item —
  * `graft_bloom_probe(sketch, item) -> BOOLEAN`. Hashes the item's UTF-8
  * bytes, matching what [[BloomBuildAgg]] inserted.
  *
  * A FOLDABLE sketch (a `lit(bytes)` column — the streaming-screen and
  * broadcast-variable shape) is deserialized exactly once per expression
  * instance and probes are O(hash count). A non-foldable sketch (e.g.
  * the one-row cross join) falls back to a per-thread memo keyed on
  * CONTENT (identity fast path, then length + byte equality, same
  * rationale as [[CmsLookup]]: columnar scans hand each access a fresh
  * byte[], so identity alone never hits) — sound, but the validating
  * memcmp is O(sketch size) per row, so prefer the literal shape for
  * corpus-wide probes. */
case class BloomProbe(sketch: Expression, item: Expression)
  extends BinaryExpression with CodegenFallback {

  override def left: Expression = sketch
  override def right: Expression = item

  @transient private lazy val staticFilter: BloomFilter =
    if (sketch.foldable) {
      val v = sketch.eval()
      if (v == null) null
      else BloomFilter.readFrom(
        new ByteArrayInputStream(v.asInstanceOf[Array[Byte]]))
    } else null

  override def checkInputDataTypes(): TypeCheckResult =
    (sketch.dataType, item.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_probe requires (BINARY sketch, STRING item), got " +
          s"(${s.simpleString}, ${i.simpleString})")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_probe"

  override protected def nullSafeEval(sketchBytes: Any, itemVal: Any): Any = {
    if (staticFilter != null)
      return staticFilter.mightContainBinary(
        itemVal.asInstanceOf[UTF8String].getBytes)
    val bytes = sketchBytes.asInstanceOf[Array[Byte]]
    val cached = BloomProbe.lastSketch.get()
    val bf =
      if (cached != null &&
          ((cached._1 eq bytes) || java.util.Arrays.equals(cached._1, bytes)))
        cached._2
      else {
        val parsed = BloomFilter.readFrom(new ByteArrayInputStream(bytes))
        BloomProbe.lastSketch.set((bytes, parsed))
        parsed
      }
    bf.mightContainBinary(itemVal.asInstanceOf[UTF8String].getBytes)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomProbe =
    copy(sketch = newLeft, item = newRight)
}

object BloomProbe {
  private val lastSketch =
    new ThreadLocal[(Array[Byte], BloomFilter)] {
      override def initialValue(): (Array[Byte], BloomFilter) = null
    }
}
