package graft.functions.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Probe a serialized count-min sketch (the BINARY produced by Spark's
  * built-in `count_min_sketch` aggregate) for a string item's estimated
  * count. The item is hashed from its UTF-8 bytes — the same bytes the
  * aggregate feeds the sketch for STRING columns — so estimates line up
  * with what was added.
  *
  * Intended for probing SMALL row sets (a top-k list cross-joined against
  * the one-row sketch): each distinct sketch blob is deserialized once per
  * thread, then probes are O(depth). The per-thread memo is keyed on the
  * blob CONTENT (identity first as a fast path, then length + byte
  * equality): rows materialized from UnsafeRow/columnar scans hand each
  * access a fresh byte[], so an identity-only key would re-deserialize per
  * row. The content check is a memcmp — far cheaper than readFrom. For
  * corpus-wide probes, deserialize once into a broadcast variable instead
  * of routing the blob through a join.
  *
  * CodegenFallback is deliberate: the work is the sketch probe itself, and
  * the expression sits outside any hot scan loop by design.
  */
case class CmsLookup(sketch: Expression, item: Expression)
  extends BinaryExpression with CodegenFallback {

  override def left: Expression = sketch
  override def right: Expression = item

  // a foldable sketch (lit(bytes) — the broadcast-variable shape) parses
  // once per expression instance; the per-thread content memo below stays
  // the fallback for blobs routed through joins
  @transient private lazy val staticSketch: CountMinSketch =
    if (sketch.foldable) {
      val v = sketch.eval()
      if (v == null) null
      else CountMinSketch.readFrom(
        new ByteArrayInputStream(v.asInstanceOf[Array[Byte]]))
    } else null

  override def checkInputDataTypes(): TypeCheckResult =
    (sketch.dataType, item.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"graft_cms_probe requires (BINARY sketch, STRING item), got " +
          s"(${s.simpleString}, ${i.simpleString})")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_cms_probe"

  override protected def nullSafeEval(sketchBytes: Any, itemVal: Any): Any = {
    if (staticSketch != null)
      return staticSketch.estimateCount(
        itemVal.asInstanceOf[UTF8String].getBytes)
    val bytes = sketchBytes.asInstanceOf[Array[Byte]]
    val cached = CmsLookup.lastSketch.get()
    val cms =
      if (cached != null &&
          ((cached._1 eq bytes) || java.util.Arrays.equals(cached._1, bytes)))
        cached._2
      else {
        val parsed = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
        CmsLookup.lastSketch.set((bytes, parsed))
        parsed
      }
    cms.estimateCount(itemVal.asInstanceOf[UTF8String].getBytes)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsLookup =
    copy(sketch = newLeft, item = newRight)
}

object CmsLookup {
  private val lastSketch =
    new ThreadLocal[(Array[Byte], CountMinSketch)] {
      override def initialValue(): (Array[Byte], CountMinSketch) = null
    }
}
