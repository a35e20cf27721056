package graft.functions.expressions

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression ratio of a text column: deflate(utf8 bytes).length /
  * utf8 bytes.length — the classic corpus quality signal (natural prose
  * sits in a narrow band; boilerplate, repeated spans, and template spam
  * compress far below it, binary junk compresses above 1.0).
  *
  * Fixed deflate parameters (level 6, raw/nowrap) make the value a pure
  * function of the bytes, so it is deterministic across runs and
  * partitionings. It is NOT ANSI-SQL-expressible — the driver query built
  * on it emits aggregate quality gates its oracle can pin instead of raw
  * ratios (see PipelinePack), and the per-doc behavior is asserted in
  * PipelineSpec.
  *
  * CodegenFallback is deliberate: the per-row cost is the deflate call
  * itself; codegen would only inline the dispatch around it. One Deflater
  * per thread, `reset()` between rows: per-row allocate/end would pay
  * native init/teardown twice per document on the corpus-scan hot path,
  * and the thread-local keeps zlib native memory bounded by the executor
  * thread pool instead of the GC's mood.
  */
case class DeflateRatio(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_zratio requires STRING input, got ${t.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_zratio"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    if (bytes.isEmpty) return 1.0
    val d = DeflateRatio.deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / bytes.length
  }

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

object DeflateRatio {
  /** Fixed parameters (level 6, raw deflate) are part of the signal's
    * definition — changing them changes every stored ratio. */
  private[expressions] val deflaters: ThreadLocal[Deflater] =
    ThreadLocal.withInitial(() => new Deflater(6, true))
}
