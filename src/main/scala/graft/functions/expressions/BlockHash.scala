package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType}

/** Block-mean perceptual hash of a BINARY payload —
  * `graft_blockhash(bytes, bits) -> BIGINT`.
  *
  * The payload is cut into `bits` equal spans; bit i is set iff span i's
  * mean byte value exceeds the whole payload's mean. The media analog of
  * SimHash: identical payloads collide exactly, and small edits (a few
  * bytes appended or flipped) shift every span boundary by at most a few
  * bytes, moving few span means across the global mean — so re-encoded or
  * lightly-corrupted copies land within a small Hamming distance, which
  * the banded search ([[graft.operators.Dedup.hammingNearDup]]) finds
  * without an all-pairs scan. This is aHash's shape with byte spans in
  * place of image blocks; a real image pipeline would decode first
  * (Multimodal's decode extension point) and hash the pixel matrix.
  *
  * Deterministic, scan-stage, O(payload) per row. `bits` must be a
  * literal in 1..64. Payloads shorter than `bits` bytes hash to NULL
  * (too little signal to band on; null band keys drop out of the
  * candidate equi-join naturally).
  *
  * Like every mean-threshold hash (aHash included), CONSTANT or
  * near-constant payloads collapse to the all-zero signature and pair
  * with each other at Hamming 0 — flat media genuinely is mutually
  * near-duplicate under this feature, but callers deduplicating mixed
  * corpora should screen flat payloads (e.g. a byte-variance floor) if
  * that grouping is unwanted.
  */
case class BlockHash(child: Expression, bits: Expression)
  extends BinaryExpression with CodegenFallback {

  override def left: Expression = child
  override def right: Expression = bits

  private lazy val nBits: Int = bits.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != BinaryType)
      return TypeCheckResult.TypeCheckFailure(
        s"graft_blockhash requires BINARY, got ${child.dataType.simpleString}")
    if (bits.dataType != IntegerType || !bits.foldable)
      return TypeCheckResult.TypeCheckFailure(
        "graft_blockhash requires a literal INT bit count")
    bits.eval() match {
      case null => TypeCheckResult.TypeCheckFailure(
        "graft_blockhash bit count must not be NULL")
      case n: Number if n.intValue() < 1 || n.intValue() > 64 =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_blockhash bits must be in 1..64, got ${n.intValue()}")
      case _ => TypeCheckResult.TypeCheckSuccess
    }
  }

  override def dataType: DataType = LongType
  // null even for non-null input (short payloads), so always nullable
  override def nullable: Boolean = true
  override def prettyName: String = "graft_blockhash"

  override protected def nullSafeEval(payload: Any, bitsVal: Any): Any = {
    val bytes = payload.asInstanceOf[Array[Byte]]
    val n = bytes.length
    if (n < nBits) return null
    var total = 0L
    var i = 0
    while (i < n) { total += (bytes(i) & 0xff); i += 1 }
    val globalMean = total.toDouble / n
    var sig = 0L
    var b = 0
    while (b < nBits) {
      // span [start, end): boundaries by integer scaling, so spans differ
      // in length by at most one byte and cover the payload exactly
      val start = (b.toLong * n / nBits).toInt
      val end = ((b + 1).toLong * n / nBits).toInt
      var s = 0L
      var j = start
      while (j < end) { s += (bytes(j) & 0xff); j += 1 }
      if (s.toDouble / (end - start) > globalMean) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BlockHash =
    copy(child = newLeft, bits = newRight)
}
