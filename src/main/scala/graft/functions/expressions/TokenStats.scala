package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass token statistics over a text column:
  *
  *   - `ws_tokens`      — maximal runs of non-whitespace
  *                        (== `size(split(text, "\\s+"))` minus empties)
  *   - `alpha_tokens`   — maximal `[a-zA-Z]+` runs
  *   - `bpe_tokens`     — BPE-ish segmentation count: `[a-zA-Z]+` runs +
  *                        `[0-9]+` runs + one per other non-space char
  *                        (== the regex `[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]`)
  *   - `nonspace_chars` — code points not in `\s`
  *                        (== `length(regexp_replace(text, "\\s+", ""))`)
  *
  * The regex forms run three separate `regexp_extract_all` passes, each
  * materializing an array of matched tokens just to count them — q22 spent
  * 9.8 s of the round-1 driver bench there. This is one scan over the
  * UTF-8 bytes, no allocation beyond the 4-field result row, and the same
  * fields feed the quality-score features (token count, non-space length)
  * so the curation path shares the scan.
  *
  * Character classes are ASCII like the Java/RE2 regexes they replace:
  * whitespace is `[ \t\n\x0B\f\r]`, alpha `[a-zA-Z]`, digit `[0-9]`; any
  * other code point (including all non-ASCII) is an "other" char. UTF-8
  * continuation bytes are skipped so multi-byte code points count once.
  *
  * Registered as SQL function `graft_token_stats(text)`.
  */
case class TokenStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_token_stats requires STRING input")
  }

  override def dataType: DataType = TokenStats.schema

  override def prettyName: String = "graft_token_stats"

  override protected def nullSafeEval(s: Any): Any =
    TokenStats.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.TokenStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
}

object TokenStats {

  val schema: StructType = StructType(Seq(
    StructField("ws_tokens", IntegerType, nullable = false),
    StructField("alpha_tokens", IntegerType, nullable = false),
    StructField("bpe_tokens", IntegerType, nullable = false),
    StructField("nonspace_chars", IntegerType, nullable = false)))

  // character classes
  private final val SPACE = 0
  private final val ALPHA = 1
  private final val DIGIT = 2
  private final val OTHER = 3

  /** Hot loop shared by interpreted and generated code. */
  def compute(s: UTF8String): InternalRow = {
    var ws = 0
    var alpha = 0
    var digit = 0
    var other = 0
    var nonspace = 0
    var prev = SPACE
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if ((b & 0x80) == 0) { // ASCII
        val c = b.toChar
        val cls =
          if (c == ' ' || (c >= '\t' && c <= '\r')) SPACE // \t \n \x0B \f \r
          else if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) ALPHA
          else if (c >= '0' && c <= '9') DIGIT
          else OTHER
        if (cls != SPACE) {
          nonspace += 1
          if (prev == SPACE) ws += 1
        }
        if (cls == ALPHA && prev != ALPHA) alpha += 1
        if (cls == DIGIT && prev != DIGIT) digit += 1
        if (cls == OTHER) other += 1
        prev = cls
      } else if ((b & 0xC0) != 0x80) { // non-ASCII lead byte: one code point
        nonspace += 1
        if (prev == SPACE) ws += 1
        other += 1
        prev = OTHER
      } // continuation bytes: skip
      i += 1
    }
    new GenericInternalRow(
      Array[Any](ws, alpha, alpha + digit + other, nonspace))
  }
}
