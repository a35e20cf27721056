package graft.functions.expressions

import java.text.Normalizer
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text canonicalization: NFD-decompose, strip combining marks
  * (the accents), recompose to NFC. `café` / `café` / `CAFÉ`.lower
  * all fold to `cafe` — the normalization step every multilingual corpus
  * dedup runs before hashing, so byte-different but visually-identical
  * strings land in the same dedup bucket.
  *
  * Matches DuckDB's `strip_accents(nfc_normalize(x))` on Latin-script
  * input (both strip the Mn combining class from the canonical
  * decomposition), which is what the q131 oracle uses.
  *
  * Codegen'd via a static call: the kernel is one ASCII fast path (the
  * overwhelmingly common case in a web corpus scans bytes only — no
  * Normalizer, no regex, returns the input buffer unchanged) and a slow
  * path for rows that actually carry non-ASCII.
  */
case class FoldAccents(child: Expression) extends UnaryExpression {

  // NullType admits SQL's untyped NULL literal (nullSafeEval is then
  // never reached); ImplicitCastInputTypes would be the built-in way,
  // but its AbstractDataType signature is private[sql].
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_fold_accents requires STRING input, got ${t.simpleString}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_fold_accents"

  override protected def nullSafeEval(input: Any): Any =
    FoldAccents.fold(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.FoldAccents.fold($c)")

  override protected def withNewChildInternal(newChild: Expression): FoldAccents =
    copy(child = newChild)
}

object FoldAccents {

  private val marks: Pattern = Pattern.compile("\\p{Mn}+")

  /** Static kernel shared by eval and generated code. */
  def fold(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    val allAscii = {
      var ascii = true
      while (ascii && i < n) { // UTF8String bytes: non-ASCII has the high bit
        if ((s.getByte(i) & 0x80) != 0) ascii = false
        i += 1
      }
      ascii
    }
    if (allAscii) return s // already NFC, no marks to strip
    val str = s.toString
    val decomposed = Normalizer.normalize(str, Normalizer.Form.NFD)
    val stripped = marks.matcher(decomposed).replaceAll("")
    UTF8String.fromString(Normalizer.normalize(stripped, Normalizer.Form.NFC))
  }
}
