package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of tokens present in a small fixed vocabulary — the stopword /
  * language-profile counting kernel behind language-ID and quality scoring.
  *
  * The composed form — `size(filter(toks, t => t.isin(words: _*)))` — runs
  * an interpreted higher-order filter with a linear In-list probe per
  * token and materializes the filtered array just to take its size. Over a
  * corpus scan (q20 evaluates it once per language profile per document)
  * that interpreted loop dominated the round-1 bench. This is one codegen
  * hash-set probe per token, no allocation.
  *
  * Semantics match the composed form for the engine's tokenizers: null
  * tokens never match (they are not in the set), a NULL array
  * null-propagates.
  *
  * Registered as SQL function `graft_vocab_hits(tokens, array('a','b'))`.
  */
case class VocabHits(child: Expression, vocab: Seq[String])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_vocab_hits requires ARRAY<STRING> input")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_vocab_hits"

  @transient private lazy val vocabSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](vocab.size * 2)
    vocab.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override protected def nullSafeEval(arr: Any): Any =
    VocabHits.count(arr.asInstanceOf[ArrayData], vocabSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("vocabSet", vocabSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.expressions.VocabHits.count($a, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): VocabHits =
    copy(child = newChild)
}

object VocabHits {
  /** Hot loop shared by interpreted and generated code. */
  def count(a: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    var c = 0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (!a.isNullAt(i) && set.contains(a.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }
}
