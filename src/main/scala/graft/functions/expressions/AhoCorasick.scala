package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring search — the blocklist screen of a corpus
  * pipeline. Returns the sorted distinct indices of the patterns that
  * occur in the text (empty array = clean document).
  *
  * Why not `OR`-chained LIKE / regex alternation: both are O(patterns)
  * work per character (a 10k-phrase unsafe-content blocklist makes the
  * scan 10,000× a single LIKE), and regex alternation additionally pays
  * backtracking. An Aho–Corasick automaton matches ALL patterns in one
  * pass: O(bytes + hits) regardless of pattern count. The automaton is
  * built once on the driver and ships to executors as a codegen
  * reference object; matching is byte-level on UTF-8, which for valid
  * UTF-8 equals string-level substring search.
  *
  * Semantics: case-sensitive substring containment, identical to
  * `patterns.zipWithIndex.filter(p => text.contains(p._1)).map(_._2)`.
  * NULL text null-propagates; empty/null patterns are dropped at
  * construction (an empty needle matches everything and means a
  * misconfigured blocklist — refuse loudly instead).
  *
  * Registered as SQL `graft_ac_hits(text, array('bad phrase', …))`.
  */
case class AcHits(child: Expression, patterns: Seq[String])
  extends UnaryExpression {

  require(patterns.nonEmpty, "graft_ac_hits requires at least one pattern")
  require(patterns.forall(p => p != null && p.nonEmpty),
    "graft_ac_hits patterns must be non-null and non-empty")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_ac_hits requires STRING input")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_ac_hits"

  @transient private lazy val automaton: AcAutomaton =
    AcAutomaton.build(patterns)

  override protected def nullSafeEval(text: Any): Any =
    automaton.search(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AcAutomaton].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $acRef.search($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): AcHits =
    copy(child = newChild)
}

/** Dense-table Aho–Corasick automaton over the byte alphabet.
  *
  * `next` is the goto function completed with failure transitions during
  * the BFS (Aho & Corasick 1975, §6): one array lookup per input byte,
  * no failure-chain walking at match time. `out(state)` lists the
  * pattern indices whose occurrence ends at `state` (failure-closure
  * pre-merged). Memory is `states × 256` ints — a few KB for a phrase
  * blocklist, ~100 MB for a 10k-phrase list, built once per query and
  * shared per-executor via the codegen reference object.
  */
final class AcAutomaton private (
    next: Array[Array[Int]],
    out: Array[Array[Int]],
    val nPatterns: Int) extends Serializable {

  /** Sorted distinct indices of patterns occurring in `text`. */
  def search(text: UTF8String): GenericArrayData = {
    val bytes = text.getBytes
    val seen = new Array[Boolean](nPatterns)
    var nSeen = 0
    var s = 0
    var i = 0
    val n = bytes.length
    while (i < n && nSeen < nPatterns) {
      s = next(s)(bytes(i) & 0xff)
      val o = out(s)
      var j = 0
      while (j < o.length) {
        if (!seen(o(j))) { seen(o(j)) = true; nSeen += 1 }
        j += 1
      }
      i += 1
    }
    val res = new Array[Int](nSeen)
    var k = 0
    var p = 0
    while (p < nPatterns) {
      if (seen(p)) { res(k) = p; k += 1 }
      p += 1
    }
    new GenericArrayData(res)
  }
}

object AcAutomaton {

  def build(patterns: Seq[String]): AcAutomaton = {
    val pats = patterns.map(_.getBytes("UTF-8")).toArray
    // trie over bytes: goto(state)(byte) = child or -1
    val goto = scala.collection.mutable.ArrayBuffer(Array.fill(256)(-1))
    val outSets = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.TreeSet.empty[Int])
    pats.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { b =>
        val c = b & 0xff
        if (goto(s)(c) == -1) {
          goto(s)(c) = goto.length
          goto += Array.fill(256)(-1)
          outSets += scala.collection.mutable.TreeSet.empty[Int]
        }
        s = goto(s)(c)
      }
      outSets(s) += pi
    }
    // BFS: failure links, output closure, and goto completion in place —
    // after this, goto IS the next() function (no -1 entries remain)
    val fail = new Array[Int](goto.length)
    val queue = scala.collection.mutable.Queue.empty[Int]
    (0 until 256).foreach { c =>
      val u = goto(0)(c)
      if (u == -1) goto(0)(c) = 0
      else { fail(u) = 0; queue.enqueue(u) }
    }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      outSets(u) ++= outSets(fail(u))
      (0 until 256).foreach { c =>
        val v = goto(u)(c)
        if (v == -1) goto(u)(c) = goto(fail(u))(c)
        else { fail(v) = goto(fail(u))(c); queue.enqueue(v) }
      }
    }
    new AcAutomaton(goto.toArray, outSets.map(_.toArray).toArray, pats.length)
  }
}
