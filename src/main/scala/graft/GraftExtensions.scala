package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expressions.{AcHits, BlockHash, BloomBuildAgg, BloomProbe, CmsLookup, DeflateRatio, DotProduct, FoldAccents, LcsLen, PqSubDists, TokenStats, VectorSumAgg, VocabHits, WordNgrams}

/** SparkSessionExtensions entry point — makes the engine's native
  * expressions available to pure-SQL users:
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *   SELECT graft_dot(a.vec, b.vec) FROM ...
  *
  * Scala users get the same expressions through
  * [[graft.functions.VectorFunctions]] without any session config.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot takes exactly 2 arguments")
        // accept ARRAY<FLOAT|DOUBLE>: insert the cast the analyzer would
        val cast = args.map(a =>
          org.apache.spark.sql.catalyst.expressions.Cast(
            a, org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.DoubleType)))
        DotProduct(cast.head, cast(1))
      }),
    (FunctionIdentifier("graft_vecsum"),
      new ExpressionInfo(classOf[VectorSumAgg].getName, "graft_vecsum"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_vecsum takes exactly 1 argument")
        VectorSumAgg(org.apache.spark.sql.catalyst.expressions.Cast(
          args.head, org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)))
      }),
    (FunctionIdentifier("graft_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "graft_ngrams"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_ngrams takes exactly 2 arguments")
        WordNgrams(args.head, args(1))
      }),
    (FunctionIdentifier("graft_token_stats"),
      new ExpressionInfo(classOf[TokenStats].getName, "graft_token_stats"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_token_stats takes exactly 1 argument")
        TokenStats(args.head)
      }),
    (FunctionIdentifier("graft_zratio"),
      new ExpressionInfo(classOf[DeflateRatio].getName, "graft_zratio"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_zratio takes exactly 1 argument")
        DeflateRatio(args.head)
      }),
    (FunctionIdentifier("graft_cms_probe"),
      new ExpressionInfo(classOf[CmsLookup].getName, "graft_cms_probe"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_cms_probe takes exactly 2 arguments")
        CmsLookup(args.head, args(1))
      }),
    (FunctionIdentifier("graft_blockhash"),
      new ExpressionInfo(classOf[BlockHash].getName, "graft_blockhash"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_blockhash takes exactly 2 arguments")
        BlockHash(args.head, args(1))
      }),
    (FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomBuildAgg].getName, "graft_bloom_agg"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "graft_bloom_agg takes exactly 3 arguments")
        BloomBuildAgg(args.head, args(1), args(2))
      }),
    (FunctionIdentifier("graft_bloom_probe"),
      new ExpressionInfo(classOf[BloomProbe].getName, "graft_bloom_probe"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_bloom_probe takes exactly 2 arguments")
        BloomProbe(args.head, args(1))
      }),
    (FunctionIdentifier("graft_pq_subdists"),
      new ExpressionInfo(classOf[PqSubDists].getName, "graft_pq_subdists"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "graft_pq_subdists takes exactly 3 arguments")
        require(args(2).foldable, "graft_pq_subdists requires a literal m")
        val m = args(2).eval(null) match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"graft_pq_subdists m must be an integer literal, got $other")
        }
        val cast = args.take(2).map(a =>
          org.apache.spark.sql.catalyst.expressions.Cast(
            a, org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.DoubleType)))
        PqSubDists(cast.head, cast(1), m)
      }),
    (FunctionIdentifier("graft_fold_accents"),
      new ExpressionInfo(classOf[FoldAccents].getName, "graft_fold_accents"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_fold_accents takes exactly 1 argument")
        FoldAccents(args.head)
      }),
    (FunctionIdentifier("graft_lcs"),
      new ExpressionInfo(classOf[LcsLen].getName, "graft_lcs"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_lcs takes exactly 2 arguments")
        LcsLen(args.head, args(1))
      }),
    (FunctionIdentifier("graft_ac_hits"),
      new ExpressionInfo(classOf[AcHits].getName, "graft_ac_hits"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_ac_hits takes exactly 2 arguments")
        require(args(1).foldable,
          "graft_ac_hits requires a literal pattern array")
        val arr = args(1).eval(null)
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        require(arr != null && arr.numElements() > 0,
          "graft_ac_hits requires at least one pattern")
        val pats = (0 until arr.numElements()).map { i =>
          require(!arr.isNullAt(i), "graft_ac_hits patterns must be non-null")
          arr.getUTF8String(i).toString
        }
        AcHits(args.head, pats)
      }),
    (FunctionIdentifier("graft_vocab_hits"),
      new ExpressionInfo(classOf[VocabHits].getName, "graft_vocab_hits"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_vocab_hits takes exactly 2 arguments")
        require(args(1).foldable,
          "graft_vocab_hits requires a literal vocabulary array")
        val arr = args(1).eval(null)
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val words =
          if (arr == null) Seq.empty[String]
          else (0 until arr.numElements()).flatMap(i =>
            if (arr.isNullAt(i)) None else Some(arr.getUTF8String(i).toString))
        VocabHits(args.head, words)
      }))

  /** Register the native functions on an existing session (for sessions
    * built without the spark.sql.extensions config — tests, Verify, Bench).
    * Idempotent and conf-free: column builders auto-call this, so it must
    * not have session-wide side effects beyond the registry. */
  def register(spark: SparkSession): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    functions.foreach { case (ident, info, builder) =>
      if (!registry.functionExists(ident)) {
        registry.registerFunction(ident, info, builder)
      }
    }
  }

  /** Full session preparation: functions + the session conf the engine's
    * sources rely on (the driver events table carries TIMESTAMP(NANOS)).
    * Called once per session at a deliberate setup point — the
    * SparkEntry.queries wrapper and the test/CLI session builders — NOT
    * from column builders. */
  def prepareSession(spark: SparkSession): Unit = {
    register(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
  }
}
