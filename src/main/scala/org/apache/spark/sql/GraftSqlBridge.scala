package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Visibility bridge into Spark's `private[sql]` Column ⇄ Expression
  * factories (`org.apache.spark.sql.classic.ExpressionUtils`).
  *
  * The engine's native expressions (graft_dot, graft_ngrams, …) are plain
  * Catalyst `Expression`s; building a `Column` from one previously required
  * a function-registry lookup on `SparkSession.getActiveSession`, which
  * fails on threads without an active session and couples column
  * construction to session state. Constructing the expression directly
  * removes both problems — registration via [[graft.GraftExtensions]] is
  * then only needed for pure-SQL users.
  *
  * This object lives in package `org.apache.spark.sql` solely to satisfy
  * the `private[sql]` scope; it adds no behavior.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
