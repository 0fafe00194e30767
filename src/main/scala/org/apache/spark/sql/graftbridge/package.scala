package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the classic Column ↔ Expression converters, which are
  * `private[sql]` in Spark 4 — the one sanctioned way for an external
  * library to wrap a custom Catalyst Expression as a user-facing Column
  * without registering it in a session's FunctionRegistry first. */
package object graftbridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
