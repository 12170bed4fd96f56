package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  * Spark 4's classic helpers (`classic.ExpressionUtils.column/expression`)
  * are `private[sql]`, so this one-file shim lives in the sql package to
  * re-export them — the standard extension-library technique; no Spark
  * internals are modified or shadowed. */
object GraftColumnBridge {
  def columnOf(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expressionOf(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
