package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge between user-facing [[Column]]s and Catalyst [[Expression]]s.
 *
 * Spark 4 moved `Column` to a backend-agnostic representation; the
 * classic (Catalyst) conversions live behind `private[sql]`, so this
 * one-file shim sits in an `org.apache.spark.sql` subpackage — the
 * conventional pattern for Spark-native extension libraries.
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
