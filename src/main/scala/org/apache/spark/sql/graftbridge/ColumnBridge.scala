package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 decouples the public Column API
  * from Catalyst expressions and gates the converters `private[sql]`;
  * custom native expressions still need both directions, so this lives
  * inside the sql package tree (the conventional extension-point
  * pattern). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
