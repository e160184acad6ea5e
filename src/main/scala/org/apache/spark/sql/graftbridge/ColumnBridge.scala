package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public Column(expr)/col.expr surface; the supported
  * conversion lives in `org.apache.spark.sql.classic.ExpressionUtils`, which
  * is private[sql]. This bridge (in the sql package namespace, the standard
  * pattern for Spark extension libraries) exposes exactly the two
  * conversions our custom Catalyst expressions need. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
