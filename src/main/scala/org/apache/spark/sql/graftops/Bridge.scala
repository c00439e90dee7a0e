package org.apache.spark.sql.graftops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 moved these conversions behind
  * `private[sql] ExpressionUtils`; a sub-package of `org.apache.spark.sql` is
  * the sanctioned extension-library technique for reaching them (same pattern
  * as every Spark connector/extension that defines custom expressions).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
