package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's custom Catalyst expressions and the public
  * `Column` API. Spark 4 moved Column construction behind
  * `private[sql]` plumbing; this shim lives in a `org.apache.spark.sql`
  * subpackage — the standard connector/extension technique — to expose
  * exactly the two conversions third-party expressions need.
  */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
