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

  /** Eager local checkpoint that also RESETS the plan's statistics.
    *
    * `Dataset.localCheckpoint` deliberately carries the ORIGINAL plan's
    * estimated `Statistics` onto the resulting `LogicalRDD`
    * (`originStats`). For iterative operators that checkpoint every
    * round and SELF-JOIN the previous round's output (prefix doubling,
    * peeling, BFS), that propagation is quadratic poison: join
    * estimates are the PRODUCT of child sizeInBytes, so the carried
    * BigInt doubles-or-worse in bit length every round — by round 7 of
    * the suffix-array append the driver was multiplying 115-million-bit
    * integers inside `SizeInBytesOnlyStatsPlanVisitor` (~250 s of pure
    * planning CPU on a 27k-row corpus). Re-wrapping the materialized
    * RDD in a fresh `LogicalRDD` WITHOUT `originStats` restores the
    * constant `defaultSizeInBytes` leaf estimate; physical planning
    * quality is unaffected for these operators (broadcasts are explicit
    * and AQE replans from RUNTIME sizes), while the partitioning and
    * ordering the checkpoint captured are preserved. */
  def cutCheckpoint(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val ck = df.localCheckpoint(true)
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val lr = ck.queryExecution.optimizedPlan
      .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD]
    val fresh = org.apache.spark.sql.execution.LogicalRDD(
      lr.output, lr.rdd, lr.outputPartitioning, lr.outputOrdering,
      lr.isStreaming)(ck.sparkSession)
    org.apache.spark.sql.classic.Dataset.ofRows(ck.sparkSession, fresh)
  }
}
