package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{DotProduct, L2Sq, RollingHash}

/** Session extension registering graft's custom expressions for SQL
  * users: `spark.sql("SELECT graft_rolling_hash(text)")`,
  * `graft_dot(a, b)`, `graft_l2sq(a, b)` — enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "graft_rolling_hash"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c) => RollingHash(c)
        case Seq(c, Literal(p: Long, _)) => RollingHash(c, p)
        case Seq(c, Literal(p: Int, _)) => RollingHash(c, p.toLong)
        case _ => throw new IllegalArgumentException(
          "graft_rolling_hash(str[, prime]) expects 1 or 2 arguments")
      }))
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(a, b) => DotProduct(a, b)
        case _ => throw new IllegalArgumentException(
          "graft_dot(array<double>, array<double>) expects 2 arguments")
      }))
    e.injectFunction((
      FunctionIdentifier("graft_l2sq"),
      new ExpressionInfo(classOf[L2Sq].getName, "graft_l2sq"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(a, b) => L2Sq(a, b)
        case _ => throw new IllegalArgumentException(
          "graft_l2sq(array<double>, array<double>) expects 2 arguments")
      }))
  }
}
