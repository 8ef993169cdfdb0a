package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.StringType

import graft.functions.{DotProduct, L2Sq, RollingHash, SimHash60}

/** Session extension registering graft's custom expressions for SQL
  * users: `spark.sql("SELECT graft_rolling_hash(text)")`,
  * `graft_dot(a, b)`, `graft_l2sq(a, b)`,
  * `graft_simhash60(tokens)` — enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "graft_rolling_hash"),
      (exprs: Seq[Expression]) => exprs match {
        // Cast like the Scala-level rolling_hash entry point: without
        // it a non-string SQL argument passes analysis and dies at
        // runtime in the UTF8String cast
        case Seq(c) => RollingHash(Cast(c, StringType))
        case Seq(c, Literal(p: Long, _)) => RollingHash(Cast(c, StringType), p)
        case Seq(c, Literal(p: Int, _)) => RollingHash(Cast(c, StringType), p.toLong)
        case _ => throw new IllegalArgumentException(
          "graft_rolling_hash(str[, prime]) expects 1 or 2 arguments")
      }))
    def injectBinary(name: String, cls: Class[_],
        make: (Expression, Expression) => Expression): Unit =
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(cls.getName, name),
        (exprs: Seq[Expression]) => exprs match {
          case Seq(a, b) => make(a, b)
          case _ => throw new IllegalArgumentException(
            s"$name(array<double>, array<double>) expects 2 arguments")
        }))
    injectBinary("graft_dot", classOf[DotProduct], DotProduct.apply)
    injectBinary("graft_l2sq", classOf[L2Sq], L2Sq.apply)
    e.injectFunction((
      FunctionIdentifier("graft_simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName, "graft_simhash60"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c) => SimHash60(c)
        case _ => throw new IllegalArgumentException(
          "graft_simhash60(array<string>) expects 1 argument")
      }))
  }
}
