package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query in the driver-verified surface.
  *
  * @param fn       builds the DataFrame from (session, sf-dir)
  * @param oracle   equivalent DuckDB SQL over the same tables (None for
  *                 ops DuckDB can't express — driver then only checks rows)
  * @param headline included in the Bench headline timing set
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

/** A themed bundle of queries; SparkEntry concatenates all packs. */
trait QueryPack {
  def queries: Map[String, QueryDef]
}
