package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared tokenization + plan-shaping helpers used across the text,
  * dedup, and multimodal query packs. ONE definition of "token" (and
  * its DuckDB spelling) so a tokenizer change can't silently diverge
  * between queries or between an implementation and its oracle.
  *
  * The whitespace class is EXPLICIT (space/tab/LF/CR/FF) rather than
  * `\s`: Java's \s matches U+000B (vertical tab) while DuckDB's RE2
  * \s does not, so the shorthand silently diverges on exotic
  * whitespace; the enumerated class is identical in both engines.
  */
object TextTokens {

  /** Lowercased whitespace tokens of the `text` column, empty artifacts
    * removed. Regex restricted to Java/RE2-identical constructs. */
  def tokens: Column =
    filter(split(lower(trim(col("text"))), "[ \\t\\n\\r\\f]+"), t => t =!= "")

  /** The DuckDB spelling of [[tokens]]. */
  val tokensSql: String =
    "list_filter(string_split_regex(lower(trim(text)), '[ \\t\\n\\r\\f]+'), t -> t <> '')"

  /** Materialization barrier before explode/join fan-out. Spark's
    * Generate re-evaluates its generator expression per OUTPUT row, so
    * exploding a nested-HOF array column costs O(rows × fan-out × expr)
    * — measured 19 s vs 0.25 s at sf0.1. A plain repartition doesn't
    * help (the optimizer pushes projections above exchanges); an object
    * roundtrip is a boundary Catalyst cannot project through, so the
    * arrays are computed exactly once per row. Serde cost is one row
    * per document — negligible against the recomputation it removes. */
  def materialized(df: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(df.schema)
    df.map(identity(_))(enc)
  }
}
