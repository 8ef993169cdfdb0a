package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** ORC document-corpus source — the columnar sibling of [[CsvCorpus]]
  * and [[JsonlCorpus]], for corpora that arrive from Hive-lineage
  * warehouses (ORC is the other splittable columnar interchange a
  * data-exchange pipeline actually meets; the reader ships inside
  * Spark, no extra dependency). Unlike the text faces there is no
  * corrupt-record channel: ORC is self-describing and type-checked at
  * write time, so the contract here is the COLUMNAR one — schema
  * round-trips exactly, predicate pushdown reaches the stripe reader
  * (ORC search arguments + stripe/row-group statistics, the same
  * skipping economics as parquet), and a projection reads only its
  * columns. OrcCorpusSpec proves a parquet→ORC→read round trip
  * row-identical and gates the pushdown/pruning plan shape.
  *
  * 100 TB shape: shards are splittable and statistics-bearing, so a
  * filtered scan prunes at three levels (files via min/max footers,
  * stripes, row groups) before any row materializes — the reason this
  * face exists instead of routing warehouse exports through CSV.
  */
object OrcCorpus {

  /** Canonical `documents` column order — reads are reordered to this,
    * so downstream operators see the exact `Tables.documents` layout
    * whatever order the writer used. */
  private val cols = Seq("doc_id", "text", "lang", "source", "n_chars")

  /** Write a documents-shaped frame as ORC shards (zstd — ORC's best
    * available codec in-box, and the archival default). */
  def write(df: DataFrame, path: String): Unit =
    df.select(cols.map(col): _*)
      .write.mode("overwrite")
      .option("compression", "zstd")
      .orc(path)

  /** Member documents from ORC shards, `documents`-shaped. */
  def documents(s: SparkSession, path: String): DataFrame =
    s.read.orc(path)
      .filter(col("doc_id").isNotNull)
      .select(cols.map(col): _*)

  /** Streaming face over a growing shard directory — composes with the
    * continuous dedup/scoring streams like
    * [[JsonlCorpus.documentsStream]]; ORC needs the schema up front in
    * streaming mode (no inference pass, same rule as the text faces). */
  def documentsStream(
      s: SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType,
      options: Map[String, String] = Map.empty): DataFrame =
    s.readStream.schema(schema).options(options).orc(path)
      .filter(col("doc_id").isNotNull)
      .select(cols.map(col): _*)
}
