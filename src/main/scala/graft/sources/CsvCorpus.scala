package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, concat_ws, lit, when}
import org.apache.spark.sql.types._

/** CSV/TSV document-corpus source — the delimited sibling of
  * [[JsonlCorpus]], for corpora and metadata dumps that ship as
  * headered CSV/TSV shards (translation corpora, registry exports,
  * spreadsheet-born datasets). Same contract as the JSONL face: the
  * exact `documents` schema out, explicit schema in (no inference
  * pass — at 100 TB schema inference is a second full read), row
  * membership gated ONLY on `doc_id IS NOT NULL` (projection-
  * independent — counts, pruned reads, and full reads agree on which
  * rows exist), malformed input quarantined with a reason instead of
  * failing or vanishing, gzip shards transparent, and a streaming
  * face over a growing directory.
  *
  * Dialect: RFC 4180 — comma (or `delimiter`) separated, `"`-quoted
  * fields with `""` escaping (Spark's default escape is `\`, which
  * RFC writers do not emit; pinning escape=`"` makes round trips with
  * standard writers exact). One record per line: embedded newlines
  * would need `multiLine`, which makes shards non-splittable — the
  * reason JSONL stays the preferred interchange for body text and the
  * CSV face targets delimited corpora without raw newlines.
  */
object CsvCorpus {

  /** The `documents` table schema plus the corrupt-line spill column
    * (PERMISSIVE mode parks unparseable lines there). */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("_corrupt_record", StringType)))

  /** One definition of dialect + membership for the batch and
    * streaming faces — they must never drift in row acceptance. */
  private def parseOpts(delimiter: String) = Map(
    "mode" -> "PERMISSIVE",
    "columnNameOfCorruptRecord" -> "_corrupt_record",
    "header" -> "true",
    "delimiter" -> delimiter,
    "quote" -> "\"",
    "escape" -> "\"")
  private def isMember: Column = col("doc_id").isNotNull

  private def raw(s: SparkSession, path: String, delimiter: String): DataFrame =
    s.read.schema(schema).options(parseOpts(delimiter)).csv(path)

  /** Member documents from CSV shards, `documents`-shaped: drop-in for
    * `Tables.documents` output (CsvCorpusSpec proves a parquet→csv→read
    * round trip row-identical). `delimiter` = "\t" reads TSV. */
  def documents(s: SparkSession, path: String,
      delimiter: String = ","): DataFrame =
    raw(s, path, delimiter).filter(isMember).drop("_corrupt_record")

  /** Dead-letter audit frame: (line, reason) for every non-clean input
    * row — `unparseable` (no doc_id recoverable), `no_doc_id` (parsed
    * but keyless), `partial` (a member whose non-key fields failed
    * conversion). Periodic audit path, not the ingest hot path; the
    * object barrier forces the full parse (corrupt-record-only
    * projections are refused on raw scans, as with JSON). */
  def quarantine(s: SparkSession, path: String,
      delimiter: String = ","): DataFrame = {
    val r = raw(s, path, delimiter)
    r.map(identity(_))(org.apache.spark.sql.Encoders.row(r.schema))
      .filter(col("_corrupt_record").isNotNull || !isMember)
      .select(
        coalesce(col("_corrupt_record"),
          concat_ws(",", col("doc_id"), col("text"), col("lang"),
            col("source"), col("n_chars"))).as("line"),
        when(col("doc_id").isNull && col("_corrupt_record").isNotNull,
            lit("unparseable"))
          .when(col("doc_id").isNull, lit("no_doc_id"))
          .otherwise(lit("partial")).as("reason"))
  }

  /** Streaming face over a growing shard directory — composes with the
    * continuous dedup/scoring streams exactly like
    * [[JsonlCorpus.documentsStream]]; `options` passes pacing through
    * (e.g. `maxFilesPerTrigger`). */
  def documentsStream(
      s: SparkSession,
      path: String,
      delimiter: String = ",",
      options: Map[String, String] = Map.empty): DataFrame =
    s.readStream.schema(schema).options(parseOpts(delimiter) ++ options)
      .csv(path)
      .filter(isMember)
      .drop("_corrupt_record")
}
