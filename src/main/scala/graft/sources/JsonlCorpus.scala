package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** JSONL document-corpus source — the format large text corpora
  * actually ship in (one JSON object per line, directories of .jsonl /
  * .jsonl.gz shards: C4, The Pile, RedPajama, Common Crawl derivates
  * all publish this shape). Reading it through here yields the exact
  * `documents` schema the whole query pack runs on, so a user can
  * point every dedup/text/assembly operator at a raw JSONL corpus
  * without touching a query.
  *
  * Scale contract:
  *  - the schema is EXPLICIT — no sampling/inference pass, which at
  *    100 TB would be a second full read before the first real one;
  *  - extra JSON fields are simply not projected (schema projection is
  *    Spark's JSON-pushdown: the parser skips unrequested fields);
  *  - corrupt lines are quarantined, not fatal: PERMISSIVE mode routes
  *    them to `_corrupt_record`, [[documents]] drops them and
  *    [[corruptLines]] exposes them for the health check a pipeline
  *    should run per ingest (the ADVICE-r05 skip-observability rule
  *    applied to the corpus tier);
  *  - gzip shards are NOT splittable — one task per shard, so shard
  *    size (not count) sets parallelism; a corpus staged as ~128 MiB
  *    shards reads with the same task shape as the parquet tables.
  */
object JsonlCorpus {

  /** The `documents` table schema (TESTDATA.md), plus the corrupt-line
    * spill column used in PERMISSIVE mode. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("_corrupt_record", StringType)))

  private def raw(s: SparkSession, path: String): DataFrame =
    s.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Well-formed documents from JSONL shards, `documents`-shaped:
    * drop-in for `Tables.documents` output (JsonlCorpusSpec proves
    * byte-equality of a parquet→jsonl→read round trip). */
  def documents(s: SparkSession, path: String): DataFrame =
    raw(s, path)
      .filter(col("_corrupt_record").isNull && col("doc_id").isNotNull)
      .drop("_corrupt_record")

  /** The quarantined raw lines — route to a dead-letter sink and alert
    * when nonzero, mirroring `Monitor.PollOutput.skippedFiles`. Spark
    * refuses a query whose only referenced column on a raw JSON scan
    * is the corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN),
    * so the parse goes through an object barrier first — this is the
    * small periodic audit path, not the ingest hot path. */
  def corruptLines(s: SparkSession, path: String): DataFrame = {
    val r = raw(s, path)
    r.map(identity(_))(org.apache.spark.sql.Encoders.row(r.schema))
      .filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("line"))
  }

  /** Streaming face over a growing shard directory — new files become
    * micro-batches (`maxFilesPerTrigger` paces ingest like the file
    * monitor's `max.poll.files`), composing directly with
    * `streaming.StreamingDedup`'s continuous dedup. Corrupt lines are
    * dropped here (a stream can't fork a side output; run
    * [[corruptLines]] as a periodic batch audit instead). */
  def documentsStream(s: SparkSession, path: String): DataFrame =
    s.readStream
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .filter(col("_corrupt_record").isNull && col("doc_id").isNotNull)
      .drop("_corrupt_record")
}
