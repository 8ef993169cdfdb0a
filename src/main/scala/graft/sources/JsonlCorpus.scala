package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, lit, struct, to_json, when}
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
  *  - row MEMBERSHIP is projection-independent: the only validity
  *    gate is `doc_id IS NOT NULL`, and referencing doc_id in the
  *    filter forces it into every scan's required schema — so counts,
  *    pruned queries, and full reads agree on which rows exist. A
  *    row whose OTHER fields fail conversion stays a member (those
  *    fields read as null, PERMISSIVE semantics) and is surfaced by
  *    [[quarantine]]; gating membership on `_corrupt_record` instead
  *    would make validity depend on which columns a query happens to
  *    read, silently shifting results between query shapes;
  *  - malformed input is quarantined, not fatal and not silent:
  *    [[quarantine]] reports unparseable lines AND doc_id-less rows
  *    AND partially-corrupt members for the per-ingest health check a
  *    pipeline should run (the ADVICE-r05 skip-observability rule
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

  /** One definition of the parse configuration and the membership
    * predicate for BOTH faces — the batch and streaming readers must
    * never drift in row-acceptance semantics. */
  private val parseOpts = Map(
    "mode" -> "PERMISSIVE",
    "columnNameOfCorruptRecord" -> "_corrupt_record")
  private def isMember: Column = col("doc_id").isNotNull

  private def raw(s: SparkSession, path: String): DataFrame =
    s.read.schema(schema).options(parseOpts).json(path)

  /** Member documents from JSONL shards, `documents`-shaped: drop-in
    * for `Tables.documents` output (JsonlCorpusSpec proves
    * byte-equality of a parquet→jsonl→read round trip). */
  def documents(s: SparkSession, path: String): DataFrame =
    raw(s, path).filter(isMember).drop("_corrupt_record")

  /** The dead-letter audit frame: (line, reason) for every input row
    * that is not a fully-clean member — `unparseable` (no doc_id could
    * be read: dropped from [[documents]]), `no_doc_id` (valid JSON
    * without a doc_id: also dropped), `partial` (a MEMBER row whose
    * non-key fields failed conversion and read as null). Route it to a
    * dead-letter sink and alert when nonzero, mirroring
    * `Monitor.PollOutput.skippedFiles`. Runs a FULL parse behind an
    * object barrier (Spark refuses corrupt-record-only projections on
    * raw JSON scans) — this is the small periodic audit path, not the
    * ingest hot path. */
  def quarantine(s: SparkSession, path: String): DataFrame = {
    val r = raw(s, path)
    r.map(identity(_))(org.apache.spark.sql.Encoders.row(r.schema))
      .filter(col("_corrupt_record").isNotNull || !isMember)
      .select(
        coalesce(col("_corrupt_record"),
          to_json(struct(col("doc_id"), col("text"), col("lang"),
            col("source"), col("n_chars")))).as("line"),
        when(col("doc_id").isNull && col("_corrupt_record").isNotNull,
            lit("unparseable"))
          .when(col("doc_id").isNull, lit("no_doc_id"))
          .otherwise(lit("partial")).as("reason"))
  }

  /** Streaming face over a growing shard directory — new files become
    * micro-batches, composing directly with `streaming.StreamingDedup`'s
    * continuous dedup. `options` passes reader options through, e.g.
    * `Map("maxFilesPerTrigger" -> "16")` to pace a backlog the way the
    * file monitor's `max.poll.files` does. Same membership predicate
    * as [[documents]]; run [[quarantine]] as a periodic batch audit
    * (a stream cannot fork a side output). */
  def documentsStream(
      s: SparkSession,
      path: String,
      options: Map[String, String] = Map.empty): DataFrame =
    s.readStream.schema(schema).options(parseOpts ++ options).json(path)
      .filter(isMember)
      .drop("_corrupt_record")
}
