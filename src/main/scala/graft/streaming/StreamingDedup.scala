package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions.{col, sha2}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Bucketing, Dedup}

/** Streaming exact dedup against the bucketed hash state — the
  * continuous form of the nightly `dedup_incremental` job, and the
  * operator that ties the state-maintenance pieces together end to end:
  * per micro-batch, survivors come from
  * [[graft.operators.Dedup.incrementalAgainstState]] (hash-equality
  * anti-join with ZERO state-side exchange — only the micro-batch
  * aligns with the bucketing), are delivered to the sink, and their
  * hashes fold into the state table as one bucket-aligned file
  * generation ([[graft.operators.Bucketing.appendBucketAligned]]);
  * every `compactEvery` batches the accumulated generations compact
  * back to one file per bucket with zero exchanges
  * ([[graft.operators.Bucketing.compact]]). At 100 TB of accumulated
  * corpus the per-batch cost is proportional to the BATCH, never the
  * state — the same asymmetry the batch operator proves in
  * BucketingSpec, kept true continuously.
  */
object StreamingDedup {

  /** Start the dedup stream. `records` is a streaming frame carrying
    * (doc_id, text); `sink` receives each batch's survivors
    * (doc_id, body_sha256), already materialized.
    *
    * Replay safety is by SEMANTICS, not fencing: `foreachBatch` can
    * re-run a batch after a crash, and a re-run double-appends its
    * survivor hashes — but state is a membership set under the
    * anti-join, so duplicate hash rows change no later batch's
    * survivors, and the periodic compact bounds the file count
    * regardless. Emission is therefore at-least-once, matching the
    * ingest pipeline's delivery contract (SURVEY.md §3.3).
    */
  def exactDedupStream(
      records: DataFrame,
      stateTable: String,
      buckets: Int,
      checkpointDir: String,
      sink: DataFrame => Unit,
      compactEvery: Long = 0L): StreamingQuery =
    records.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val s = batch.sparkSession
        val inc = batch.select(col("doc_id"),
          sha2(col("text"), 256).as("body_sha256"))
        // a crash inside compact's drop→rename window would otherwise
        // read as "no state yet" here, and creating a fresh empty
        // table would orphan (and later destroy) the only copy of the
        // accumulated hashes
        Bucketing.recoverCompaction(s, stateTable)
        if (!s.catalog.tableExists(stateTable))
          Bucketing.writeBucketed(inc.select("body_sha256").limit(0),
            stateTable, "body_sha256", buckets)
        // materialize BEFORE the fold: survivors feed the sink AND the
        // state append, and the append writes into the very table the
        // survivor plan reads — the checkpoint pins the anti-join's
        // result so the fold can't see its own writes
        val survivors = Dedup.incrementalAgainstState(s, inc, stateTable)
          .localCheckpoint(true)
        sink(survivors)
        Bucketing.appendBucketAligned(
          survivors.select("body_sha256"), stateTable)
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
          Bucketing.compact(s, stateTable)
      }
      .start()

  /** Continuous NEAR-dup — the τ-Jaccard sibling of
    * [[exactDedupStream]] and the streaming form of the
    * `dedup_incremental_near` nightly job: per micro-batch, survivors
    * come from [[graft.operators.Dedup.nearIncrementalAgainstState]]
    * (banded candidates against the (band, band_key)-bucketed state,
    * exact-fingerprint-Jaccard verify against the doc_id-bucketed fps
    * state — ZERO exchange on either state table), then the batch's
    * survivors fold into BOTH state tables bucket-aligned, and every
    * `compactEvery` batches both compact back to one file per bucket.
    * The same replay-safety argument as exact dedup holds: duplicate
    * band/fps state rows only produce duplicate CANDIDATES, which the
    * verify + distinct collapse, so a replayed fold changes no later
    * batch's survivors. */
  def nearDedupStream(
      records: DataFrame,
      bandsTable: String,
      fpsTable: String,
      buckets: Int,
      checkpointDir: String,
      sink: DataFrame => Unit,
      nBands: Int = 8,
      rowsPerBand: Int = 2,
      tau: Double = 0.9,
      compactEvery: Long = 0L): StreamingQuery =
    records.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val s = batch.sparkSession
        val inc = Dedup.fpsOf(batch.select(col("doc_id"), col("text")))
          .localCheckpoint(true)
        Bucketing.recoverCompaction(s, bandsTable)
        Bucketing.recoverCompaction(s, fpsTable)
        if (!s.catalog.tableExists(bandsTable))
          Bucketing.writeBucketed(
            Dedup.bandFrame(inc, nBands, rowsPerBand).limit(0),
            bandsTable, Seq("band", "band_key"), buckets)
        if (!s.catalog.tableExists(fpsTable))
          Bucketing.writeBucketed(inc.limit(0), fpsTable, "doc_id", buckets)
        val survivors = Dedup.nearIncrementalAgainstState(
          s, inc, bandsTable, fpsTable, nBands, rowsPerBand, tau)
          .localCheckpoint(true) // feeds sink + both folds; must not
                                 // observe its own state writes
        sink(survivors)
        val survFps = inc.join(survivors, Seq("doc_id"))
        Bucketing.appendBucketAligned(
          Dedup.bandFrame(survFps, nBands, rowsPerBand), bandsTable)
        Bucketing.appendBucketAligned(survFps, fpsTable)
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0) {
          Bucketing.compact(s, bandsTable)
          Bucketing.compact(s, fpsTable)
        }
      }
      .start()
}
