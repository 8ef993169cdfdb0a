package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Similarity

/** Continuous ANN serving over the FROZEN IVF+PQ artifact — the 25th
  * streaming face, and the missing runtime half of the index
  * lifecycle the batch faces already cover (build → append →
  * retrain-signal → rebuild): a serving tier doesn't re-run a batch
  * job per request, it holds the frozen index and answers query
  * BATCHES as they arrive.
  *
  * Per micro-batch of (query_id, qemb) rows: resolve the persisted
  * artifacts (a cached parquet read — the index never retrains here),
  * rank the batch's probes against the broadcast centroid table,
  * derive each query's probe budget by the PLANNER arithmetic
  * ([[Similarity.plannerBudgets]] — selectivity-aware, static floor,
  * all-cells fallback), price the batch's ADC lookup table against
  * the frozen codebooks, and run the partition-pruned in-scan
  * filtered search ([[Similarity.ivfpqSearchOnRanking]]). Emissions
  * carry (query_id, rnk, vec_id, label, adist, probes_used,
  * batch_id).
  *
  * STATELESS by design — the frozen artifact IS the state, shared by
  * every executor through the artifacts root; the stream holds
  * nothing between batches, so there is no replay hazard to
  * chaos-gate: a replayed batch recomputes the identical answer from
  * the identical artifact (exactly-once delivery is the SINK's
  * concern, as for any idempotent-output stream).
  * StreamingAnnServeSpec gates the face's real contract instead:
  * emissions for a query set split across micro-batches are
  * row-identical to the batch face (`sim_ann_ivfpq_adaptive`) run on
  * the same queries — per-query planner budgets are independent
  * arithmetic, so batch boundaries cannot change any answer.
  *
  * 100 TB shape: per batch the coordinator does O(batch × cells)
  * ranking + O(batch × PqSub × PqK) LUT assembly (the real serving
  * coordinator's job), the scan opens only probed cells' files, the
  * predicate filters inside the scan, and ≤k rows per query cross
  * the one shuffle.
  */
object StreamingAnnServe {

  /** Start the serving stream over (query_id: Long, qemb:
    * Array[Double]) rows against `d`'s frozen index; `pred` is the
    * stored-attribute predicate served in-scan; `sink` receives each
    * batch's ranked answers. */
  def serveStream(
      queries: DataFrame,
      d: String,
      pred: org.apache.spark.sql.Column,
      checkpointDir: String,
      sink: DataFrame => Unit): StreamingQuery =
    queries.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val s = batch.sparkSession
        import s.implicits._
        // the batch is read ≥3 times (ranking, LUT, the search's
        // self-exclusion side) — pin it
        val q = batch
          .select($"query_id".cast("long").as("vec_id"), $"qemb".as("emb"))
          .localCheckpoint(true)
        if (q.isEmpty)
          sink(Seq.empty[(Long, Long, Long, Long, Double, Long, Long)]
            .toDF("query_id", "rnk", "vec_id", "label", "adist",
              "probes_used", "batch_id"))
        else {
          val (cells, cents) = Similarity.ivfpqPersistedModel(s, d)
          val (_, books) = Similarity.pqPersistedModel(s, d)
          val ranking = Similarity.probeRankingFor(s, cents,
            q.select($"vec_id".as("query_id"), $"emb".as("qemb")))
          val budgets = Similarity.plannerBudgets(s, cells, ranking, pred)
          val lut = Similarity.pqQueryLutWideFor(s, q, books)
          sink(Similarity.ivfpqSearchOnRanking(s, cells, lut, ranking,
              pred, budgets)
            .withColumn("batch_id", lit(batchId)))
        }
        q.unpersist()
        ()
      }
      .start()
}
