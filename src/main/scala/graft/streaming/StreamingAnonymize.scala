package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Relational

/** Continuous application of a FROZEN Mondrian anonymization scheme —
  * the 27th streaming face, and the privacy pipeline's serving tier:
  * `q_kanon_generalize` builds and publishes the scheme,
  * `q_kanon_apply` generalizes a batch of arriving rows through it —
  * this face does the same for rows as they ARRIVE, so released data
  * trails ingest by one micro-batch instead of one nightly job.
  *
  * The scheme (the per-level split tables + the leaf-box stats —
  * O(2^depth)-row pinned frames) is built ONCE from `base` before
  * `.start()` and closed over — the [[StreamingAnnServe]] hoist
  * discipline: the published scheme is frozen by the face's premise
  * (re-deriving it per batch would both re-run the whole build AND
  * move medians as data arrives, which is exactly the
  * re-identification hazard `q_kanon_apply`'s scaladoc names). Per
  * micro-batch the work is [[Relational.mondrianApplyWalk]]: `depth`
  * broadcast joins and the box attach, no statistics.
  *
  * STATELESS by design — the frozen scheme IS the state; a replayed
  * batch recomputes the identical generalization (exactly-once
  * delivery is the sink's concern, as for any idempotent-output
  * stream). StreamingAnonymizeSpec gates the face's real contract:
  * emissions for an arriving set split across micro-batches are
  * row-identical to the batch face (`q_kanon_apply`) on the same
  * rows — each row's walk is independent, so batch boundaries cannot
  * change any generalization.
  *
  * Emissions carry the batch face's row shape (id, leaf, the leaf's
  * box, base_k, the `in_box` drift flag) plus `batch_id`. At 100 TB
  * the asymmetry is the operator: per-batch cost tracks the batch
  * (broadcast joins against ≤2^depth-row tables), the scheme never
  * rescans the governed base table.
  */
object StreamingAnonymize {

  /** Start the anonymization stream over (id: Long, d0: Long,
    * d1: Long) arriving quasi-identifier rows against the scheme
    * built from `base` (same row shape); `sink` receives each batch's
    * generalized rows. */
  def applyStream(
      rows: DataFrame,
      base: DataFrame,
      k: Long,
      depth: Int,
      checkpointDir: String,
      sink: DataFrame => Unit): StreamingQuery = {
    // the frozen scheme, resolved once and closed over
    val (splits, stats) = Relational.mondrianScheme(base, k, depth)
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val s = batch.sparkSession
        import s.implicits._
        sink(Relational.mondrianApplyWalk(splits, stats,
            batch.select($"id".cast("long").as("id"),
              $"d0".cast("long").as("d0"),
              $"d1".cast("long").as("d1")))
          .withColumn("batch_id", lit(batchId)))
        ()
      }
      .start()
  }
}
