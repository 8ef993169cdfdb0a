package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.{MG, MisraGriesAggregator}
import graft.ingest.GenSwap

/** Continuous corpus-wide heavy hitters — the streaming face of
  * `llm_heavy_hitters`, and the frequent-items sibling of the
  * mergeable-HLL pattern (`agg_hll_mergeable`): because the
  * Misra–Gries summary is MERGEABLE (error ≤ N/(cap+1) preserved
  * under any merge tree — Agarwal et al., PODS 2012), a growing
  * corpus never needs re-scanning. Each micro-batch pays one
  * map-side-combined aggregation over ITS tokens (≤cap counters per
  * partition cross the shuffle), and the accumulated summary updates
  * with a driver-side merge of two ≤cap-counter summaries — the
  * coordinator step, O(cap) work and bytes.
  *
  * State = the (term, count) counters plus the total token count and
  * the last folded batch id, committed via the crash-safe
  * [[graft.ingest.GenSwap]] generation swap (the poll-spool
  * discipline: at any crash point one complete generation is
  * readable). `foreachBatch` can re-run a batch after a crash, so the
  * fold is made idempotent by the batch id: a re-run of an
  * already-committed batch skips the fold (counts never double) and
  * only re-emits — exactly-once state maintenance on at-least-once
  * emission.
  *
  * After any prefix of batches, every term with overall frequency
  * > n_total/(cap+1) is guaranteed present in the emitted summary —
  * the candidate set a periodic exact recount (the batch query's
  * second pass) turns into the exact heavy-hitter set.
  */
object StreamingScoring {

  /** Start the stream. `records` carries a `text` column; `sink`
    * receives, per batch, the MERGED summary so far as rows
    * (term, count_lb, n_total, batch_id) — `count_lb` is the MG lower
    * bound (undercounts by ≤ n_total/(cap+1), never overcounts).
    *
    * `stateDir` is PAIRED with `checkpointDir`: batch ids are scoped
    * to one checkpoint, so pointing a fresh checkpoint at an existing
    * state dir would misread old batch ids as replays — start both
    * fresh or resume both. */
  def heavyHittersStream(
      records: DataFrame,
      stateDir: String,
      cap: Int,
      checkpointDir: String,
      sink: DataFrame => Unit): StreamingQuery = {
    val agg = new MisraGriesAggregator(cap)
    records.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val s = batch.sparkSession
        import s.implicits._
        val target = s"$stateDir/mg"
        val old = s"$stateDir/mg.old"
        val tmp = s"$stateDir/mg.tmp"

        val (stateMG, stateN, lastBatch) =
          GenSwap.readable(target, old) match {
            case Some(dir) =>
              val rows = s.read.parquet(dir).collect()
              val n = if (rows.isEmpty) 0L else rows.head.getLong(2)
              val lb = if (rows.isEmpty) -1L else rows.head.getLong(3)
              (MG(rows.map(_.getString(0)), rows.map(_.getLong(1))), n, lb)
            case None => (agg.zero, 0L, -1L)
          }

        val (merged, mergedN) =
          if (batchId <= lastBatch) (stateMG, stateN) // replayed batch: fold once
          else {
            val mgUdaf = udaf(agg)
            val toks = batch
              .select(explode(graft.functions.TextTokens.tokens).as("term"))
            val row = toks.agg(mgUdaf($"term").as("mg"), count(lit(1)).as("n"))
              .collect().head
            val bm = row.getStruct(0)
            val batchMG = MG(
              bm.getSeq[String](0).toArray, bm.getSeq[Long](1).toArray)
            val m = agg.merge(stateMG, batchMG)
            val n = stateN + row.getLong(1)
            // commit BEFORE emitting: a crash between commit and sink
            // re-runs the batch, hits the batchId guard, and re-emits
            // the already-folded summary — never a double fold
            val outRows = m.terms.zip(m.counts).toSeq
              .map { case (t, c) => (t, c, n, batchId) }
            new java.io.File(stateDir).mkdirs()
            outRows.toDF("term", "count_lb", "n_total", "batch_id")
              .coalesce(1).write.mode("overwrite").parquet(tmp)
            GenSwap.publish(tmp, target, old)
            (m, n)
          }

        sink(merged.terms.zip(merged.counts).toSeq
          .map { case (t, c) => (t, c, mergedN, batchId) }
          .toDF("term", "count_lb", "n_total", "batch_id"))
      }
      .start()
  }

  /** Continuous Count-Min — the streaming face of `llm_count_min` and
    * the point-estimate sibling of [[heavyHittersStream]]: MG keeps the
    * candidate SET, Count-Min answers "how frequent is THIS term" with
    * a never-undercounting estimate. Counters are mergeable by plain
    * addition, so each micro-batch pays ONE map-side-combined
    * aggregation over its own tokens (≤ depth×W counters per partition
    * cross the shuffle) and the accumulated sketch updates with a
    * driver-side counter-wise sum — O(depth×W) coordinator work, and
    * the stream never re-scans history. The total token count rides
    * the sketch itself (row 0's counters sum to N), so no second
    * aggregation is paid.
    *
    * Same state discipline as the MG stream: (r, col, cnt) rows plus
    * n_total and the last folded batch id, GenSwap-committed before
    * emission; a replayed batch hits the batch-id guard and re-emits
    * without re-folding (exactly-once state on at-least-once
    * emission). `stateDir` is PAIRED with `checkpointDir`. `sink`
    * receives, per batch, the merged counters
    * (r, col, cnt, n_total, batch_id); point estimates are a pure
    * downstream probe (min over rows of the hashed counter —
    * `Scoring.cmEstimate`). */
  def countMinStream(
      records: DataFrame,
      stateDir: String,
      checkpointDir: String,
      sink: DataFrame => Unit): StreamingQuery = {
    records.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val s = batch.sparkSession
        import s.implicits._
        val target = s"$stateDir/cm"
        val old = s"$stateDir/cm.old"
        val tmp = s"$stateDir/cm.tmp"

        val (stateCtrs, stateN, lastBatch) =
          GenSwap.readable(target, old) match {
            case Some(dir) =>
              val rows = s.read.parquet(dir).collect()
              val n = if (rows.isEmpty) 0L else rows.head.getLong(3)
              val lb = if (rows.isEmpty) -1L else rows.head.getLong(4)
              (rows.map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap, n, lb)
            case None => (Map.empty[(Int, Long), Long], 0L, -1L)
          }

        val (merged, mergedN) =
          if (batchId <= lastBatch) (stateCtrs, stateN) // replayed batch: fold once
          else {
            val batchCtrs = graft.operators.Scoring.cmCounters(
              batch.select(explode(graft.functions.TextTokens.tokens).as("term"))
                .withColumn("fp", graft.functions.RollingHash.rolling_hash($"term")))
              .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
            val m = (stateCtrs.toSeq ++ batchCtrs.toSeq)
              .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
            // every occurrence increments exactly one row-0 counter
            val n = stateN + batchCtrs.collect { case ((0, _), c) => c }.sum
            new java.io.File(stateDir).mkdirs()
            m.toSeq.map { case ((r, col), c) => (r, col, c, n, batchId) }
              .toDF("r", "col", "cnt", "n_total", "batch_id")
              .coalesce(1).write.mode("overwrite").parquet(tmp)
            GenSwap.publish(tmp, target, old)
            (m, n)
          }

        sink(merged.toSeq.map { case ((r, col), c) => (r, col, c, mergedN, batchId) }
          .toDF("r", "col", "cnt", "n_total", "batch_id"))
      }
      .start()
  }
}
