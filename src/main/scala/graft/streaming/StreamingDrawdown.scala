package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Continuous maximum-drawdown tracking — the streaming face of
  * `evt_drawdown` and the 16th face in this package. The batch query's
  * whole per-user census is FOUR LONGS of state (event count, running
  * peak, worst drawdown, underwater count): the prefix-extreme shape
  * that makes drawdown the canonical streaming risk metric — no
  * window, no history, state size independent of stream length.
  * `flatMapGroupsWithState` folds each micro-batch's slice in
  * (µs, event_id) order and emits the UPDATED census row per touched
  * user (update-mode semantics); after any prefix of batches the last
  * emission per user equals the batch query run over exactly that
  * prefix — StreamingDrawdownSpec proves it against the real events
  * table, and the StreamingChaosAggSpec gate proves a mid-batch kill +
  * checkpoint restart leaves the census bit-identical to an unkilled
  * run under both state-store providers.
  *
  * Ordering contract: same as [[StreamingEwma]] — per-user in-memory
  * sort WITHIN a batch, batches arrive in event-time order per user;
  * out-of-order sources need a watermark re-order buffer in front.
  *
  * 100 TB shape: state is 4 longs per user, the only shuffle is the
  * groupByKey on user_id, emission is ≤ touched users per batch.
  */
object StreamingDrawdown {

  /** Constant-size per-user census: the whole operator state. */
  final case class DdState(
      nEvents: Long, peak: Long, maxDd: Long, under: Long)

  /** One observation: value already in exact centi-units. */
  final case class Ev(user_id: Long, tus: Long, event_id: Long, y: Long)

  /** Per-user census output — schema-aligned with `evt_drawdown`. */
  final case class Census(
      user_id: Long, n_events: Long, peak_cents: Long,
      max_drawdown_cents: Long, n_underwater: Long)

  private def fold(
      userId: Long,
      events: Iterator[Ev],
      state: GroupState[DdState]): Iterator[Census] = {
    var st = state.getOption
      .getOrElse(DdState(0L, Long.MinValue, Long.MinValue, 0L))
    val ordered = events.toSeq.sortBy(e => (e.tus, e.event_id))
    if (ordered.isEmpty) Iterator.empty
    else {
      ordered.foreach { e =>
        val peak = math.max(st.peak, e.y)
        val dd = peak - e.y
        st = DdState(
          st.nEvents + 1L,
          peak,
          math.max(st.maxDd, dd),
          st.under + (if (e.y < peak) 1L else 0L))
      }
      state.update(st)
      Iterator.single(
        Census(userId, st.nEvents, st.peak, st.maxDd, st.under))
    }
  }

  /** Start the census stream over (user_id, tus, event_id, y) rows;
    * `sink` receives each batch's per-user updated census rows. */
  def drawdownStream(
      events: DataFrame,
      checkpointDir: String,
      sink: DataFrame => Unit): StreamingQuery = {
    val s = events.sparkSession
    import s.implicits._
    events.as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(fold)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Census], _: Long) =>
        sink(batch.toDF())
      }
      .start()
  }
}
