package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Continuous truncated-EWMA smoothing — the streaming face of
  * `evt_ewma`. The batch query computes, per event, the 8-tap
  * binary-weight smoothed value from the event and its 7 predecessors
  * in (µs, event_id) order; a stream cannot re-window history, but the
  * truncation makes the required state CONSTANT-SIZE: exactly the last
  * ≤7 observed values per user. `flatMapGroupsWithState` carries that
  * tail across micro-batches with engine-managed exactly-once
  * semantics, each event is emitted exactly once with the same
  * (smooth_num, smooth_den) rational the batch query assigns it, and
  * StreamingEwmaSpec proves row-level equality end to end — including
  * events whose 7-predecessor window a batch boundary splits.
  *
  * Ordering contract: same as [[StreamingPattern]] — events sort in
  * memory per user WITHIN a batch (bounded by the user's batch slice)
  * and batches arrive in event-time order per user; out-of-order
  * sources need a watermark re-order buffer in front.
  *
  * 100 TB shape: state is 7 longs per user (flat, no growth), the only
  * shuffle is the groupByKey on user_id, and emission is linear in the
  * batch — the same constant-state contract as the CEP and sketch
  * streams in this package.
  */
object StreamingEwma {

  /** Constant-size per-user state: the last ≤7 centi-unit values in
    * time-ascending order. */
  final case class EwmaState(lastYs: Seq[Long])

  /** One observation: value already in exact centi-units. */
  final case class Ev(user_id: Long, tus: Long, event_id: Long, y: Long)

  /** Per-event smoothed output — schema-aligned with `evt_ewma`. */
  final case class Smoothed(
      user_id: Long, event_id: Long, smooth_num: Long, smooth_den: Long)

  private def fold(
      userId: Long,
      events: Iterator[Ev],
      state: GroupState[EwmaState]): Iterator[Smoothed] = {
    var hist = state.getOption.map(_.lastYs).getOrElse(Seq.empty)
    val ordered = events.toSeq.sortBy(e => (e.tus, e.event_id))
    val out = Seq.newBuilder[Smoothed]
    ordered.foreach { e =>
      // taps newest-first: the event itself then up to 7 predecessors
      val taps = e.y +: hist.reverse.take(7)
      var num = 0L
      var den = 0L
      taps.zipWithIndex.foreach { case (y, i) =>
        val w = 1L << (7 - i)
        num += y * w
        den += w
      }
      out += Smoothed(userId, e.event_id, num, den)
      hist = (hist :+ e.y).takeRight(7)
    }
    state.update(EwmaState(hist))
    out.result().iterator
  }

  /** Start the smoothing stream over (user_id, tus, event_id, y) rows;
    * `sink` receives each batch's per-event smoothed rows. */
  def ewmaStream(
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
      .foreachBatch { (batch: Dataset[Smoothed], _: Long) =>
        sink(batch.toDF())
      }
      .start()
  }
}
