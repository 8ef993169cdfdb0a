package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Continuous trailing-window median — the streaming face of
  * `evt_rolling_median` and the 17th face in this package. The robust
  * smoother's whole state is the last ≤4 observed values per user
  * (the trailing-5 window minus the arriving event itself), so the
  * stream carries CONSTANT-SIZE state like [[StreamingEwma]] and each
  * event emits exactly once with the identical exact-2× median
  * (med2 = the two middle order statistics' sum) the batch query
  * assigns it — including events whose window a batch boundary splits.
  *
  * Ordering contract: same as [[StreamingEwma]] — per-user in-memory
  * sort WITHIN a batch, batches arrive in event-time order per user.
  *
  * 100 TB shape: state is 4 longs per user, the only shuffle is the
  * groupByKey on user_id, emission is linear in the batch.
  */
object StreamingMedian {

  /** Constant-size per-user state: the last ≤4 values, time-ascending. */
  final case class MedState(lastYs: Seq[Long])

  /** One observation: value already in exact centi-units. */
  final case class Ev(user_id: Long, tus: Long, event_id: Long, y: Long)

  /** Per-event output — schema-aligned with `evt_rolling_median`. */
  final case class Smoothed(
      user_id: Long, event_id: Long, n_window: Long, med2: Long)

  private def fold(
      userId: Long,
      events: Iterator[Ev],
      state: GroupState[MedState]): Iterator[Smoothed] = {
    var hist = state.getOption.map(_.lastYs).getOrElse(Seq.empty)
    val ordered = events.toSeq.sortBy(e => (e.tus, e.event_id))
    val out = Seq.newBuilder[Smoothed]
    ordered.foreach { e =>
      val win = (hist :+ e.y).takeRight(5).sorted
      val n = win.length
      out += Smoothed(userId, e.event_id, n.toLong,
        win((n + 1) / 2 - 1) + win(n / 2))
      hist = (hist :+ e.y).takeRight(4)
    }
    state.update(MedState(hist))
    out.result().iterator
  }

  /** Start the median stream over (user_id, tus, event_id, y) rows;
    * `sink` receives each batch's per-event smoothed rows. */
  def medianStream(
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
