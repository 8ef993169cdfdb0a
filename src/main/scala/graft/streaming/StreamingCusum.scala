package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Continuous CUSUM drift detection — the streaming face of
  * `evt_cusum`. The batch query centers each user's increments on the
  * user's own FULL-HISTORY mean (an offline convenience); an online
  * detector cannot know that mean, so this face takes the standard
  * production input instead: a CALIBRATED per-user reference —
  * (n, Σy) from a baseline window, the artifact a scheduled
  * calibration job emits — and runs the n-scaled recurrence
  * S_t = max(0, S_{t-1} + n·y_t − Σy − n·K) with alarms at S > H·n.
  * Per-user state is THREE longs (current S, peak S, alarm count) —
  * constant-size, carried by `flatMapGroupsWithState` with
  * engine-managed exactly-once semantics. When the supplied reference
  * IS the full-history stats, the streamed result equals the batch
  * query row for row — the equivalence StreamingCusumSpec proves
  * across batch boundaries. Users absent from the reference are
  * dropped (an online detector cannot monitor an uncalibrated key);
  * the reference map is a plain broadcast-sized object — per-user
  * (n, Σy) pairs, the same budget as any keyed calibration artifact.
  *
  * Ordering contract: same as [[StreamingPattern]]/[[StreamingEwma]] —
  * in-memory per-user sort within a batch, event-time-ordered batches.
  */
object StreamingCusum {

  /** Constant-size per-user detector state. */
  final case class CusumState(s: Long, maxS: Long, alarms: Long, n: Long)

  /** One observation: value already in exact centi-units. */
  final case class Ev(user_id: Long, tus: Long, event_id: Long, y: Long)

  /** Cumulative per-user detector report — schema-aligned with
    * `evt_cusum`'s output columns. */
  final case class CusumUpdate(
      user_id: Long, n_events: Long, max_cusum: Long, n_alarms: Long)

  /** Start the detector over (user_id, tus, event_id, y) rows.
    * `reference` maps user → (n, Σy) calibration stats; `slackK` and
    * `thresholdH` are in centi-units (the batch query ships 7500 /
    * 10000). `sink` receives each batch's cumulative per-user
    * reports. */
  def cusumStream(
      events: DataFrame,
      reference: Map[Long, (Long, Long)],
      slackK: Long,
      thresholdH: Long,
      checkpointDir: String,
      sink: DataFrame => Unit): StreamingQuery = {
    val s = events.sparkSession
    import s.implicits._
    def fold(
        userId: Long,
        evs: Iterator[Ev],
        state: GroupState[CusumState]): Iterator[CusumUpdate] =
      reference.get(userId) match {
        case None => Iterator.empty // uncalibrated key — not monitored
        case Some((n, sy)) =>
          var st = state.getOption.getOrElse(CusumState(0L, 0L, 0L, 0L))
          evs.toSeq.sortBy(e => (e.tus, e.event_id)).foreach { e =>
            val s1 = math.max(0L, st.s + (n * e.y - sy - n * slackK))
            st = CusumState(s1, math.max(st.maxS, s1),
              st.alarms + (if (s1 > thresholdH * n) 1L else 0L),
              st.n + 1L)
          }
          state.update(st)
          Iterator.single(CusumUpdate(userId, st.n, st.maxS, st.alarms))
      }
    events.as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(fold)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[CusumUpdate], _: Long) =>
        sink(batch.toDF())
      }
      .start()
  }
}
