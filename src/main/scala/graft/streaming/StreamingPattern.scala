package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Continuous row-pattern matching — the streaming face of
  * `evt_pattern_match` and the CEP (complex-event-processing) shape:
  * the batch query folds each user's FULL history into a code string
  * and scans it; a stream cannot re-scan history, so the pattern
  * `view (click|view)* purchase` (no intervening error/signup) runs
  * as an explicit NFA whose per-user state is CONSTANT-SIZE — whether
  * a candidate run is open and how long, plus the cumulative match
  * stats. `flatMapGroupsWithState` carries that state across
  * micro-batches with engine-managed exactly-once semantics (the
  * state store, not a foreachBatch fold), so the streamed stats equal
  * the batch query's on the same prefix of events — the equivalence
  * StreamingPatternSpec proves end to end.
  *
  * Ordering contract: events are processed in (µs, event_id) order
  * WITHIN each micro-batch (sorted per user in memory — bounded by
  * the user's batch slice, the same per-partition assumption every
  * MATCH_RECOGNIZE engine makes), and batches must arrive in event-
  * time order per user — the in-order-ingestion contract of CEP
  * pipelines; out-of-order sources need a watermark re-order buffer
  * in front (the interval-join machinery), which is a deliberate
  * non-goal here.
  */
object StreamingPattern {

  /** Constant-size per-user NFA state: an open `v[cv]*` run (and its
    * length) + cumulative stats. */
  final case class PatternState(
      inRun: Boolean, runLen: Long,
      nEvents: Long, nMatches: Long, matchedEvents: Long, longest: Long)

  /** Cumulative per-user stats emitted for every user a batch touched
    * — schema-aligned with `evt_pattern_match`'s output columns. */
  final case class PatternUpdate(
      user_id: Long, n_events: Long, n_matches: Long,
      longest_match: Long, matched_events: Long)

  /** One event: (user_id, tus, event_id, code) where code is the
    * single-char event encoding of the batch query. */
  final case class Ev(user_id: Long, tus: Long, event_id: Long, code: String)

  private def step(st: PatternState, c: Char): PatternState = c match {
    case 'v' =>
      if (st.inRun) st.copy(runLen = st.runLen + 1)
      else st.copy(inRun = true, runLen = 1)
    case 'c' =>
      if (st.inRun) st.copy(runLen = st.runLen + 1) else st
    case 'p' =>
      if (st.inRun) {
        val len = st.runLen + 1
        PatternState(inRun = false, runLen = 0, st.nEvents,
          st.nMatches + 1, st.matchedEvents + len, math.max(st.longest, len))
      } else st
    case _ => st.copy(inRun = false, runLen = 0)
  }

  private def fold(
      userId: Long,
      events: Iterator[Ev],
      state: GroupState[PatternState]): Iterator[PatternUpdate] = {
    val init = state.getOption.getOrElse(
      PatternState(inRun = false, 0L, 0L, 0L, 0L, 0L))
    // the batch slice sorts in memory — per-user-per-batch bounded,
    // the standard CEP ordering step
    val ordered = events.toSeq.sortBy(e => (e.tus, e.event_id))
    val out = ordered.foldLeft(init) { (st, e) =>
      step(st.copy(nEvents = st.nEvents + 1), e.code.head)
    }
    state.update(out)
    Iterator.single(PatternUpdate(
      userId, out.nEvents, out.nMatches, out.longest, out.matchedEvents))
  }

  /** Start the pattern stream over (user_id, tus, event_id, code)
    * rows; `sink` receives each batch's cumulative per-user updates. */
  def patternStream(
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
      .foreachBatch { (batch: Dataset[PatternUpdate], _: Long) =>
        sink(batch.toDF())
      }
      .start()
  }
}
