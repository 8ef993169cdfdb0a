package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Continuous sliding-window distinct counting — the streaming face of
  * `evt_sliding_distinct` (trailing-7-day distinct users per day,
  * batch-computed WITHOUT a distinct aggregate via the interval-merge
  * identity). The same identity is what makes the op streamable with
  * BOUNDED state: a user's contribution to the per-window counts is
  * fully described by the DISJOINT RUNS of window ids their activity
  * covers (activity day d covers window ids [d−6, d], the batch
  * query's convention), so per-user state is the merged run list —
  * runs coalesce as activity accumulates. Each event emits at most 7
  * (user, win) DELTAS — the window ids newly covered — and every
  * (user, win) pair is emitted EXACTLY ONCE over the stream's
  * lifetime, so the running per-window distinct count is a plain
  * additive fold of the deltas: the downstream aggregation is
  * mergeable, idempotent per pair, and never needs a distinct.
  *
  * 100 TB shape: the only shuffle is the groupByKey on user_id; state
  * is O(runs per user), runs coalesce, and — since round 10 — state is
  * AGED OUT by the event-time watermark: with horizon = watermarkDay −
  * 6, no window id below the horizon can ever gain a new member (a
  * non-late event's day d ≥ watermarkDay covers only windows ≥
  * watermarkDay − 6), so runs entirely below the horizon are dropped
  * at every invocation, and a user whose NEWEST run has aged below the
  * horizon has their state REMOVED via `EventTimeTimeout` (timeout
  * stamp = (maxHi + 7) days — the first instant the watermark proves
  * the user's whole run list unreachable). Emission is clamped to
  * windows ≥ horizon, which makes exactly-once unconditional even if
  * a late event (day < watermarkDay) slips in: late coverage of
  * already-forgotten windows is suppressed rather than double-counted
  * (the standard watermark trade — late data older than the delay is
  * dropped). StreamingDistinctSpec proves: per-pair exactly-once,
  * per-boundary equality with the brute-force windowed
  * COUNT(DISTINCT) of the prefix, final equality with the batch
  * `evt_sliding_distinct` output itself, and state-row aging
  * (numRowsTotal shrinks to the recently-active users after the
  * watermark passes the idle ones).
  */
object StreamingDistinct {

  private val DayMs = 86400000L

  /** Per-user state: disjoint, sorted, coalesced runs of covered
    * window ids. */
  final case class Runs(runs: Seq[(Long, Long)])

  /** One observation: the user's activity day (µs-day). `ts` is the
    * derived event-time column (day start) the watermark rides —
    * projecting it away would detach the watermark from the stream,
    * and EventTimeTimeout requires it downstream. */
  final case class Ev(user_id: Long, day: Long, ts: java.sql.Timestamp)

  /** One newly covered window id for a user — fold `+1` per `win` to
    * get the continuous trailing-7-day distinct counts. */
  final case class Delta(user_id: Long, win: Long)

  private def cover(
      userId: Long,
      events: Iterator[Ev],
      state: GroupState[Runs]): Iterator[Delta] = {
    // horizon: windows below this can never gain a member from any
    // non-late future event, so runs entirely below it are garbage.
    // Before the first watermark (0) the horizon is a no-op sentinel.
    val wmMs = state.getCurrentWatermarkMs()
    val horizon =
      if (wmMs <= 0L) Long.MinValue / 4L else wmMs / DayMs - 6L
    var runs = state.getOption.map(_.runs).getOrElse(Seq.empty)
      .filter(_._2 >= horizon)
    if (state.hasTimedOut) {
      // invoked because the watermark passed the timeout stamp, not by
      // data — and that stamp was ≥ (maxHi + 7)·day when last armed,
      // so wm/day ≥ maxHi + 7 ⇒ horizon ≥ maxHi + 1 > every run's hi:
      // the prune above is provably total and removal is THE outcome
      // (a live tail cannot survive its own age-out alarm; any newer
      // data would have re-armed the alarm with a newer maxHi first)
      state.remove()
      Iterator.empty
    } else {
      val out = Seq.newBuilder[Delta]
      events.toSeq.map(_.day).distinct.sorted.foreach { d =>
        val lo = d - 6L
        val hi = d
        // emit the window ids in [max(lo, horizon), hi] not already
        // covered — never below the horizon (see scaladoc)
        var cursor = math.max(lo, horizon)
        runs.filter(r => r._2 >= lo && r._1 <= hi).sortBy(_._1).foreach { r =>
          while (cursor < r._1 && cursor <= hi) {
            out += Delta(userId, cursor)
            cursor += 1
          }
          cursor = math.max(cursor, r._2 + 1L)
        }
        while (cursor <= hi) {
          out += Delta(userId, cursor)
          cursor += 1
        }
        // merge [lo, hi] into the run list (adjacent runs coalesce too,
        // keeping the state minimal)
        val (touching, others) = runs.partition(r =>
          r._1 <= hi + 1L && r._2 >= lo - 1L)
        val merged = (
          math.min(lo, touching.map(_._1).minOption.getOrElse(lo)),
          math.max(hi, touching.map(_._2).maxOption.getOrElse(hi)))
        runs = (others :+ merged).sortBy(_._1)
      }
      state.update(Runs(runs))
      // age-out alarm: the first instant the watermark proves every
      // current run unreachable — CLAMPED above the current eviction
      // watermark, because a straggler batch can reach here with the
      // alarm already in the past (Spark admits rows against the
      // PREVIOUS batch's watermark while setTimeoutTimestamp validates
      // against the CURRENT one and throws below it, which would kill
      // the query); the clamped alarm just fires on the next batch
      state.setTimeoutTimestamp(
        math.max((runs.map(_._2).max + 7L) * DayMs, wmMs + 1L))
      out.result().iterator
    }
  }

  /** Start the continuous-distinct stream over (user_id, day) rows;
    * `sink` receives each batch's newly-covered (user, win) deltas.
    * `watermarkDelay` is the event-time lateness allowance: state ages
    * out once the watermark (max event time − delay) passes a user's
    * newest run by 7 days; events older than the watermark may be
    * suppressed rather than double-counted. */
  def slidingDistinctStream(
      events: DataFrame,
      checkpointDir: String,
      sink: DataFrame => Unit,
      watermarkDelay: String = "7 days"): StreamingQuery = {
    val s = events.sparkSession
    import s.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    events
      .withColumn("ts", expr(s"timestamp_millis(day * $DayMs)"))
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("day"), col("ts"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout())(cover)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Delta], _: Long) =>
        sink(batch.toDF())
      }
      .start()
  }
}
