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
  * runs coalesce as activity accumulates. Each event emits at most 7 (user, win)
  * DELTAS — the window ids newly covered — and every (user, win) pair
  * is emitted EXACTLY ONCE over the stream's lifetime, so the running
  * per-window distinct count is a plain additive fold of the deltas:
  * the downstream aggregation is mergeable, idempotent per pair, and
  * never needs a distinct.
  *
  * 100 TB shape: the only shuffle is the groupByKey on user_id; state
  * is O(runs per user) and runs coalesce, but it is watermark-prunable
  * only IN PRINCIPLE — this implementation runs NoTimeout with no
  * watermark, so per-user run state is never aged out (a run with
  * end < watermarkDay − 6 could be dropped safely: no future event can
  * cover a window that old — wiring that needs an event-time column +
  * EventTimeTimeout, a contract change left to a deployment); emission
  * is ≤7 rows per event with no growth over time. StreamingDistinctSpec
  * proves: per-pair exactly-once, per-boundary equality with the
  * brute-force windowed COUNT(DISTINCT) of the prefix, and final
  * equality with the batch `evt_sliding_distinct` output itself.
  */
object StreamingDistinct {

  /** Per-user state: disjoint, sorted, coalesced runs of covered
    * window ids. */
  final case class Runs(runs: Seq[(Long, Long)])

  /** One observation: the user's activity day (µs-day). */
  final case class Ev(user_id: Long, day: Long)

  /** One newly covered window id for a user — fold `+1` per `win` to
    * get the continuous trailing-7-day distinct counts. */
  final case class Delta(user_id: Long, win: Long)

  private def cover(
      userId: Long,
      events: Iterator[Ev],
      state: GroupState[Runs]): Iterator[Delta] = {
    var runs = state.getOption.map(_.runs).getOrElse(Seq.empty)
    val out = Seq.newBuilder[Delta]
    events.toSeq.map(_.day).distinct.sorted.foreach { d =>
      val lo = d - 6L
      val hi = d
      // emit the window ids in [lo, hi] not already covered
      var cursor = lo
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
    out.result().iterator
  }

  /** Start the continuous-distinct stream over (user_id, day) rows;
    * `sink` receives each batch's newly-covered (user, win) deltas. */
  def slidingDistinctStream(
      events: DataFrame,
      checkpointDir: String,
      sink: DataFrame => Unit): StreamingQuery = {
    val s = events.sparkSession
    import s.implicits._
    events.as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(cover)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Delta], _: Long) =>
        sink(batch.toDF())
      }
      .start()
  }
}
