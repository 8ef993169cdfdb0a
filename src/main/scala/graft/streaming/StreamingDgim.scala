package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Continuous sliding-window counting in O(log² W) state — the DGIM
  * exponential histogram (Datar–Gionis–Indyk–Motwani, SICOMP 2002).
  *
  * "How many events did this key produce in the last W days" over an
  * unbounded stream admits two exact shapes: keep every event in the
  * window (state O(W·rate) — the `evt_sliding_distinct` face pays
  * this deliberately because IT must dedup), or give up exactness for
  * a GUARANTEED bound. DGIM is the classic second answer: per key a
  * list of power-of-two buckets, at most two per size, each stamped
  * with its NEWEST element's day — so the state is O(log² window)
  * regardless of rate, only the OLDEST bucket can straddle the window
  * edge, and the estimate (full buckets + half the straddler) is
  * within 50% of truth by construction. Appending an event is a
  * size-1 prepend plus a cascade of two-oldest-merge steps; expiry
  * drops buckets whose newest element left the window.
  *
  * Per-key state is the bucket list + the key's event-time horizon,
  * carried by `flatMapGroupsWithState` with engine-managed
  * exactly-once semantics. Ordering contract: same as
  * [[StreamingPattern]]/[[StreamingCusum]] — in-memory per-key sort
  * within a batch, event-time-ordered batches.
  */
object StreamingDgim extends Serializable {

  /** One observation: key + event-time day (the window unit). */
  final case class Ev(key: String, day: Long, event_id: Long)

  /** A DGIM bucket: `size` is a power of two, `day` the bucket's
    * NEWEST element's day — expiry is decided by the newest member,
    * so a dropped bucket is provably all-outside the window. */
  final case class Bucket(size: Long, day: Long)

  /** Per-key state: buckets NEWEST-FIRST (sizes non-decreasing toward
    * the tail — the DGIM invariant), the key's max seen day, and the
    * lifetime event count (diagnostics only). */
  final case class DgimState(buckets: List[Bucket], maxDay: Long, total: Long)

  /** Per-batch report: the window estimate, the exact-bound handle
    * (`oldest_size` — the error is at most half of it), and the state
    * size the log² guarantee caps. */
  final case class DgimUpdate(
      key: String, window_days: Long, est: Long, n_buckets: Long,
      oldest_size: Long, max_day: Long, total_seen: Long)

  /** Cascade two-oldest merges until no size occurs three times.
    * Sizes are non-decreasing newest→oldest, so triples are
    * contiguous; merging the two OLDEST of a size keeps the newest
    * (most recently stamped) bucket intact, and the merged bucket
    * takes the NEWER of the two merged days (its newest element). */
  private[streaming] def settle(bs0: List[Bucket]): List[Bucket] = {
    var bs = bs0
    var changed = true
    while (changed) {
      changed = false
      val arr = bs.toArray
      var i = 0
      while (i + 2 < arr.length && !changed) {
        if (arr(i).size == arr(i + 1).size && arr(i).size == arr(i + 2).size) {
          val merged = Bucket(arr(i).size * 2, arr(i + 1).day)
          bs = bs.take(i + 1) ++ (merged :: bs.drop(i + 3))
          changed = true
        }
        i += 1
      }
    }
    bs
  }

  /** Fold one event into the state: prepend a size-1 bucket, settle
    * the cascade, advance the horizon, expire buckets fully behind
    * the window (newest element at or before maxDay − windowDays). */
  private[streaming] def append(
      st: DgimState, day: Long, windowDays: Long): DgimState = {
    val maxDay = math.max(st.maxDay, day)
    val settled = settle(Bucket(1L, day) :: st.buckets)
    val kept = settled.filter(_.day > maxDay - windowDays)
    DgimState(kept, maxDay, st.total + 1L)
  }

  /** DGIM estimate: every full bucket plus half the oldest
    * (straddling) one, rounded up so a lone size-1 bucket still
    * counts its guaranteed in-window newest element. */
  private[streaming] def estimate(bs: List[Bucket]): Long =
    if (bs.isEmpty) 0L
    else bs.init.map(_.size).sum + (bs.last.size + 1L) / 2L

  /** Start the counter over (key, day, event_id) rows. `sink`
    * receives each batch's cumulative per-key reports. */
  def dgimStream(
      events: DataFrame,
      windowDays: Long,
      checkpointDir: String,
      sink: DataFrame => Unit): StreamingQuery = {
    require(windowDays >= 1, "dgimStream: window must be at least a day")
    val s = events.sparkSession
    import s.implicits._
    def fold(
        key: String,
        evs: Iterator[Ev],
        state: GroupState[DgimState]): Iterator[DgimUpdate] = {
      var st = state.getOption
        .getOrElse(DgimState(Nil, Long.MinValue, 0L))
      evs.toSeq.sortBy(e => (e.day, e.event_id)).foreach { e =>
        st = append(st, e.day, windowDays)
      }
      state.update(st)
      Iterator.single(DgimUpdate(key, windowDays, estimate(st.buckets),
        st.buckets.length.toLong,
        st.buckets.lastOption.map(_.size).getOrElse(0L),
        st.maxDay, st.total))
    }
    events.as[Ev]
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(fold)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[DgimUpdate], _: Long) =>
        sink(batch.toDF())
      }
      .start()
  }
}
