package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous session windows — the library face of
  * `evt_session_window_native`'s streaming claim (previously exercised
  * only inside SessionWindowStreamSpec's MemoryStream test): the SAME
  * `groupBy(session_window(...))` aggregation over any streaming
  * source, append mode, so a session is emitted exactly once — when
  * the watermark passes its close — with cross-batch fragments MERGED
  * by the engine's native session state.
  *
  * The session state lives in the configured state-store provider
  * (HDFS-backed or RocksDB via [[StateStores]]), which is what the
  * chaos gate exercises: a kill between emission and commit plus a
  * restart over the checkpoint must re-deliver bit-identically and
  * leave every later session unchanged vs an unkilled run
  * (StreamingChaosAggSpec).
  *
  * 100 TB shape: state is one (start, end, counters) struct per OPEN
  * session per user — closed sessions leave the store on emission;
  * the only shuffle is the session_window grouping on user_id.
  */
object StreamingSessions {

  /** 30-minute gap sessions over (user_id: Long, ts: Long epoch
    * seconds, y: Long) rows with a 1-minute watermark; `sink`
    * receives each batch's CLOSED sessions (append semantics). */
  def sessionStream(
      events: DataFrame,
      checkpointDir: String,
      sink: DataFrame => Unit): StreamingQuery = {
    val s = events.sparkSession
    import s.implicits._
    events
      .withColumn("t", timestamp_seconds($"ts"))
      .withWatermark("t", "1 minute")
      .groupBy($"user_id", session_window($"t", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), sum($"y").as("sum_y"))
      .select($"user_id",
        unix_timestamp($"w.start").as("session_start"),
        unix_timestamp($"w.end").as("session_end"),
        $"n_events", $"sum_y")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) => sink(batch) }
      .start()
  }
}
