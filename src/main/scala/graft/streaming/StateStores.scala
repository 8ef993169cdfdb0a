package graft.streaming

import org.apache.spark.sql.SparkSession

/** State-store provider selection for the streaming tail/diff pipeline.
  *
  * The default HDFS-backed provider keeps every state key in executor
  * heap and rewrites whole map snapshots per batch — fine for the test
  * fixtures, but the reference's deployment shape (a monitor watching
  * an entire FTP tree, `FtpSourceConfig.scala:20-22` + SURVEY.md §3.3)
  * means one state row per monitored file: at 100M files the snapshot
  * traffic and heap residency become the scale limit long before the
  * ingest itself does. RocksDB keeps state off-heap on executor-local
  * disk with incremental compaction, so per-batch cost tracks the
  * CHANGED keys, not the total corpus — the same increment-vs-state
  * economics as `operators.Bucketing.appendBucketAligned`.
  *
  * Selection is a plain session conf read by Structured Streaming when
  * a query STARTS (existing checkpoints pin their provider; switching
  * requires a new checkpoint location), so `select` must run before
  * `.start()`. `RocksDBStateStoreSpec` runs the restart-recovery and
  * watermark-dedup state machines under the RocksDB provider and
  * asserts from the checkpoint artifacts that it actually engaged.
  */
object StateStores {

  val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  /** Spark's bundled RocksDB provider (in spark-sql; no extra deps). */
  val RocksDB =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Route state for subsequently-started streaming queries to the
    * given provider. Deployments pick RocksDB via
    * `select(spark, StateStores.RocksDB)` or set the conf directly in
    * `spark-defaults`; per-query overrides are not a thing in Spark —
    * the conf is session-scoped, so use a dedicated session (
    * `spark.newSession()`) to mix providers in one app. */
  def select(spark: SparkSession, providerClass: String = RocksDB): Unit =
    spark.conf.set(ProviderKey, providerClass)
}
