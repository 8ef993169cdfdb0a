package graft.ingest

import org.apache.spark.sql.{Dataset, SparkSession}

/** The poll *task* loop (SURVEY.md §3.2 steps 1-3; reference
  * `FtpSourceTask.scala:47-74`): repeatedly run `Monitor.poll` on the
  * configured cadence, escalate an exponential backoff on failure and
  * reset it on success, convert + shape records, and hand each batch to
  * a sink callback. Driver-side control flow only — every data-moving
  * step inside the poll is a distributed Spark job.
  *
  * In production the same semantics come from scheduling
  * `pollOnce` under any cron/trigger; `run` is the self-contained loop
  * for tests and single-process deployments.
  */
final class PollDriver(
    spark: SparkSession,
    cfg: MonitorConfig,
    stateDir: String,
    sink: Dataset[FileChangeRecord] => Unit,
    clock: () => Long = () => System.currentTimeMillis()) {

  // step = the refresh rate, like the reference (FtpSourceTask.scala:27,30
  // builds the backoff from ftp.refresh); sinceMs far in the past so the
  // very first poll is never gated
  @volatile private var backoff = ExponentialBackoff(
    stepMs = cfg.refresh.toMillis, capMs = cfg.maxBackoff.toMillis,
    sinceMs = Long.MinValue / 2)
  private val converter = cfg.converter

  /** One poll: returns the number of records emitted, or -1 when a
    * failure escalated the backoff, or 0 while waiting out the backoff
    * window. */
  def pollOnce(): Long = {
    val now = clock()
    if (!backoff.passed(now)) return 0L
    try {
      val records = Monitor.pollWithStateDir(
        spark, cfg.dirs, stateDir,
        maxAgeMs = cfg.maxAge.map(_.toMillis),
        maxFilesPerPoll = cfg.maxFilesPerPoll)
      val converted = Records.applyConverter(records, converter)
      sink(converted)
      backoff = backoff.nextSuccess(now)
      converted.count()
    } catch {
      case scala.util.control.NonFatal(_) =>
        backoff = backoff.nextFailure(now)
        -1L
    }
  }

  def currentBackoffMs: Long = backoff.intervalMs

  /** Blocking loop: poll every `cfg.refresh` for `maxPolls` iterations
    * (Int.MaxValue = forever). */
  def run(maxPolls: Int = Int.MaxValue): Unit = {
    var i = 0
    while (i < maxPolls) {
      pollOnce()
      i += 1
      if (i < maxPolls && cfg.refresh.toMillis > 0)
        Thread.sleep(cfg.refresh.toMillis)
    }
  }
}
