package graft.ingest

/** Driver-side failure/retry policy (SURVEY.md §2 #17): exponential
  * backoff with a cap, reset on success — behaviorally equivalent to the
  * reference's `ExponentialBackOff.scala:5-22` (interval doubles per
  * failure, capped; default step 1 s, cap 30 min per
  * `FtpSourceConfig.scala:40`). Pure value class: the poll driver holds
  * one and sleeps/schedules around it; no Catalyst involvement.
  */
final case class ExponentialBackoff(
    stepMs: Long,
    capMs: Long,
    iteration: Int = 0,
    sinceMs: Long = 0L) {

  /** Current wait interval: step * 2^iteration, capped. Overflow-safe:
    * the cap is applied via division before the multiply, so huge
    * step × 2^n products can never wrap negative and disable gating.
    *
    * A zero step (continuous polling) still must not hot-loop on
    * FAILURE: after the first failure the doubling base is floored at
    * 1 s — the reference's own idle sleep (`FtpSourceTask.scala:71`). */
  def intervalMs: Long = {
    val base = if (iteration > 0) math.max(stepMs, 1000L) else stepMs
    if (base <= 0L) return 0L
    val shift = 1L << math.min(iteration, 62)
    if (iteration >= 62 || shift > capMs / base) capMs
    else math.min(capMs, base * shift)
  }

  def endTimeMs: Long = sinceMs + intervalMs

  /** Has the current wait window elapsed? */
  def passed(nowMs: Long): Boolean = nowMs >= endTimeMs

  /** Successful poll: reset to the base interval. */
  def nextSuccess(nowMs: Long): ExponentialBackoff =
    copy(iteration = 0, sinceMs = nowMs)

  /** Failed poll: double the wait (up to the cap). */
  def nextFailure(nowMs: Long): ExponentialBackoff =
    copy(iteration = iteration + 1, sinceMs = nowMs)
}
