package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** The `evt_session_window_native` query's central claim is that its
  * session_window formulation "runs unchanged under Structured
  * Streaming with watermark-based state eviction" — this spec makes
  * that claim executable: the SAME groupBy(session_window) aggregation
  * runs over a MemoryStream in append mode, sessions are emitted only
  * once the watermark proves them closed, and events a micro-batch
  * apart merge into one session exactly as the batch oracle dictates
  * (gap = 30 min; events exactly one gap apart MERGE, only a strictly
  * greater gap splits — the boundary rule the batch query pins).
  */
class SessionWindowStreamSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  private def ts(minute: Int) =
    new java.sql.Timestamp(1700000000000L + minute * 60000L)

  test("session_window aggregation runs under streaming: cross-batch merge, " +
      "boundary-gap merge, watermark-closed emission") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp)]
    val sessions = input.toDF().toDF("user_id", "t")
      .withWatermark("t", "10 minutes")
      .groupBy($"user_id", session_window($"t", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", $"w.start".as("session_start"), $"n_events")
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      def got() = spark.table("sess_out").collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2))).toSet

      // session 1 for u1 starts; u2 opens a parallel session
      input.addData(("u1", ts(0)), ("u2", ts(5)))
      q.processAllAvailable()
      // a LATER micro-batch extends u1's session: exactly one gap after
      // the previous event, which must MERGE (the pinned boundary rule)
      input.addData(("u1", ts(30)))
      q.processAllAvailable()
      // nothing can be emitted yet — the watermark has not closed any
      // session (append mode emits only proven-final sessions)
      got() shouldBe empty

      // u1's next event is 31 min later (strictly greater than the
      // gap): a NEW session. It also advances the watermark far enough
      // to close and emit the earlier sessions.
      input.addData(("u1", ts(61)), ("u2", ts(200)))
      q.processAllAvailable()
      input.addData(("u2", ts(300))) // push the watermark past u1's last session
      q.processAllAvailable()

      got() should contain allOf (
        ("u1", ts(0), 2L),   // ts(0) + ts(30) merged across micro-batches
        ("u1", ts(61), 1L),  // strictly-greater gap split
        ("u2", ts(5), 1L))
    } finally q.stop()
  }
}
