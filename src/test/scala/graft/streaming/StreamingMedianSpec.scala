package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{Tables, TestSpark}

/** The robust-smoothing equivalence gate: streaming the real events
  * table through the constant-state trailing-median fold, in
  * event-time-ordered micro-batches, must emit EVERY event exactly
  * once with the same (n_window, med2) pair the batch
  * `evt_rolling_median` query assigns it — including events whose
  * trailing window a batch boundary splits.
  */
class StreamingMedianSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("streamed medians equal the batch query; windows survive batch " +
      "boundaries") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft-med-ckpt")

    val evs = Tables.events(spark, sf)
      .selectExpr("user_id", "ts div 1000 as tus", "event_id",
        "cast(cast(value as decimal(18,2)) * 100 as long) as y")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(e => (e._2, e._3))
    val cut1 = evs.length / 3
    val cut2 = 2 * evs.length / 3

    val input = MemoryStream[(Long, Long, Long, Long)]
    @volatile var seen = Map.empty[(Long, Long), (Long, Long)]
    @volatile var emitted = 0L
    val q = StreamingMedian.medianStream(
      input.toDF().toDF("user_id", "tus", "event_id", "y"),
      ckpt.toString,
      sink = df => df.collect().foreach { r =>
        seen += (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))
        emitted += 1
      })
    try {
      input.addData(evs.slice(0, cut1).toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(evs.slice(cut1, cut2).toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(evs.slice(cut2, evs.length).toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    val batch = graft.SparkEntry.queries("evt_rolling_median")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    seen.keySet shouldBe batch.keySet
    seen shouldBe batch
    emitted shouldBe evs.length.toLong
    // the cross-batch path is exercised: some event right after a cut
    // already has a FULL 5-wide window — its 4 predecessors live in
    // carried state, not its own batch
    val crossUsers = evs.slice(cut1, cut1 + 50).map(_._1).distinct
    val crossFull = crossUsers.exists(u =>
      seen.exists { case ((uu, _), (n, _)) => uu == u && n == 5L })
    crossFull shouldBe true
  }
}
