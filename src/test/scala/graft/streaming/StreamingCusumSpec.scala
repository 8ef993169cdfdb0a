package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{Tables, TestSpark}

/** The drift-detector equivalence gate: streaming the real events
  * through the constant-state CUSUM fold, calibrated with the same
  * per-user (n, Σy) stats the batch query derives internally, must
  * land every user on EXACTLY the batch `evt_cusum` report — S carries
  * across batch boundaries, so an excursion split by a boundary still
  * peaks and alarms identically.
  */
class StreamingCusumSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("streamed CUSUM reports equal the batch query; excursions survive " +
      "batch boundaries; uncalibrated keys are dropped") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft-cusum-ckpt")

    val evs = Tables.events(spark, sf)
      .selectExpr("user_id", "ts div 1000 as tus", "event_id",
        "cast(cast(value as decimal(18,2)) * 100 as long) as y")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(e => (e._2, e._3))
    // calibration = the full-history stats the batch query uses, with
    // ONE user deliberately left uncalibrated to pin the drop rule
    val fullRef = evs.groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.map(_._4).sum)).toMap
    val dropped = fullRef.keys.min
    val ref = fullRef - dropped
    val cut1 = evs.length / 3
    val cut2 = 2 * evs.length / 3

    val input = MemoryStream[(Long, Long, Long, Long)]
    @volatile var latest = Map.empty[Long, (Long, Long, Long)]
    val q = StreamingCusum.cusumStream(
      input.toDF().toDF("user_id", "tus", "event_id", "y"),
      ref, 7500L, 10000L, ckpt.toString,
      sink = df => df.collect().foreach { r =>
        latest += r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))
      })
    try {
      input.addData(evs.slice(0, cut1).toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(evs.slice(cut1, cut2).toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(evs.slice(cut2, evs.length).toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    val batch = graft.SparkEntry.queries("evt_cusum")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    latest.keySet shouldBe batch.keySet - dropped
    latest.foreach { case (u, rep) =>
      withClue(s"user $u:") { rep shouldBe batch(u) }
    }
    // non-vacuity: alarms happened, and some monitored user never alarmed
    latest.values.map(_._3).sum should be > 0L
    latest.values.count(_._3 == 0L) should be > 0
  }
}
