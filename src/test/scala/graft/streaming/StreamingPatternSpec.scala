package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{Tables, TestSpark}

/** The CEP equivalence gate: streaming the real events table through
  * the constant-state NFA, in event-time-ordered micro-batches, must
  * land every user on EXACTLY the batch query's stats — cross-batch
  * open runs included (a `v[cv]*` run that a batch boundary splits
  * must still complete when its `p` arrives in a later batch).
  */
class StreamingPatternSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("streamed pattern stats equal the batch query; runs survive batch boundaries") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft-pattern-ckpt")

    // the real events, encoded exactly as the batch query encodes them,
    // split into 3 event-time-ordered batches (the CEP in-order
    // ingestion contract) — boundaries WILL split open runs for some
    // users, which is the interesting path
    val evs = Tables.events(spark, sf)
      .selectExpr("user_id", "ts div 1000 as tus", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3) match {
          case "view" => "v"
          case "click" => "c"
          case "purchase" => "p"
          case "signup" => "s"
          case _ => "e"
        }))
      .sortBy(e => (e._2, e._3))
    val cut1 = evs.length / 3
    val cut2 = 2 * evs.length / 3

    val input = MemoryStream[(Long, Long, Long, String)]
    @volatile var latest = Map.empty[Long, (Long, Long, Long, Long)]
    val q = StreamingPattern.patternStream(
      input.toDF().toDF("user_id", "tus", "event_id", "code"),
      ckpt.toString,
      sink = df => df.collect().foreach { r =>
        latest += r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      })
    try {
      input.addData(evs.slice(0, cut1).toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(evs.slice(cut1, cut2).toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(evs.slice(cut2, evs.length).toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    val batch = graft.SparkEntry.queries("evt_pattern_match")(spark, sf)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    latest.keySet shouldBe batch.keySet
    latest shouldBe batch
    // non-vacuity: matching actually happened
    latest.values.map(_._2).sum should be > 0L
  }
}
