package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{Tables, TestSpark}

/** The drawdown equivalence gate: streaming the real events table
  * through the four-long census fold, in event-time-ordered
  * micro-batches, must leave each user's LAST emitted census equal to
  * the batch `evt_drawdown` query — after every prefix of batches, not
  * just the end, so carried peaks genuinely survive batch boundaries
  * (a peak set in batch 0 must still define drawdowns in batch 2).
  */
class StreamingDrawdownSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("streamed census equals the batch query after EVERY batch " +
      "prefix; peaks survive batch boundaries") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft-dd-ckpt")

    val evs = Tables.events(spark, sf)
      .selectExpr("user_id", "ts div 1000 as tus", "event_id",
        "cast(cast(value as decimal(18,2)) * 100 as long) as y")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(e => (e._2, e._3))
    val cuts = Seq(evs.length / 3, 2 * evs.length / 3, evs.length)

    // sequential reference fold over an event prefix
    def reference(prefix: Array[(Long, Long, Long, Long)])
        : Map[Long, (Long, Long, Long, Long)] =
      prefix.groupBy(_._1).map { case (u, g) =>
        val ys = g.sortBy(p => (p._2, p._3)).map(_._4)
        var peak = Long.MinValue
        var maxDd = Long.MinValue
        var under = 0L
        ys.foreach { y =>
          peak = math.max(peak, y)
          maxDd = math.max(maxDd, peak - y)
          if (y < peak) under += 1
        }
        u -> ((ys.length.toLong, peak, maxDd, under))
      }

    val input = MemoryStream[(Long, Long, Long, Long)]
    @volatile var census = Map.empty[Long, (Long, Long, Long, Long)]
    val q = StreamingDrawdown.drawdownStream(
      input.toDF().toDF("user_id", "tus", "event_id", "y"),
      ckpt.toString,
      sink = df => df.collect().foreach { r =>
        census += r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      })
    try {
      var from = 0
      cuts.foreach { to =>
        input.addData(evs.slice(from, to).toIndexedSeq: _*)
        q.processAllAvailable()
        withClue(s"prefix of $to events: ") {
          census shouldBe reference(evs.take(to))
        }
        from = to
      }
    } finally q.stop()

    // the final census also equals the BATCH QUERY itself
    val batch = graft.SparkEntry.queries("evt_drawdown")(spark, sf)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    census shouldBe batch
    // cross-batch peaks are genuinely exercised: some user's batch-0
    // peak still bounds later batches (peak unchanged, drawdown grew)
    val afterB0 = reference(evs.take(cuts(0)))
    val grown = afterB0.exists { case (u, (_, peak0, dd0, _)) =>
      batch.get(u).exists { case (_, peakF, ddF, _) =>
        peakF == peak0 && ddF > dd0
      }
    }
    grown shouldBe true
  }
}
