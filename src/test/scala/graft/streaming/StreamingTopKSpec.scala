package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{Tables, TestSpark}

/** The leaderboard equivalence gate: streaming the real events through
  * the constant-state top-k fold must end on EXACTLY the batch top-k
  * per event type — including entries that displace earlier leaders
  * across batch boundaries — and every intermediate emission must be
  * the correct top-k OF THE PREFIX streamed so far.
  */
class StreamingTopKSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("streamed top-k equals the batch leaderboard at every batch " +
      "boundary; later batches displace earlier leaders") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft-topk-ckpt")

    val evs = Tables.events(spark, sf)
      .selectExpr("event_type", "event_id",
        "cast(cast(value as decimal(18,2)) * 100 as long) as y")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._2) // deterministic arrival order (id order)
    val cut1 = evs.length / 3
    val cut2 = 2 * evs.length / 3
    def batchTopK(prefix: Seq[(String, Long, Long)]) =
      prefix.groupBy(_._1).view.mapValues(
        _.map(e => (e._3, e._2)).distinct
          .sortBy { case (y, id) => (-y, id) }.take(3)
          .zipWithIndex.map { case ((y, id), i) => (i + 1L, id, y) }.toSeq)
        .toMap

    val input = MemoryStream[(String, Long, Long)]
    @volatile var latest = Map.empty[String, Seq[(Long, Long, Long)]]
    val snapshots = scala.collection.mutable.ArrayBuffer
      .empty[Map[String, Seq[(Long, Long, Long)]]]
    val q = StreamingTopK.topKStream(
      input.toDF().toDF("grp", "event_id", "y"), 3, ckpt.toString,
      sink = df => {
        df.collect().groupBy(_.getString(0)).foreach { case (g, rows) =>
          latest += g -> rows.map(r =>
            (r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq
        }
      })
    try {
      for (slice <- Seq(evs.slice(0, cut1), evs.slice(cut1, cut2),
          evs.slice(cut2, evs.length))) {
        input.addData(slice.map(e => (e._1, e._2, e._3)).toIndexedSeq: _*)
        q.processAllAvailable()
        snapshots += latest
      }
    } finally q.stop()

    // every boundary snapshot is the exact top-k of its prefix
    val prefixes = Seq(evs.take(cut1), evs.take(cut2), evs)
    snapshots.zip(prefixes).zipWithIndex.foreach {
      case ((snap, prefix), i) =>
        withClue(s"after batch ${i + 1}:") {
          snap shouldBe batchTopK(prefix.toSeq)
        }
    }
    // displacement really happened: some type's leaderboard changed
    // after the first batch
    snapshots.head should not be snapshots.last
  }
}
