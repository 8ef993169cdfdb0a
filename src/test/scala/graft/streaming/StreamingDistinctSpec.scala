package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{Tables, TestSpark}

/** The continuous-distinct equivalence gate: streaming the real events
  * through the run-merging fold, in event-time-ordered micro-batches,
  * must (a) emit every (user, window) pair at most once over the whole
  * stream, (b) after EVERY batch boundary fold to exactly the
  * brute-force windowed COUNT(DISTINCT) of the prefix, and (c) after
  * the last batch equal the batch `evt_sliding_distinct` output
  * row-for-row — cross-batch coverage (a user's later activity only
  * extending an existing run) is the load-bearing path.
  */
class StreamingDistinctSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("streamed sliding-distinct deltas fold to the batch query at " +
      "every boundary and never re-emit a pair") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft-sdist-ckpt")

    val DayUs = 86400000000L
    val evs = Tables.events(spark, sf)
      .selectExpr("user_id", s"(ts div 1000) div $DayUs as day")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._2)
    val cut1 = evs.length / 3
    val cut2 = 2 * evs.length / 3

    val input = MemoryStream[(Long, Long)]
    @volatile var deltas = Vector.empty[(Long, Long)]
    val q = StreamingDistinct.slidingDistinctStream(
      input.toDF().toDF("user_id", "day"),
      ckpt.toString,
      sink = df => df.collect().foreach { r =>
        deltas :+= ((r.getLong(0), r.getLong(1)))
      })

    def bruteForce(prefix: Seq[(Long, Long)]): Map[Long, Long] = {
      val wins = (prefix.map(_._2).min - 6) to prefix.map(_._2).max
      wins.map { w =>
        w -> prefix.filter(e => e._2 >= w && e._2 <= w + 6)
          .map(_._1).distinct.size.toLong
      }.filter(_._2 > 0).toMap
    }
    def folded: Map[Long, Long] =
      deltas.groupBy(_._2).view.mapValues(_.size.toLong).toMap

    var marks = Vector.empty[Int] // deltas count at each boundary
    try {
      Seq(evs.slice(0, cut1), evs.slice(cut1, cut2),
        evs.slice(cut2, evs.length)).zipWithIndex
        .foldLeft(Seq.empty[(Long, Long)]) { case (prefix, (batch, _)) =>
          input.addData(batch.toIndexedSeq: _*)
          q.processAllAvailable()
          val all = prefix ++ batch
          // (b) boundary equality with the definitional brute force
          folded shouldBe bruteForce(all)
          // (a) exactly-once per (user, win) pair so far
          deltas.distinct.size shouldBe deltas.size
          marks :+= deltas.size
          all
        }
    } finally q.stop()

    // (c) final counts equal the batch query row-for-row
    val batchQ = graft.SparkEntry.queries("evt_sliding_distinct")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    folded shouldBe batchQ
    // cross-batch extension genuinely exercised: some user who emitted
    // deltas in an earlier micro-batch emits NEW window ids later (the
    // carried run list extends instead of double-counting)
    val seg1Users = deltas.slice(0, marks(0)).map(_._1).toSet
    val laterUsers = deltas.slice(marks(0), deltas.size).map(_._1).toSet
    (seg1Users intersect laterUsers) should not be empty
  }
}
