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

  test("watermark aging removes idle users' run state (21 -> 1 state " +
      "rows) while deltas stay exactly-once and definitionally correct") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft-sdist-age-ckpt")

    // users 1..20 active on days 100-101 only; user 0 keeps the stream
    // alive on days 100/130/160/190. With the 7-day watermark delay,
    // after the day-130 batch the watermark reaches day 123, so users
    // 1..20 (newest run end 101, alarm day 108) time out and their
    // state is REMOVED in the next batch — the state-bound guarantee
    // the NoTimeout implementation could not make.
    val b1 = (1 to 20).flatMap(u => Seq((u.toLong, 100L), (u.toLong, 101L))) :+
      ((0L, 100L))
    val b2 = Seq((0L, 130L))
    val b3 = Seq((0L, 160L))
    val b4 = Seq((0L, 190L))

    val input = MemoryStream[(Long, Long)]
    @volatile var deltas = Vector.empty[(Long, Long)]
    val q = StreamingDistinct.slidingDistinctStream(
      input.toDF().toDF("user_id", "day"),
      ckpt.toString,
      sink = df => df.collect().foreach { r =>
        deltas :+= ((r.getLong(0), r.getLong(1)))
      })
    var stateRows = Vector.empty[Long]
    try {
      Seq(b1, b2, b3, b4).foreach { b =>
        input.addData(b.toIndexedSeq: _*)
        q.processAllAvailable()
        stateRows :+= q.lastProgress.stateOperators.apply(0).numRowsTotal
      }
    } finally q.stop()

    // all 21 users carried state after batch 1; only user 0 survives
    // the watermark passing the idle users' age-out alarm
    stateRows.head shouldBe 21L
    stateRows.last shouldBe 1L
    // aging changed STATE, not RESULTS: exactly-once per pair, and the
    // fold equals the brute-force windowed COUNT(DISTINCT) (no event
    // here is late, so the horizon clamp suppresses nothing)
    deltas.distinct.size shouldBe deltas.size
    val all = b1 ++ b2 ++ b3 ++ b4
    val wins = (all.map(_._2).min - 6) to all.map(_._2).max
    val brute = wins.map { w =>
      w -> all.filter(e => e._2 >= w && e._2 <= w + 6)
        .map(_._1).distinct.size.toLong
    }.filter(_._2 > 0).toMap
    deltas.groupBy(_._2).view.mapValues(_.size.toLong).toMap shouldBe brute
  }

  test("a straggler between the lagged late-events watermark and the " +
      "eviction watermark cannot kill the stream: the age-out alarm " +
      "clamps above the current watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft-sdist-strag-ckpt")
    val input = MemoryStream[(Long, Long)]
    @volatile var deltas = Vector.empty[(Long, Long)]
    val q = StreamingDistinct.slidingDistinctStream(
      input.toDF().toDF("user_id", "day"), ckpt.toString,
      sink = df => df.collect().foreach { r =>
        deltas :+= ((r.getLong(0), r.getLong(1))) })
    try {
      input.addData((1L, 100L)); q.processAllAvailable() // wm -> day 93
      input.addData((1L, 130L)); q.processAllAvailable() // wm -> day 123
      // straggler: day 110 for a NEW user, with a raw age-out alarm
      // (110 + 7 = day 117) BELOW the current eviction watermark
      // (123). Depending on the engine's watermark propagation the
      // row is either dropped by the late filter or ADMITTED (Spark's
      // two-watermark semantics filter input against the lagged
      // late-events watermark while setTimeoutTimestamp validates
      // against the current one, throwing below it); the alarm clamp
      // makes the armed stamp valid in the admitted case, and this
      // gate pins stream survival + window suppression either way
      input.addData((2L, 110L)); q.processAllAvailable()
      // the straggler's windows ([104, 110]) are entirely below the
      // horizon (117): suppressed, per the documented lateness
      // contract — and the stream is alive to process more data
      deltas.filter(_._1 == 2L) shouldBe empty
      input.addData((1L, 131L)); q.processAllAvailable()
      q.isActive shouldBe true
      deltas.filter(_._1 == 1L).map(_._2).distinct.size should be > 0
    } finally q.stop()
  }
}
