package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{Tables, TestSpark}

/** Guarantee gates for the DGIM sliding-window counter: at every batch
  * boundary the per-key estimate must sit within half-the-oldest-bucket
  * of the EXACT windowed count (the paper's bound, checked against a
  * brute-force recount of everything streamed so far), state must stay
  * logarithmic in the window count, and the bucket invariants (≤2 per
  * size, power-of-two sizes, time-ordered) must hold after every fold.
  */
class StreamingDgimSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val W = 7L

  test("DGIM window estimates hold the half-oldest-bucket bound against " +
      "exact recounts at every batch boundary, with log-size state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft-dgim-ckpt")

    val evs = Tables.events(spark, sf)
      .selectExpr("event_type as key",
        "(ts div 1000) div 86400000000 as day", "event_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(e => (e._2, e._3))
    val cut1 = evs.length / 3
    val cut2 = 2 * evs.length / 3

    val input = MemoryStream[(String, Long, Long)]
    @volatile var latest = Map.empty[String, (Long, Long, Long, Long, Long)]
    val q = StreamingDgim.dgimStream(
      input.toDF().toDF("key", "day", "event_id"), W, ckpt.toString,
      sink = df => df.collect().foreach { r =>
        latest += r.getString(0) -> ((r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6)))
      })

    def checkAgainst(streamed: Seq[(String, Long, Long)]): Unit = {
      val byKey = streamed.groupBy(_._1)
      latest.keySet shouldBe byKey.keySet
      latest.foreach { case (k, (est, nBuckets, oldest, maxDay, total)) =>
        val kv = byKey(k)
        total shouldBe kv.size.toLong
        maxDay shouldBe kv.map(_._2).max
        val exact = kv.count(_._2 > maxDay - W).toLong
        withClue(s"key $k est=$est exact=$exact oldest=$oldest: ") {
          math.abs(est - exact) should be <= math.max(1L, oldest / 2L)
          // the bound is the PAPER's 50% guarantee
          est should be >= exact - exact / 2
          est should be <= exact + exact / 2 + 1
        }
        // state is logarithmic: at most 2 buckets per power-of-two size
        val maxSizes = 64 - java.lang.Long.numberOfLeadingZeros(
          math.max(1L, total))
        nBuckets should be <= 2L * (maxSizes + 1)
      }
    }

    try {
      input.addData(evs.slice(0, cut1).toIndexedSeq: _*)
      q.processAllAvailable()
      checkAgainst(evs.slice(0, cut1).toSeq)
      input.addData(evs.slice(cut1, cut2).toIndexedSeq: _*)
      q.processAllAvailable()
      checkAgainst(evs.slice(0, cut2).toSeq)
      input.addData(evs.slice(cut2, evs.length).toIndexedSeq: _*)
      q.processAllAvailable()
      checkAgainst(evs.toSeq)
    } finally q.stop()
    // the window genuinely binds: some key saw more than its window holds
    latest.exists { case (k, rep) =>
      rep._5 > evs.count(e => e._1 == k &&
        e._2 > rep._4 - W).toLong
    } shouldBe true
  }

  test("bucket mechanics: cascading merges keep <= 2 power-of-two buckets " +
      "per size, expiry drops exactly the fully-aged suffix") {
    import StreamingDgim.{append, estimate, Bucket, DgimState}
    // 10 same-day events: sizes must settle to a binary-ish profile
    var st = DgimState(Nil, Long.MinValue, 0L)
    (1 to 10).foreach(_ => st = append(st, 100L, W))
    st.buckets.map(_.size).sum shouldBe 10L
    st.buckets.foreach { b =>
      (b.size & (b.size - 1)) shouldBe 0L // power of two
    }
    st.buckets.map(_.size).groupBy(identity).values
      .foreach(_.size should be <= 2)
    // sizes non-decreasing newest -> oldest (the cascade invariant)
    val sizes = st.buckets.map(_.size)
    sizes.zip(sizes.tail).foreach { case (a, b) => a should be <= b }
    // estimate of an un-straddled window equals the exact count when
    // the oldest bucket is size 1; always within half the oldest
    math.abs(estimate(st.buckets) - 10L) should be <=
      math.max(1L, st.buckets.last.size / 2)
    // advance 8 days: every old bucket's newest element (day 100) is
    // at or behind 108 - 7, so the whole suffix expires
    st = append(st, 108L, W)
    st.buckets shouldBe List(Bucket(1L, 108L))
    estimate(st.buckets) shouldBe 1L
  }
}
