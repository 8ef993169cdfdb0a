package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Stream-stream event-time interval joins: stateful symmetric hash
  * join across micro-batches, watermark-bounded state, outer rows
  * emitted only once the watermark proves no match can arrive.
  */
class StreamJoinsSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  private def ts(minute: Int) =
    new java.sql.Timestamp(1700000000000L + minute * 60000L)

  test("interval inner join matches across micro-batches and equals the batch join") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[(String, Int, java.sql.Timestamp)]
    val buys = MemoryStream[(String, Int, java.sql.Timestamp)]
    val joined = StreamJoins.intervalJoin(
      clicks.toDF().toDF("user", "click_id", "cts"),
      buys.toDF().toDF("user", "buy_id", "bts"),
      keys = Seq("user"), leftTimeCol = "cts", rightTimeCol = "bts",
      delay = "5 minutes", lower = "0 seconds", upper = "10 minutes")
      .select($"l.user", $"click_id", $"buy_id")
    val q = joined.writeStream.format("memory").queryName("sj_inner")
      .outputMode("append").start()
    val clickRows = Seq(("u1", 1, ts(0)), ("u2", 2, ts(0)))
    val buyRows = Seq(("u1", 10, ts(5)), ("u2", 20, ts(8)), ("u1", 11, ts(20)))
    try {
      clicks.addData(clickRows: _*)
      buys.addData(buyRows.head)
      q.processAllAvailable()
      // the u2 buy arrives a micro-batch AFTER its click: joining it
      // proves the left row waited in the join state store. The ts(20)
      // buy is outside [click, click+10m] and must not join.
      buys.addData(buyRows.tail: _*)
      q.processAllAvailable()
      val got = spark.table("sj_inner").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
      got shouldBe Set(("u1", 1, 10), ("u2", 2, 20))

      // the same helper applied to batch frames (watermarks eliminated)
      // must produce the same rows — streaming adds no join semantics
      val expected = StreamJoins.intervalJoin(
        clickRows.toDF("user", "click_id", "cts"),
        buyRows.toDF("user", "buy_id", "bts"),
        keys = Seq("user"), leftTimeCol = "cts", rightTimeCol = "bts",
        delay = "5 minutes", lower = "0 seconds", upper = "10 minutes")
        .select($"l.user", $"click_id", $"buy_id")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
      got shouldBe expected
    } finally q.stop()
  }

  test("interval left-outer join emits the null-padded row only after the watermark closes the window") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[(String, Int, java.sql.Timestamp)]
    val buys = MemoryStream[(String, Int, java.sql.Timestamp)]
    val joined = StreamJoins.intervalJoin(
      clicks.toDF().toDF("user", "click_id", "cts"),
      buys.toDF().toDF("user", "buy_id", "bts"),
      keys = Seq("user"), leftTimeCol = "cts", rightTimeCol = "bts",
      delay = "5 minutes", lower = "0 seconds", upper = "10 minutes",
      joinType = "left_outer")
      .select($"click_id", $"buy_id")
    val q = joined.writeStream.format("memory").queryName("sj_outer")
      .outputMode("append").start()
    try {
      clicks.addData(("u1", 1, ts(0)), ("u3", 3, ts(1)))
      buys.addData(("u1", 10, ts(3)))
      q.processAllAvailable()
      def got() = spark.table("sj_outer").collect()
        .map(r => (r.getInt(0), if (r.isNullAt(1)) None else Some(r.getInt(1))))
        .toSet
      // u3's window [ts(1), ts(11)] is still open: no null-padded row yet
      got() shouldBe Set((1, Some(10)))

      // advance BOTH watermarks far past the window (watermark is the
      // min across inputs); the engine's no-data batch then emits the
      // certainty-of-no-match outer row
      clicks.addData(("zz", 99, ts(120)))
      buys.addData(("zz", 98, ts(120)))
      q.processAllAvailable()
      got() shouldBe Set((1, Some(10)), (3, None), (99, Some(98)))
    } finally q.stop()
  }
}
