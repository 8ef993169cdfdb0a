package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the [[Tables]] `events` contract: `ts` is an epoch-NANOSECOND
  * Long regardless of the physical encoding the driver generated —
  * INT64 TIMESTAMP(NANOS) (read as a nanos Long via nanosAsLong) or
  * TIMESTAMP(MICROS) (read as a timestamp and normalized at the scan).
  * Every event-time operator and every `epoch_us(ts) <-> ts div 1000`
  * oracle pairing depends on this single boundary.
  */
class TablesSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("events ts arrives as epoch-nanos Long from the driver testdata") {
    val df = Tables.events(spark, "/root/testdata/sf0.001")
    df.schema("ts").dataType shouldBe LongType
    // sanity: values are plausible epoch nanos (year >= 2000), so a
    // micros- or millis-scaled misread would fail by 3+ orders
    val mn = df.agg(org.apache.spark.sql.functions.min("ts")).head.getLong(0)
    mn should be > 946684800L * 1000000000L
  }

  test("a TIMESTAMP(MICROS) events file normalizes to the same nanos as a raw-long file") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-events-enc").toString
    val micros = 1700000000123456L // 2023-11-14T22:13:20.123456Z
    // micros-encoded timestamp (what the regenerated driver data ships)
    spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, java.time.LocalDateTime.ofEpochSecond(
        micros / 1000000L, (micros % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC))),
      StructType(Seq(StructField("event_id", LongType), StructField("ts", TimestampNTZType))))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val normalized = Tables.events(spark, dir)
    normalized.schema("ts").dataType shouldBe LongType
    normalized.select("ts").as[Long].head() shouldBe micros * 1000L
  }
}
