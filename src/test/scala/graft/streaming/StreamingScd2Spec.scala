package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions.lit
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** End-to-end gate for continuous SCD2 maintenance: intra-batch
  * last-change-wins, cross-batch version chaining, interval
  * reconstruction from the append-only log, and survival of the
  * periodic zero-exchange compaction.
  */
class StreamingScd2Spec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("streaming SCD2: version log, interval reconstruction, compaction") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val table = "scd2_state"
    val ckpt = Files.createTempDirectory("graft-scd2-ckpt")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // (key, nationkey, acctbal, segment, change_seq)
    val input = MemoryStream[(Long, Int, Double, String, Long)]
    @volatile var emitted = Vector.empty[(Long, Long)] // (key, valid_from)
    val q = StreamingScd2.scd2Stream(
      input.toDF().toDF("c_custkey", "c_nationkey", "c_acctbal",
        "c_mktsegment", "change_seq"),
      table, buckets = 4, ckpt.toString,
      sink = df => emitted ++= df.collect().toVector
        .map(r => (r.getLong(0), r.getLong(4))).sorted,
      compactEvery = 2L)

    def tableFiles(): Int = {
      val loc = new java.io.File(new java.net.URI(
        spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(table)).location.toString))
      loc.listFiles().count(_.getName.endsWith(".parquet"))
    }

    try {
      // batch 0: keys 1 and 2 born
      input.addData((1L, 5, 10.0, "AUTO", 1L), (2L, 7, 20.0, "HOME", 2L))
      q.processAllAvailable()
      emitted shouldBe Vector((1L, 0L), (2L, 0L))

      // batch 1: key 1 changed TWICE in one batch (seq 3 then 4 —
      // last wins: segment MOVED2), key 3 born; compaction runs after
      input.addData((1L, 5, 11.0, "MOVED1", 3L),
        (1L, 5, 12.0, "MOVED2", 4L), (3L, 9, 30.0, "BIKE", 5L))
      q.processAllAvailable()
      emitted shouldBe Vector((1L, 0L), (2L, 0L), (1L, 1L), (3L, 1L))
      tableFiles() should be <= 4 // compacted to one file per bucket

      // batch 2: key 2 changes
      input.addData((2L, 7, 21.0, "MOVED3", 6L))
      q.processAllAvailable()

      // the version LOG is exactly one row per (key, touched batch)
      val log = spark.table(table).collect()
        .map(r => (r.getLong(0), r.getLong(4), r.getString(3))).sorted.toSeq
      log shouldBe Seq((1L, 0L, "AUTO"), (1L, 1L, "MOVED2"),
        (2L, 0L, "HOME"), (2L, 2L, "MOVED3"), (3L, 1L, "BIKE"))

      // interval reconstruction: closed versions chain gaplessly into
      // their successors; exactly one current version per key
      val snap = StreamingScd2.scd2Snapshot(spark, table).collect()
        .map(r => (r.getLong(0), r.getLong(4), r.getLong(5),
          r.getBoolean(6), r.getString(3))).sorted.toSeq
      snap shouldBe Seq(
        (1L, 0L, 1L, false, "AUTO"), (1L, 1L, 9999L, true, "MOVED2"),
        (2L, 0L, 2L, false, "HOME"), (2L, 2L, 9999L, true, "MOVED3"),
        (3L, 1L, 9999L, true, "BIKE"))
    } finally {
      q.stop()
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("a replayed batch leaves the version log unchanged (batch-id idempotence)") {
    import spark.implicits._
    val table = "scd2_replay_state"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      val b0 = Seq((1L, 5, 10.0, "AUTO", 1L), (2L, 7, 20.0, "HOME", 2L))
        .toDF("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment",
          "change_seq")
      var emissions = 0
      StreamingScd2.foldBatch(b0, 0L, table, 4, _ => emissions += 1)
      val after1 = spark.table(table).collect()
        .map(r => (r.getLong(0), r.getLong(4))).sorted.toSeq
      // the crash-replay path: same batch, same id, run again
      StreamingScd2.foldBatch(b0, 0L, table, 4, _ => emissions += 1)
      val after2 = spark.table(table).collect()
        .map(r => (r.getLong(0), r.getLong(4))).sorted.toSeq
      after2 shouldBe after1
      after2 shouldBe Seq((1L, 0L), (2L, 0L))
      // emission is at-least-once by contract — the replay re-emits
      emissions shouldBe 2
      // a NEW batch id still folds
      StreamingScd2.foldBatch(b0.withColumn("c_mktsegment", lit("MOVED")),
        1L, table, 4, _ => ())
      spark.table(table).count() shouldBe 4L
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }
}
