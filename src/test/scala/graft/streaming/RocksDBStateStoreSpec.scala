package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, StandardOpenOption}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** The stateful streaming machines (chunk-tail `flatMapGroupsWithState`,
  * watermark dedup) re-run under the RocksDB state store provider — the
  * provider a 100M-monitored-file deployment needs (see
  * [[StateStores]]). Same scenarios as FileStreamPipelineSpec; what's
  * new here is the provider swap plus proof from the checkpoint
  * artifacts that RocksDB actually held the state (the conf silently
  * falling back to the HDFS provider would still pass the behavioral
  * assertions).
  */
class RocksDBStateStoreSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  private def withRocksDB[A](body: => A): A = {
    val prev = spark.conf.getOption(StateStores.ProviderKey)
    StateStores.select(spark)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(StateStores.ProviderKey, v)
      case None    => spark.conf.unset(StateStores.ProviderKey)
    }
  }

  /** All file names under the checkpoint's state/ tree. */
  private def stateFiles(ckpt: Path): List[String] = {
    val state = ckpt.resolve("state")
    if (!Files.exists(state)) Nil
    else {
      val s = Files.walk(state)
      try s.iterator().asScala.filter(Files.isRegularFile(_))
        .map(_.getFileName.toString).toList
      finally s.close()
    }
  }

  test("chunk tail state survives a restart under RocksDB, and the " +
      "checkpoint holds RocksDB artifacts, not HDFS-provider deltas") {
    withRocksDB {
      val dir = Files.createTempDirectory("graft-rocks")
      val ckpt = Files.createTempDirectory("graft-rocks-ckpt")
      val out = Files.createTempDirectory("graft-rocks-out")
      def write(name: String, body: String): Unit =
        Files.write(dir.resolve(name), body.getBytes(UTF_8), StandardOpenOption.CREATE)
      def startQuery() = FileStreamPipeline.changeRecords(spark, s"$dir/*", "rocks")
        .writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString).outputMode("append").start()

      val q1 = startQuery()
      write("f.part0", "hello")
      q1.processAllAvailable()
      q1.stop()

      write("f.part1", " again")
      val q2 = startQuery()
      try {
        q2.processAllAvailable()
        val rows = spark.read.parquet(out.toString).collect()
          .map(r => (r.getAs[Long]("offset"), new String(r.getAs[Array[Byte]]("value"), UTF_8)))
          .sortBy(_._1)
        // offset 5 proves the tail state (totalSize=5) crossed the
        // restart through the RocksDB store
        rows.toSeq shouldBe Seq((0L, "hello"), (5L, " again"))
      } finally q2.stop()

      // provider proof: RocksDB snapshots/changelogs, and none of the
      // HDFS provider's .delta files
      val files = stateFiles(ckpt)
      files should not be empty
      files.exists(f => f.endsWith(".zip") || f.endsWith(".changelog")) shouldBe true
      files.exists(_.endsWith(".delta")) shouldBe false
    }
  }

  test("watermark dedup drops cross-batch re-deliveries under RocksDB") {
    withRocksDB {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val ckpt = Files.createTempDirectory("graft-rocks-dedup-ckpt")
      val input = MemoryStream[(String, Long, java.sql.Timestamp)]
      val deduped = FileStreamPipeline.dedupWithinWatermark(
        input.toDF().toDF("path", "offset", "ts"), "ts", "10 minutes",
        Seq("path", "offset"))
      val q = deduped.writeStream.format("memory").queryName("rocks_dedup_out")
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append").start()
      try {
        def ts(minute: Int) = new java.sql.Timestamp(1700000000000L + minute * 60000L)
        input.addData(("/a", 0L, ts(0)), ("/a", 0L, ts(1)))
        q.processAllAvailable()
        input.addData(("/a", 0L, ts(2)), ("/b", 0L, ts(2)))
        q.processAllAvailable()
        spark.table("rocks_dedup_out").collect()
          .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq shouldBe
          Seq(("/a", 0L), ("/b", 0L))
        stateFiles(ckpt)
          .exists(f => f.endsWith(".zip") || f.endsWith(".changelog")) shouldBe true
      } finally q.stop()
    }
  }

  test("existing checkpoints pin their provider: restarting an HDFS-provider " +
      "checkpoint under a RocksDB session conf keeps state intact") {
    val dir = Files.createTempDirectory("graft-pin")
    val ckpt = Files.createTempDirectory("graft-pin-ckpt")
    val out = Files.createTempDirectory("graft-pin-out")
    def write(name: String, body: String): Unit =
      Files.write(dir.resolve(name), body.getBytes(UTF_8), StandardOpenOption.CREATE)
    def startQuery() = FileStreamPipeline.changeRecords(spark, s"$dir/*", "pin")
      .writeStream.format("parquet")
      .option("path", out.toString)
      .option("checkpointLocation", ckpt.toString).outputMode("append").start()

    // first run on the default (HDFS-backed) provider
    val q1 = startQuery()
    write("g.part0", "abc")
    q1.processAllAvailable()
    q1.stop()

    // second run with the session pointing at RocksDB: offsets and tail
    // state must still recover — a deployment flipping the conf without
    // a new checkpoint location must not corrupt or lose state
    withRocksDB {
      write("g.part1", "def")
      val q2 = startQuery()
      try {
        q2.processAllAvailable()
        spark.read.parquet(out.toString).collect()
          .map(r => (r.getAs[Long]("offset"), new String(r.getAs[Array[Byte]]("value"), UTF_8)))
          .sortBy(_._1).toSeq shouldBe Seq((0L, "abc"), (3L, "def"))
      } finally q2.stop()
    }
  }
}
