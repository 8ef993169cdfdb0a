package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shim
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Gates for the flag-dispatched pin strategy (r16 verdict item 8):
  * `spark.graft.pin = reliable` must swap every shim pin from
  * executor-local checkpoint blocks to a reliable checkpoint under
  * `spark.graft.checkpointDir` WITHOUT changing what any caller
  * observes — same rows, same per-partition stats, same frozen
  * nondeterministic values across repeated reads. The suite runs every
  * contract under BOTH modes so a regression in either path fails by
  * name.
  */
class PinModeSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def withPinMode[A](mode: String)(body: => A): A = {
    val prev = spark.conf.getOption("spark.graft.pin")
    spark.conf.set("spark.graft.pin", mode)
    try body
    finally prev match {
      case Some(v) => spark.conf.set("spark.graft.pin", v)
      case None    => spark.conf.unset("spark.graft.pin")
    }
  }

  private def sampleDf(): DataFrame = {
    import spark.implicits._
    (1L to 400L).toDF("k")
      .repartition(5, $"k")
      .withColumn("v", $"k" * 3L - 7L)
  }

  for (mode <- Seq("localCheckpoint", "reliable")) {
    test(s"[$mode] pin freezes nondeterministic values across reads") {
      withPinMode(mode) {
        val pinned = Shim.pin(sampleDf().withColumn("r", rand(seed = 0) * lit(1e12)))
        val a = pinned.collect().map(_.toSeq).toSet
        val b = pinned.collect().map(_.toSeq).toSet
        a shouldBe b
        a.size shouldBe 400
      }
    }

    test(s"[$mode] cutCheckpoint preserves rows and resets plan stats") {
      withPinMode(mode) {
        val df = sampleDf()
        val cut = Shim.cutCheckpoint(df)
        cut.collect().map(_.toSeq).toSet shouldBe df.collect().map(_.toSeq).toSet
        // the stats cut: the rebuilt LogicalRDD must carry the constant
        // leaf default, not the origin plan's estimate (the whole point
        // of cutCheckpoint vs a plain checkpoint)
        val stats = cut.queryExecution.optimizedPlan.stats.sizeInBytes
        stats shouldBe spark.sessionState.conf.defaultSizeInBytes
      }
    }

    test(s"[$mode] pinWithPartitionStats stats agree with the pinned data") {
      withPinMode(mode) {
        import spark.implicits._
        val df = sampleDf().sortWithinPartitions($"k")
        val (pinned, stats) = Shim.pinWithPartitionStats(df, Seq("k", "v"))
        // same rows out
        pinned.collect().map(_.toSeq).toSet shouldBe df.collect().map(_.toSeq).toSet
        // stats index IS the partition id; counts and last-row longs
        // must match what the pinned frame itself reports
        val byPart = pinned
          .groupBy(spark_partition_id().as("p"))
          .agg(count(lit(1)).as("n"), max($"k").as("lk"), max($"v").as("lv"))
          .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
          .toMap
        stats.length shouldBe 5
        stats.zipWithIndex.foreach { case ((n, lastVals), p) =>
          byPart.get(p) match {
            case Some((cn, lk, lv)) =>
              n shouldBe cn
              lastVals.toSeq shouldBe Seq(lk, lv)
            case None =>
              n shouldBe 0L
              (lastVals eq null) shouldBe true
          }
        }
      }
    }
  }

  test("[reliable] pin actually writes a reliable checkpoint") {
    withPinMode("reliable") {
      val dir = java.nio.file.Files.createTempDirectory("graft-ck-spec").toString
      val prevDir = spark.conf.getOption("spark.graft.checkpointDir")
      spark.conf.set("spark.graft.checkpointDir", dir)
      try {
        Shim.pin(sampleDf()).count() shouldBe 400L
        val ckDir = spark.sparkContext.getCheckpointDir
        ckDir.isDefined shouldBe true
        // files landed under the session's checkpoint dir (ours if this
        // suite ran first, an earlier test's otherwise — either proves
        // the reliable path wrote through)
        val root = new java.io.File(new java.net.URI(ckDir.get).getPath)
        def anyFile(f: java.io.File): Boolean =
          f.isFile || Option(f.listFiles()).exists(_.exists(anyFile))
        anyFile(root) shouldBe true
      } finally prevDir match {
        case Some(v) => spark.conf.set("spark.graft.checkpointDir", v)
        case None    => spark.conf.unset("spark.graft.checkpointDir")
      }
    }
  }
}
