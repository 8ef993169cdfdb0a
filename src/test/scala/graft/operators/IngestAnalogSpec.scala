package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{Tables, TestSpark}

/** The executed-compaction payoff gates (round-12 verdict #7): the
  * DuckDB oracle proves the census survives the rewrite; these prove
  * the PHYSICAL contract — one data file per bin, the small-file
  * population collapsed, full bins inside the logical target band,
  * and per-file bytes within a small spread. Run at sf0.01 so the
  * rewrite genuinely produces multiple bins.
  */
class IngestAnalogSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"
  private val TargetB = 10000000L

  test("executed compaction: one data file per bin, file population " +
      "collapses, full bins inside the [T - max_group, T + max_group) " +
      "band, physical file sizes within a small spread") {
    import spark.implicits._
    val census = graft.SparkEntry.queries("ref_compaction_apply")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(_._1)
    census.length should be > 1 // multiple bins, or the band gate is vacuous
    // contract: exactly one physical data file per bin
    census.foreach { case (bin, nFiles, _, _, _) =>
      withClue(s"bin $bin: ") { nFiles shouldBe 1L }
    }
    // the small-files problem genuinely collapses: before = one file
    // per (user, type) group; after = one per bin
    val groups = Tables.events(spark, sf)
      .groupBy($"user_id", $"event_type")
      .agg(sum(expr("cast(cast(value as decimal(18,2)) * 100 as bigint)"))
        .as("size_b"))
      .select($"size_b").as[Long].collect()
    val maxGroup = groups.max
    census.length.toLong * 10 should be <= groups.length.toLong
    // logical band: every bin except the last sits within max_group of
    // the target (the next group's arrival is what closes a bin), and
    // the tail bin cannot exceed the band's top
    census.dropRight(1).foreach { case (bin, _, _, _, bytes) =>
      withClue(s"bin $bin bytes $bytes vs target $TargetB ± $maxGroup: ") {
        math.abs(bytes - TargetB) should be < maxGroup
      }
    }
    census.last._5 should be < (TargetB + maxGroup)
    // byte conservation: the rewrite lost and duplicated nothing
    census.map(_._5).sum shouldBe groups.sum
    // physical spread: full-bin parquet files hold similar logical
    // content, so their on-disk sizes stay within a small factor
    val outDir = IngestAnalog.compactionApplied(spark, sf)
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fullBins = census.dropRight(1).map(_._1).toSet
    val sizes = fs.listStatus(outPath).toSeq
      .filter(st => st.isDirectory &&
        fullBins.contains(st.getPath.getName.stripPrefix("bin=").toLong))
      .flatMap(st => fs.listStatus(st.getPath).toSeq)
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
      .map(_.getLen)
    sizes.length shouldBe fullBins.size
    withClue(s"file sizes $sizes: ") {
      sizes.max.toDouble / sizes.min should be < 3.0
    }
  }

  test("the bin-plan broadcast is SIZE-GATED: forced onto the large " +
      "path (threshold 0 — plain equality join, AQE picks the " +
      "strategy) the rewrite is bit-identical to the broadcast path") {
    import spark.implicits._
    def censusOf(outDir: String) = spark.read.parquet(outDir)
      .groupBy($"bin")
      .agg(countDistinct($"user_id", $"event_type").as("n_groups"),
        count(lit(1)).as("n_rows"), sum($"cents").as("bin_bytes"))
      .collect()
      .map(r => (r.getAs[Number]("bin").longValue, r.getLong(1),
        r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val viaBroadcast = censusOf(IngestAnalog.compactionApplied(spark, sf))
    // a fresh artifact root forces a rebuild (same key, empty cache)
    // through the >threshold branch
    val custom = java.nio.file.Files
      .createTempDirectory("graft_compact_gate").toString
    spark.conf.set("spark.graft.artifactsRoot", custom)
    try {
      val outDir = IngestAnalog.compactionApplied(spark, sf,
        broadcastPlanThreshold = 0L)
      outDir should startWith(custom) // genuinely the fresh build
      censusOf(outDir) shouldBe viaBroadcast
      // the physical contract survives the plan-shape change too
      val outPath = new org.apache.hadoop.fs.Path(outDir)
      val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(outPath).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("bin="))
        .foreach { st =>
          val files = fs.listStatus(st.getPath)
            .count(f => f.isFile && !f.getPath.getName.startsWith("_"))
          withClue(s"${st.getPath.getName}: ") { files shouldBe 1 }
        }
    } finally {
      spark.conf.unset("spark.graft.artifactsRoot")
      org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(custom))
      ()
    }
  }

  test("incremental drain: an append-only second run rewrites ONLY the " +
      "newly closed bins, leaves drained files byte-untouched, " +
      "accumulates the from-scratch answer, and a no-growth run " +
      "drains nothing") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_drain").toString
    val stateDir = s"$root/state"
    val outDir = s"$root/bins"
    // arrival census: file i has offset 30*i, binSize 100 => file i is
    // in bin (30*i) div 100; 40 files close bins 0..10 (bin 11 open)
    def census(n: Int) = (0 until n).map(i => (i.toLong, 30L))
      .toDF("file_id", "size_b")
    def binsOf(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select($"bin").distinct().as[Long].collect().toSet
    def snapshot(): Map[String, (Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(outDir))
        .map(f => f.getAbsolutePath -> ((f.length, f.lastModified))).toMap
    }
    try {
      val first = IngestAnalog.compactionDrained(
        spark, census(40), 100L, stateDir, outDir)
      val firstBins = binsOf(first)
      firstBins shouldBe (0L to 10L).toSet
      val drainedSnapshot = snapshot()
      // 20 more arrivals: bins 11..16 close (bin 17 opens at 30*59=1770)
      val second = IngestAnalog.compactionDrained(
        spark, census(60), 100L, stateDir, outDir)
      val secondBins = binsOf(second)
      secondBins shouldBe (11L to 16L).toSet
      secondBins.intersect(firstBins) shouldBe empty
      // every file drained in run 1 is byte-untouched by run 2
      val after = snapshot()
      drainedSnapshot.foreach { case (path, lm) =>
        withClue(path) { after(path) shouldBe lm }
      }
      // the accumulated output equals the from-scratch closed-bin set
      val accumulated = spark.read.parquet(outDir)
        .select($"file_id", $"size_b", $"bin").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          r.getAs[Number](2).longValue)).toSet
      val scratch = (0 until 60)
        .map(i => (i.toLong, 30L, (30L * i) / 100L))
        .filter(_._3 < 17L).toSet
      accumulated shouldBe scratch
      // nothing new arrived => nothing drains, state/output untouched
      val third = IngestAnalog.compactionDrained(
        spark, census(60), 100L, stateDir, outDir)
      third.count() shouldBe 0L
      snapshot() shouldBe after
    } finally {
      org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(root))
      ()
    }
  }
}
