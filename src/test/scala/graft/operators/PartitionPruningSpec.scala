package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{Tables, TestSpark}

/** Proves the partition-layout claims for a Hive-style partitioned
  * lake table — the storage layout a 100 TB corpus actually uses:
  *
  *  1. static partition pruning: a filter on the partition column is a
  *     metadata operation — the executed scan READS only the matching
  *     directory's files (numFiles metric), non-matching directories
  *     are never opened;
  *  2. partition-column filters compose with data filters (which push
  *     down to the row-group level separately);
  *  3. dynamic partition pruning: a join against a filtered dim prunes
  *     fact partitions at RUNTIME from the dim side's values.
  */
class PartitionPruningSpec extends AnyFunSuite with Matchers
    with org.scalatest.BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  // one shared layout: the data is identical across tests, and the
  // temp tree is removed after the suite
  private lazy val partDir: String = {
    val dir = Files.createTempDirectory("graft_part").toFile.getAbsolutePath
    Tables.events(spark, sf)
      .write.mode("overwrite")
      .partitionBy("event_type")
      .parquet(dir)
    dirsToClean += dir
    dir
  }
  private val dirsToClean = scala.collection.mutable.Buffer.empty[String]

  override def afterAll(): Unit = {
    dirsToClean.foreach { d =>
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(new java.io.File(d))
    }
    super.afterAll()
  }

  /** Partition values present on disk (self-maintaining: read from the
    * written layout, not hardcoded fixture knowledge). */
  private def partsOnDisk(dir: String): Seq[String] =
    new java.io.File(dir).listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("event_type="))
      .map(_.getName.stripPrefix("event_type="))

  /** Parquet files on disk under one partition directory. */
  private def filesUnder(dir: String, part: String): Long = {
    val d = new java.io.File(s"$dir/event_type=$part")
    Option(d.listFiles()).map(_.count(_.getName.endsWith(".parquet")).toLong)
      .getOrElse(0L)
  }

  /** Executes the frame fully, then returns its file scan node with
    * populated metrics (descending through AQE's final plan). */
  private def executedScan(df: DataFrame): FileSourceScanExec = {
    df.collect()
    val top = df.queryExecution.executedPlan
    val finalPlan = top match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    finalPlan.collectLeaves()
      .collectFirst { case f: FileSourceScanExec => f }
      .getOrElse(fail("no FileSourceScanExec in the executed plan"))
  }

  test("filter on the partition column prunes directories before the scan") {
    val dir = partDir
    val df = spark.read.parquet(dir).filter(col("event_type") === "purchase")

    // the plan carries the predicate as a PartitionFilter (metadata),
    // not a PushedFilter (per-row-group)
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    formatted should include regex "PartitionFilters.*event_type"

    // the executed scan opened ONLY the matching directory's files
    val scan = executedScan(df)
    val purchaseFiles = filesUnder(dir, "purchase")
    purchaseFiles should be > 0L
    scan.metrics("numFiles").value shouldBe purchaseFiles
    // and that is a strict subset of the table's files
    partsOnDisk(dir).size should be > 1
    val allFiles = partsOnDisk(dir).map(filesUnder(dir, _)).sum
    purchaseFiles should be < allFiles

    // values survive the round-trip (partition column re-materialized)
    df.count() shouldBe Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
  }

  test("partition filters compose with data filters (which push down separately)") {
    val dir = partDir
    val df = spark.read.parquet(dir)
      .filter(col("event_type") === "click" && col("value") > 100.0)
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    formatted should include regex "PartitionFilters.*event_type"
    formatted should include regex "PushedFilters.*GreaterThan\\(value"
    executedScan(df).metrics("numFiles").value shouldBe filesUnder(dir, "click")
  }

  test("dynamic partition pruning fires on a join against a filtered dim") {
    val dir = partDir
    import spark.implicits._
    // the stats-based benefit estimate declines DPP on kilobyte-scale
    // fixtures; the fallback ratio path is what a real lake hits when
    // stats are missing — force it so the mechanism itself is testable
    val key = "spark.sql.optimizer.dynamicPartitionPruning.useStats"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      // two requirements of the DPP rule, both easy to miss: the dim
      // filter must be "likely selective" (an EqualTo/In/Like — a bare
      // boolean column is simplified away before the rule runs), and
      // the dim must be a REAL scan — a LocalRelation gets its filter
      // constant-folded by ConvertToLocalRelation, leaving no Filter
      // node for the rule to see
      val dimDir = Files.createTempDirectory("graft_dim").toFile.getAbsolutePath
      dirsToClean += dimDir
      Seq(("purchase", "conversion"), ("click", "browse"),
        ("view", "browse"), ("signup", "account"), ("error", "noise"))
        .toDF("etype", "category")
        .write.mode("overwrite").parquet(dimDir)
      val dim = spark.read.parquet(dimDir)
      val fact = spark.read.parquet(dir)
      val joined = fact.join(dim.filter($"category" === "conversion"),
        fact("event_type") === dim("etype"))
      // the fact scan's partition filters carry a runtime subquery:
      // partitions to read are decided from the dim values at runtime
      val plan = joined.queryExecution.executedPlan.toString
      plan.toLowerCase should include("dynamicpruning")
      joined.count() shouldBe Tables.events(spark, sf)
        .filter(col("event_type") === "purchase").count()
    } finally spark.conf.set(key, prev)
  }
}
