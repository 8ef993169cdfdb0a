package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, Tables, TestSpark}

/** Empty-corpus gates for the driver-collect verdict queries (ADVICE
  * round 10): each one aggregates to a single row and reads it on the
  * driver, so an all-null aggregate over ZERO input rows must become a
  * defined degenerate verdict — never an NPE on getLong/getDecimal or
  * a division by zero at plan-build time. The fixtures are real empty
  * parquet tables (sf0.001 schemas, zero rows) run through the SAME
  * registered query functions the driver executes, so the guard under
  * test is the production path, not a test-only twin.
  */
class EmptyInputSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  /** A temp sf-dir whose events/documents tables carry the real
    * schemas with zero rows. */
  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty").toString
    Seq("events", "documents", "part", "lineitem", "customer").foreach { t =>
      Tables(spark, "/root/testdata/sf0.001", t)
        .limit(0).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private def one(name: String): org.apache.spark.sql.Row = {
    val rows = SparkEntry.queries(name)(spark, emptyDir).collect()
    rows.length shouldBe 1
    rows(0)
  }

  test("the Mondrian faces on an empty customer table return EMPTY " +
      "relations — the degenerate split tree has no leaves, and no " +
      "level's aggregate or prefix sum throws on zero rows") {
    Seq("q_kanon_generalize", "q_kanon_apply", "q_kanon_drift")
      .foreach { q =>
        withClue(q) {
          SparkEntry.queries(q)(spark, emptyDir).collect().length shouldBe 0
        }
      }
  }

  test("evt_ks_drift on an empty events table yields the degenerate " +
      "no-drift verdict row") {
    val r = one("evt_ks_drift")
    (0 to 4).map(r.getLong) shouldBe Seq(0L, 0L, 0L, 0L, 0L)
    r.getBoolean(5) shouldBe false
  }

  test("evt_mannwhitney on an empty events table yields the degenerate " +
      "verdict row") {
    val r = one("evt_mannwhitney")
    (0 to 4).map(r.getLong) shouldBe Seq(0L, 0L, 0L, 0L, 0L)
    r.getBoolean(5) shouldBe false
  }

  test("evt_wilcoxon on an empty events table yields the degenerate " +
      "verdict row") {
    val r = one("evt_wilcoxon")
    (0 to 3).map(r.getLong) shouldBe Seq(0L, 0L, 0L, 0L)
    r.getBoolean(4) shouldBe false
  }

  test("evt_runs_test keeps its degenerate row on an empty events table") {
    val r = one("evt_runs_test")
    r.getBoolean(r.length - 1) shouldBe false
  }

  test("llm_doc_gini on an empty documents table yields gini 0 with a " +
      "0 denominator instead of dividing by it") {
    val r = one("llm_doc_gini")
    (0 to 4).map(r.getLong) shouldBe Seq(0L, 0L, 0L, 0L, 0L)
  }

  test("llm_doc_gini on an all-zero-mass corpus (sx = 0, n > 0) " +
      "yields the same defined degenerate readout") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-zmass").toString
    Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(5).withColumn("n_chars", lit(0L))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("llm_doc_gini")(spark, dir).collect()(0)
    r.getLong(0) shouldBe 5L
    (1 to 4).map(r.getLong) shouldBe Seq(0L, 0L, 0L, 0L)
  }

  test("markovStationary returns an empty stationary frame on an empty " +
      "transition frame instead of dividing by k = 0") {
    import spark.implicits._
    val cells = Seq.empty[(String, String, Long)].toDF("src", "dst", "n")
    val out = EventTime.markovStationary(spark, cells)
    out.columns.toSeq shouldBe Seq("state", "pi_nano", "n_out")
    out.count() shouldBe 0L
  }

  test("evt_kendall on an empty events table yields the degenerate " +
      "zero-association row (no inversion pass, no NPE)") {
    val r = one("evt_kendall")
    (0 to 5).map(r.getLong) shouldBe Seq(0L, 0L, 0L, 0L, 0L, 0L)
    r.getDouble(6) shouldBe 0.0
  }

  test("evt_moments on an empty events table yields the degenerate " +
      "zero-shape row instead of an NPE on the null power sums") {
    val r = one("evt_moments")
    (0 to 2).map(r.getLong) shouldBe Seq(0L, 0L, 0L)
    r.getDouble(3) shouldBe 0.0
    r.getDouble(4) shouldBe 0.0
  }

  test("evt_hill_tail on an empty events table yields the defined " +
      "zero row (no ln(0) evaluates on either engine)") {
    val r = one("evt_hill_tail")
    (0 to 1).map(r.getLong) shouldBe Seq(0L, 0L)
    r.getDouble(2) shouldBe 0.0
    r.getDouble(3) shouldBe 0.0
  }

  test("evt_sax on an empty events table yields an empty frame " +
      "instead of collecting breakpoints from nothing") {
    val out = SparkEntry.queries("evt_sax")(spark, emptyDir)
    out.columns.toSeq shouldBe Seq("day", "sax", "n_segs", "day_cents")
    out.count() shouldBe 0L
  }

  test("evt_pot_tail on an empty events table yields an empty frame " +
      "(the threshold is undefined), matching the oracle's empty join") {
    val out = SparkEntry.queries("evt_pot_tail")(spark, emptyDir)
    out.columns.toSeq shouldBe
      Seq("u_cents", "n_exceed", "sum_excess", "mean_excess")
    out.count() shouldBe 0L
  }

  test("q_hierarchy_increment on an empty part table degenerates to an " +
      "empty rollup, never an NPE on the cut scalar") {
    SparkEntry.queries("q_hierarchy_increment")(spark, emptyDir)
      .collect() shouldBe empty
  }

  test("llm_perceptron_learn on an empty corpus keeps zero weights and " +
      "defined zero accuracy for every epoch") {
    val rows = SparkEntry.queries("llm_perceptron_learn")(spark, emptyDir)
      .collect()
    rows.length shouldBe 3
    rows.foreach { r =>
      (1 to 7).map(r.getLong) shouldBe Seq.fill(7)(0L)
      r.getLong(8) shouldBe 0L
      r.getDouble(9) shouldBe 0.0
    }
    // exactly one pocket even in the degenerate trajectory
    rows.count(_.getBoolean(10)) shouldBe 1
  }

  test("llm_shannon_code on an empty corpus is the empty frame with " +
      "the full schema, not an empty-alphabet crash") {
    val df = SparkEntry.queries("llm_shannon_code")(spark, emptyDir)
    df.columns.toSeq shouldBe Seq("doc_id", "n_chars", "coded_bits",
      "raw_bits", "roundtrip_ok", "saved_permille")
    df.collect() shouldBe empty
  }

  test("q_densest_subgraph on an empty lineitem table reports four " +
      "zero-density rounds with round 0 best") {
    val rows = SparkEntry.queries("q_densest_subgraph")(spark, emptyDir)
      .collect()
    rows.length shouldBe 4
    rows.foreach { r =>
      r.getLong(1) shouldBe 0L
      r.getLong(2) shouldBe 0L
      r.getDouble(3) shouldBe 0.0
    }
    rows.count(_.getBoolean(4)) shouldBe 1
  }

  test("compactionDrained on an empty census drains nothing, creates no " +
      "bins, and commits no watermark") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-empty-drain").toString
    val empty = Seq.empty[(Long, Long)].toDF("file_id", "size_b")
    val out = IngestAnalog.compactionDrained(
      spark, empty, 100L, s"$root/state", s"$root/bins")
    out.count() shouldBe 0L
    new java.io.File(s"$root/bins").exists() shouldBe false
    new java.io.File(s"$root/state/wm").exists() shouldBe false
  }

  test("q_profile_events on an empty events table keeps its 5-row " +
      "per-column census with zero counts and null extrema/quantiles") {
    val rows = SparkEntry.queries("q_profile_events")(spark, emptyDir)
      .collect()
    rows.length shouldBe 5
    rows.foreach { r =>
      r.getLong(1) shouldBe 0L // n_rows
      r.getLong(2) shouldBe 0L // n_nulls
      r.getLong(3) shouldBe 0L // n_distinct
      r.isNullAt(4) shouldBe true // min_repr
      r.isNullAt(5) shouldBe true // max_repr
      r.isNullAt(6) shouldBe true // p50_repr
      r.isNullAt(7) shouldBe true // p99_repr
    }
  }
}
