package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{Tables, TestSpark}

/** Proves the ORC source is a drop-in for the parquet documents table:
  * a parquet→ORC→read round trip is row-identical with the canonical
  * column order, a filter reaches the ORC reader as a pushed search
  * argument, and a narrow projection prunes the read schema to its
  * columns — the three properties that make the columnar face worth
  * having over CSV for warehouse exports.
  */
class OrcCorpusSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("parquet -> orc -> read round trip is row-identical in canonical order") {
    val dir = Files.createTempDirectory("graft-orc").toString
    val docs = Tables.documents(spark, sf)
    // write from a scrambled column order: the reader must restore the
    // canonical layout
    OrcCorpus.write(
      docs.select("n_chars", "text", "doc_id", "source", "lang"), dir)
    val back = OrcCorpus.documents(spark, dir)
    back.schema.fieldNames.toSeq shouldBe
      Seq("doc_id", "text", "lang", "source", "n_chars")
    back.orderBy("doc_id").collect().map(_.toString) shouldBe
      docs.select("doc_id", "text", "lang", "source", "n_chars")
        .orderBy("doc_id").collect().map(_.toString)
  }

  test("filters push down to the ORC reader and projections prune columns") {
    val dir = Files.createTempDirectory("graft-orc-push").toString
    OrcCorpus.write(Tables.documents(spark, sf), dir)
    val q = OrcCorpus.documents(spark, dir)
      .filter(org.apache.spark.sql.functions.col("doc_id") < 10L)
      .select("doc_id", "lang")
    val plan = q.queryExecution.executedPlan.toString
    // the doc_id predicate reaches the scan as a pushed filter…
    plan should include("PushedFilters")
    plan should include regex "PushedFilters: \\[[^\\]]*doc_id[^\\]]*\\]"
    // …and the read schema carries only the projected/filter columns,
    // never text (the wide column a pruned scan must not fetch)
    val readSchema = "ReadSchema: [^\\n]*".r.findFirstIn(plan).get
    readSchema should include("doc_id")
    readSchema should not include "text"
    q.collect().length shouldBe Tables.documents(spark, sf)
      .filter("doc_id < 10").count().toInt
  }

  test("streaming face reads a growing ORC directory with the batch contract") {
    val dir = Files.createTempDirectory("graft-orc-stream")
    val docs = Tables.documents(spark, sf).limit(7)
    OrcCorpus.write(docs, dir.toString)
    val schema = spark.read.orc(dir.toString).schema
    val stream = OrcCorpus.documentsStream(spark, dir.toString, schema)
    stream.isStreaming shouldBe true
    val out = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = stream.writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("graft-orc-ckpt").toString)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         _: Long) => out.addAndGet(b.count()); ()
      }
      .start()
    try { q.processAllAvailable(); out.get() shouldBe 7L }
    finally q.stop()
  }
}
