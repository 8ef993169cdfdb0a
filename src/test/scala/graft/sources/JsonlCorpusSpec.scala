package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{Tables, TestSpark}

/** Proves the JSONL source is a drop-in for the parquet documents
  * table: a parquet→jsonl→read round trip is row-identical, corrupt
  * lines quarantine instead of failing or silently vanishing, gzip
  * shards read transparently, and the operator pack runs unchanged on
  * the JSONL-sourced frame.
  */
class JsonlCorpusSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("parquet -> jsonl -> read round trip is row-identical") {
    val dir = Files.createTempDirectory("graft-jsonl").toString
    val docs = Tables.documents(spark, sf)
    docs.write.mode("overwrite").json(dir)
    val back = JsonlCorpus.documents(spark, dir)
    back.schema.fieldNames.sorted shouldBe docs.schema.fieldNames.sorted
    back.orderBy("doc_id").collect().map(_.toString) shouldBe
      docs.orderBy("doc_id").collect().map(_.toString)
    JsonlCorpus.corruptLines(spark, dir).count() shouldBe 0L
  }

  test("corrupt lines quarantine; good lines and gzip shards still read") {
    val dir = Files.createTempDirectory("graft-jsonl-bad")
    Files.write(dir.resolve("good.jsonl"),
      ("""{"doc_id":1,"text":"alpha beta","lang":"en","source":"s0","n_chars":10}""" + "\n" +
       """not json at all""" + "\n" +
       """{"doc_id":2,"text":"gamma","lang":"de","source":"s1","n_chars":5}""")
        .getBytes(UTF_8))
    // a gzip shard: must read transparently via the Hadoop codec
    val gz = new java.util.zip.GZIPOutputStream(
      Files.newOutputStream(dir.resolve("shard.jsonl.gz")))
    gz.write("""{"doc_id":3,"text":"delta","lang":"fr","source":"s2","n_chars":5}"""
      .getBytes(UTF_8))
    gz.close()

    val docs = JsonlCorpus.documents(spark, dir.toString)
    docs.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1))) shouldBe
      Array((1L, "alpha beta"), (2L, "gamma"), (3L, "delta"))
    JsonlCorpus.corruptLines(spark, dir.toString)
      .collect().map(_.getString(0)) shouldBe Array("not json at all")
  }

  test("the operator pack runs unchanged on a JSONL-sourced frame") {
    val dir = Files.createTempDirectory("graft-jsonl-ops").toString
    Tables.documents(spark, sf).write.mode("overwrite").json(dir)
    val jsonlDocs = JsonlCorpus.documents(spark, dir)
    // same fps (the gateway into the whole dedup stack) either way
    val viaJsonl = graft.operators.Dedup.fpsOf(jsonlDocs)
      .orderBy("doc_id").collect().map(_.toString)
    val viaParquet = graft.operators.Dedup.fpsOf(Tables.documents(spark, sf))
      .orderBy("doc_id").collect().map(_.toString)
    viaJsonl shouldBe viaParquet
  }
}
