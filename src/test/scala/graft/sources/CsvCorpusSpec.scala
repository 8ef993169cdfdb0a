package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{Tables, TestSpark}

/** Proves the CSV source is a drop-in for the parquet documents table:
  * a parquet→csv→read round trip is row-identical (RFC 4180 quoting
  * included), malformed input quarantines by reason, TSV reads via the
  * delimiter knob, gzip shards are transparent, and the dedup gateway
  * produces identical fingerprints either way.
  */
class CsvCorpusSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("parquet -> csv -> read round trip is row-identical") {
    val dir = Files.createTempDirectory("graft-csv").toString
    val docs = Tables.documents(spark, sf)
    docs.write.mode("overwrite")
      .option("header", "true").option("quote", "\"").option("escape", "\"")
      .csv(dir)
    val back = CsvCorpus.documents(spark, dir)
    back.schema.fieldNames.sorted shouldBe docs.schema.fieldNames.sorted
    back.orderBy("doc_id").collect().map(_.toString) shouldBe
      docs.orderBy("doc_id").collect().map(_.toString)
    CsvCorpus.quarantine(spark, dir).count() shouldBe 0L
  }

  test("RFC 4180 quoting round-trips commas, quotes, and delimiters in text") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-csv-quote").toString
    val tricky = Seq(
      (1L, """plain words""", "en", "s0", 11L),
      (2L, """comma, inside""", "en", "s0", 13L),
      (3L, """she said "hi" loudly""", "en", "s0", 20L),
      (4L, """both, "quoted" and, commas""", "de", "s1", 26L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    tricky.write.mode("overwrite")
      .option("header", "true").option("quote", "\"").option("escape", "\"")
      .csv(dir)
    val back = CsvCorpus.documents(spark, dir)
    back.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1))) shouldBe
      tricky.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
  }

  test("malformed input quarantines by reason; gzip shards read transparently") {
    val dir = Files.createTempDirectory("graft-csv-bad")
    Files.write(dir.resolve("good.csv"),
      ("doc_id,text,lang,source,n_chars\n" +
       "1,alpha beta,en,s0,10\n" +
       ",orphan without id,en,s0,17\n" +
       "5,bad count,en,s0,oops\n" +
       "2,gamma,de,s1,5").getBytes(UTF_8))
    val gz = new java.util.zip.GZIPOutputStream(
      Files.newOutputStream(dir.resolve("shard.csv.gz")))
    gz.write("doc_id,text,lang,source,n_chars\n3,delta,fr,s2,5".getBytes(UTF_8))
    gz.close()

    val docs = CsvCorpus.documents(spark, dir.toString)
    // doc 5's bad n_chars reads as null but the row IS a member;
    // membership agrees between pruned, full, and counted reads
    docs.count() shouldBe 4L
    docs.select("doc_id").collect().map(_.getLong(0)).sorted shouldBe
      Array(1L, 2L, 3L, 5L)
    docs.filter("doc_id = 5").collect().head.isNullAt(4) shouldBe true

    val quarantined = CsvCorpus.quarantine(spark, dir.toString)
      .collect().map(r => (r.getString(1), r.getString(0))).sortBy(_._1)
    quarantined.map(_._1) shouldBe Array("no_doc_id", "partial")
    quarantined(1)._2 should include("bad count")
  }

  test("TSV reads via the delimiter knob") {
    val dir = Files.createTempDirectory("graft-tsv")
    Files.write(dir.resolve("part.tsv"),
      ("doc_id\ttext\tlang\tsource\tn_chars\n" +
       "7\tcomma, safe in tsv\ten\ts0\t18\n" +
       "8\tzeta\tde\ts1\t4").getBytes(UTF_8))
    val docs = CsvCorpus.documents(spark, dir.toString, delimiter = "\t")
    docs.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1))) shouldBe
      Array((7L, "comma, safe in tsv"), (8L, "zeta"))
  }

  test("the operator pack runs unchanged on a CSV-sourced frame") {
    val dir = Files.createTempDirectory("graft-csv-ops").toString
    Tables.documents(spark, sf).write.mode("overwrite")
      .option("header", "true").option("quote", "\"").option("escape", "\"")
      .csv(dir)
    val viaCsv = graft.operators.Dedup.fpsOf(CsvCorpus.documents(spark, dir))
      .orderBy("doc_id").collect().map(_.toString)
    val viaParquet = graft.operators.Dedup.fpsOf(Tables.documents(spark, sf))
      .orderBy("doc_id").collect().map(_.toString)
    viaCsv shouldBe viaParquet
  }
}
