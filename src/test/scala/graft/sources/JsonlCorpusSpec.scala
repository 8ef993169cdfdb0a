package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{Tables, TestSpark}

/** Proves the JSONL source is a drop-in for the parquet documents
  * table: a parquet→jsonl→read round trip is row-identical, membership
  * is projection-independent, malformed input lands in the quarantine
  * frame with the right reason instead of failing or vanishing, gzip
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
    JsonlCorpus.quarantine(spark, dir).count() shouldBe 0L
  }

  test("malformed input quarantines by reason; membership is projection-independent") {
    val dir = Files.createTempDirectory("graft-jsonl-bad")
    Files.write(dir.resolve("good.jsonl"),
      ("""{"doc_id":1,"text":"alpha beta","lang":"en","source":"s0","n_chars":10}""" + "\n" +
       """not json at all""" + "\n" +
       """{"text":"orphan without id","lang":"en","source":"s0","n_chars":17}""" + "\n" +
       """{"doc_id":5,"text":"bad count","lang":"en","source":"s0","n_chars":"oops"}""" + "\n" +
       """{"doc_id":2,"text":"gamma","lang":"de","source":"s1","n_chars":5}""")
        .getBytes(UTF_8))
    // a gzip shard: must read transparently via the Hadoop codec
    val gz = new java.util.zip.GZIPOutputStream(
      Files.newOutputStream(dir.resolve("shard.jsonl.gz")))
    gz.write("""{"doc_id":3,"text":"delta","lang":"fr","source":"s2","n_chars":5}"""
      .getBytes(UTF_8))
    gz.close()

    val docs = JsonlCorpus.documents(spark, dir.toString)
    // doc 5's bad n_chars reads as null but the row IS a member — and
    // membership agrees between a pruned projection, a full read, and
    // a count (the parquet drop-in contract)
    docs.count() shouldBe 4L
    docs.select("doc_id").collect().map(_.getLong(0)).sorted shouldBe
      Array(1L, 2L, 3L, 5L)
    docs.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1))) shouldBe
      Array((1L, "alpha beta"), (2L, "gamma"), (3L, "delta"), (5L, "bad count"))
    docs.filter("doc_id = 5").collect().head.isNullAt(4) shouldBe true

    // every non-clean input surfaces, each with its reason
    JsonlCorpus.quarantine(spark, dir.toString)
      .collect().map(r => (r.getString(1), r.getString(0))).sortBy(_._1) shouldBe
      Array(
        ("no_doc_id",
          """{"text":"orphan without id","lang":"en","source":"s0","n_chars":17}"""),
        ("partial",
          """{"doc_id":5,"text":"bad count","lang":"en","source":"s0","n_chars":"oops"}"""),
        ("unparseable", "not json at all"))
  }

  test("documentsStream feeds continuous dedup, one shard per micro-batch") {
    import java.nio.charset.StandardCharsets.UTF_8
    val dir = Files.createTempDirectory("graft-jsonl-stream")
    val ckpt = Files.createTempDirectory("graft-jsonl-stream-ckpt")
    val table = "jsonl_dedup_state"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    def shard(name: String, mtimeMs: Long, docs: (Long, String)*): Unit = {
      val p = dir.resolve(name)
      Files.write(p,
        docs.map { case (id, t) =>
          s"""{"doc_id":$id,"text":"$t","lang":"en","source":"s0","n_chars":${t.length}}"""
        }.mkString("\n").getBytes(UTF_8))
      // the file source orders batches by mtime; same-millisecond
      // shards tie-break unspecified, so pin distinct mtimes
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
    }
    // shard 2 repeats shard 1's body: with one shard per micro-batch
    // the duplicate is blocked by STATE, not in-batch — proving both
    // the pacing option and the cross-batch state path
    val t0 = System.currentTimeMillis() - 60000L
    shard("s1.jsonl", t0, (1L, "aaa"), (2L, "bbb"))
    shard("s2.jsonl", t0 + 5000L, (3L, "aaa"), (4L, "ccc"))
    @volatile var batches = Vector.empty[Vector[Long]]
    val q = graft.streaming.StreamingDedup.exactDedupStream(
      JsonlCorpus.documentsStream(spark, dir.toString,
        Map("maxFilesPerTrigger" -> "1")),
      table, buckets = 4, ckpt.toString,
      sink = ds => {
        val ids = ds.collect().map(_.getLong(0)).sorted.toVector
        if (ids.nonEmpty) batches :+= ids
      })
    try {
      q.processAllAvailable()
      // two non-empty micro-batches (one per shard), duplicate dropped
      batches shouldBe Vector(Vector(1L, 2L), Vector(4L))
    } finally {
      q.stop()
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
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

  test("shards written by graft's own Gzip encoder read back through " +
      "the stock ingest path, row-identical to parquet") {
    // the third cross-validation direction for operators.Gzip: our
    // spec-determined stored-block members must satisfy Hadoop's gzip
    // codec (JsonlCorpus reads .jsonl.gz through Spark natively), so
    // a corpus staged by this library is consumable by ANY stock
    // Spark reader — not just our own decoder
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-jsonl-owngz")
    val docs = Tables.documents(spark, sf).orderBy("doc_id").collect()
    val lines = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.to_json(
        org.apache.spark.sql.functions.struct(
          $"doc_id", $"text", $"lang", $"source", $"n_chars")))
      .as[String].collect()
    // two shards, split mid-corpus: multi-file reads must union
    val (s1, s2) = lines.splitAt(lines.length / 2)
    Seq(("a.jsonl.gz", s1), ("b.jsonl.gz", s2)).foreach { case (n, ls) =>
      Files.write(dir.resolve(n),
        graft.operators.Gzip.encode(ls.mkString("\n").getBytes(UTF_8)))
    }
    val back = JsonlCorpus.documents(spark, dir.toString)
      .orderBy("doc_id").collect()
    back.map(_.toString) shouldBe docs.map(_.toString)
    JsonlCorpus.quarantine(spark, dir.toString).count() shouldBe 0L
  }
}
