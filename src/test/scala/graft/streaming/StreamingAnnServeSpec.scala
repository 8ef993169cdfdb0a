package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** The continuous-serving face's contract: answers served from the
  * frozen index for a query set SPLIT across micro-batches are
  * row-identical to the batch planner face run on the same queries —
  * per-query planner budgets are independent arithmetic, so batch
  * boundaries cannot change any answer.
  */
class StreamingAnnServeSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("continuous serving equals the batch face: a query set split " +
      "across two micro-batches emits row-identical answers to " +
      "sim_ann_ivfpq_adaptive, planner budgets included") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val src = Files.createTempDirectory("graft-annserve-src")
    val ckpt = Files.createTempDirectory("graft-annserve-ckpt")
    val q = graft.Tables.embeddings(spark, sf)
      .filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"),
        graft.functions.VectorFunctions.toDoubleArray($"embedding")
          .as("qemb"))
      .localCheckpoint(true)
    // feed query batches as PARQUET files (exact doubles — a JSON
    // round-trip could perturb the ADC arithmetic's inputs)
    def feed(cond: org.apache.spark.sql.Column, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft-annserve-feed")
      q.filter(cond).coalesce(1).write.mode("overwrite")
        .parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .find(f => f.getName.endsWith(".parquet")).get
      Files.move(part.toPath, src.resolve(name))
    }
    val acc = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Long, Long, Long)]
    def drain(df: org.apache.spark.sql.DataFrame): Unit =
      acc ++= df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3),
        java.lang.Double.doubleToRawLongBits(r.getDouble(4)),
        r.getLong(5), r.getLong(6)))
    feed($"query_id" < 3, "b0.parquet")
    val stream = StreamingAnnServe.serveStream(
      spark.readStream.schema("query_id LONG, qemb ARRAY<DOUBLE>")
        .parquet(src.toString),
      sf, col("label") % 7 === 3, ckpt.toString, drain)
    try {
      stream.processAllAvailable()
      feed($"query_id" >= 3, "b1.parquet")
      stream.processAllAvailable()
    } finally stream.stop()
    // the split genuinely exercised two data batches
    acc.map(_._7).distinct.size shouldBe 2
    val got = acc.map(t => (t._1, t._2, t._3, t._4, t._5, t._6)).toSet
    val expect = graft.SparkEntry
      .queries("sim_ann_ivfpq_adaptive")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3),
        java.lang.Double.doubleToRawLongBits(r.getDouble(4)),
        r.getLong(5))).toSet
    expect.isEmpty shouldBe false
    withClue(s"served ${got.size} vs batch ${expect.size}: ") {
      got shouldBe expect
    }
  }
}
