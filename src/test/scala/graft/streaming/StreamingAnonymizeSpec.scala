package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** The continuous-anonymization face's contract: arriving rows
  * generalized through the frozen scheme, split across micro-batches,
  * are row-identical to the batch face (`q_kanon_apply`) run on the
  * same rows — each row's split-tree walk is independent, so batch
  * boundaries cannot change any generalization.
  */
class StreamingAnonymizeSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("continuous anonymization equals the batch face: the customer " +
      "arriving split fed across two micro-batches emits row-identical " +
      "generalizations to q_kanon_apply, drift flags included") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val src = Files.createTempDirectory("graft-anon-src")
    val ckpt = Files.createTempDirectory("graft-anon-ckpt")
    val cust = graft.Tables.customer(spark, sf).select(
      $"c_custkey".cast("long").as("id"),
      expr("cast(cast(c_acctbal as decimal(12,2)) * 100 as bigint)")
        .as("d0"),
      $"c_nationkey".cast("long").as("d1"))
      .localCheckpoint(true)
    val base = cust.filter($"id" % 8 =!= 0)
    val arriving = cust.filter($"id" % 8 === 0).collect()
    arriving.length should be > 3
    def feed(rows: Seq[org.apache.spark.sql.Row], name: String): Unit =
      Files.write(src.resolve(name),
        rows.map(r => s"""{"id":${r.getLong(0)},"d0":${r.getLong(1)},"d1":${r.getLong(2)}}""")
          .mkString("\n").getBytes(UTF_8))
    val acc = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Long, Long, Long, Boolean, Long)]
    def drain(df: org.apache.spark.sql.DataFrame): Unit =
      acc ++= df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getBoolean(7), r.getLong(8)))
    val half = arriving.length / 2
    feed(arriving.take(half).toSeq, "b0.json")
    val stream = StreamingAnonymize.applyStream(
      spark.readStream.schema("id LONG, d0 LONG, d1 LONG")
        .json(src.toString),
      base, k = 5L, depth = 8, ckpt.toString, drain)
    try {
      stream.processAllAvailable()
      feed(arriving.drop(half).toSeq, "b1.json")
      stream.processAllAvailable()
    } finally stream.stop()
    // the split genuinely exercised two data batches
    acc.map(_._9).distinct.size shouldBe 2
    val got = acc.map(t => (t._1, t._2, t._3, t._4, t._5, t._6, t._7, t._8))
      .toSet
    val expect = graft.SparkEntry.queries("q_kanon_apply")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7)))
      .toSet
    expect.isEmpty shouldBe false
    withClue(s"served ${got.size} vs batch ${expect.size}: ") {
      got shouldBe expect
    }
  }
}
