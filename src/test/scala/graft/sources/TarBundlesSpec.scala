package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.operators.Tar

/** The tar-shard source: members from our own shards and from
  * system-tar shards read back byte-exact, shard pruning happens at
  * listing time, and a corrupt shard fails loudly.
  */
class TarBundlesSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("members of multi-shard directories read back byte-exact, " +
      "including system-tar shards; non-tar files are pruned") {
    val dir = Files.createTempDirectory("graft-tarsrc")
    val rnd = new scala.util.Random(21)
    val samples = (0 until 6).map { i =>
      (s"$i.txt", 1700000000L + i,
        Array.fill(100 + rnd.nextInt(900))(rnd.nextInt(256).toByte))
    }
    val (s1, s2) = samples.splitAt(3)
    Files.write(dir.resolve("shard-0.tar"),
      Tar.encode(s1.map(t => Tar.Entry(t._1, t._2, t._3))))
    Files.write(dir.resolve("shard-1.tar"),
      Tar.encode(s2.map(t => Tar.Entry(t._1, t._2, t._3))))
    // a non-tar file in the directory must be pruned by the glob
    Files.write(dir.resolve("notes.json"), "{}".getBytes("US-ASCII"))

    val got = TarBundles.members(spark, dir.toString)
      .collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3),
        r.getAs[Array[Byte]](4).toSeq))
      .sortBy(_._1)
    got.map(_._1) shouldBe samples.map(_._1).sorted
    samples.foreach { case (n, mt, data) =>
      val m = got.find(_._1 == n).get
      m._2 shouldBe mt
      m._3 shouldBe data.length.toLong
      m._4 shouldBe data.toSeq
    }

    // a shard written by the SYSTEM tar reads through the same source
    val tarBin = new java.io.File("/usr/bin/tar")
    if (tarBin.canExecute) {
      val payload = "system shard sample".getBytes("US-ASCII")
      Files.write(dir.resolve("sys.txt"), payload)
      new ProcessBuilder("/usr/bin/tar", "--format=ustar", "-cf",
          dir.resolve("shard-2.tar").toString, "-C", dir.toString,
          "sys.txt")
        .start().waitFor() shouldBe 0
      val all = TarBundles.members(spark, dir.toString).collect()
      all.count(_.getString(1) == "sys.txt") shouldBe 1
      all.find(_.getString(1) == "sys.txt").get
        .getAs[Array[Byte]](4).toSeq shouldBe payload.toSeq
    }
  }

  test("a corrupt shard fails the read loudly, never silently shifts") {
    val dir = Files.createTempDirectory("graft-tarsrc-bad")
    val good = Tar.encode(Seq(
      Tar.Entry("a.txt", 1L, ("x" * 700).getBytes("US-ASCII"))))
    val bad = good.clone()
    bad(130) = (bad(130) ^ 1).toByte // size-field byte: checksum breaks
    Files.write(dir.resolve("shard.tar"), bad)
    val ex = intercept[org.apache.spark.SparkException] {
      TarBundles.members(spark, dir.toString).collect()
    }
    ex.getMessage should include("checksum")
  }

  test("the persisted multimodal-shard artifact's member bytes round-trip " +
      "bit-exactly against the generators, one image+audio bundle per " +
      "document") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val dir = graft.operators.Multimodal.shardedTarDir(spark, sf)
    val members = TarBundles.members(spark, dir)
      .select($"name", $"mtime", $"data").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getAs[Array[Byte]](2)))
    // one png + gif + bmp + wav member per non-empty-ascii document
    val docs = graft.Tables.documents(spark, sf)
      .withColumn("atext", regexp_replace($"text", "[^\\x20-\\x7e]", ""))
      .filter(org.apache.spark.sql.functions.length($"atext") > 0)
      .select($"doc_id", $"atext").as[(Long, String)].collect().toMap
    members.size shouldBe docs.size * 4
    members.foreach { case (name, mtime, data) =>
      val dot = name.lastIndexOf('.')
      val id = name.substring(0, dot).toLong
      mtime shouldBe id
      val expected = name.substring(dot + 1) match {
        case "png" => graft.operators.Png.fromText(id, docs(id))
        case "gif" => graft.operators.Gif.fromText(id, docs(id))
        case "bmp" => graft.operators.Bmp.fromText(id, docs(id))
        case "wav" => graft.operators.Wav.fromText(id, docs(id))
      }
      withClue(s"$name: ") { data.toSeq shouldBe expected.toSeq }
    }
    // the artifact is REUSED, not rebuilt: a second call returns the
    // same directory without touching its files
    val before = new java.io.File(dir).listFiles().map(_.lastModified).toSeq
    graft.operators.Multimodal.shardedTarDir(spark, sf) shouldBe dir
    new java.io.File(dir).listFiles().map(_.lastModified).toSeq shouldBe before
  }

  test("shards are SIZE-targeted (WebDataset discipline): every shard's " +
      "bytes ≤ target + one bundle + terminator, and shard count grows " +
      "with the corpus at a fixed target") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val target = 48L * 1024 // small enough that sf0.001 spans shards
    spark.conf.set("spark.graft.tarShardTargetBytes", target.toString)
    try {
      val dir = graft.operators.Multimodal
        .shardedTarDir(spark, "/root/testdata/sf0.001")
      def tars(p: String) = new java.io.File(p).listFiles()
        .filter(_.getName.endsWith(".tar")).toSeq
      val shards = tars(dir)
      shards.size should be > 1
      // the bound's slack term: the LARGEST single bundle (4 members)
      // in tar-block bytes, priced from the stored members themselves
      val maxBundle = TarBundles.members(spark, dir)
        .select($"name", $"data").as[(String, Array[Byte])].collect()
        .groupBy(_._1.takeWhile(_ != '.'))
        .values.map(_.map(m =>
          graft.operators.Tar.memberLength(m._2.length)).sum).max
      shards.foreach { f =>
        withClue(s"${f.getName} (${f.length} bytes): ") {
          f.length should be <= (target + maxBundle + 1024L)
        }
      }
      // every shard still decodes (terminator + checksums intact) and
      // the union of members is complete: 4 per non-empty-ascii doc
      val total = TarBundles.members(spark, dir).count()
      val nDocs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
        .withColumn("atext", regexp_replace($"text", "[^\\x20-\\x7e]", ""))
        .filter(org.apache.spark.sql.functions.length($"atext") > 0).count()
      total shouldBe nDocs * 4
      // 10x the corpus (sf0.1: 5000 docs vs 500) at the SAME target =>
      // more shards, not bigger ones — the count-fixed mod-N routing
      // this replaced would keep the count and grow every shard 10x
      val dir10 = graft.operators.Multimodal
        .shardedTarDir(spark, "/root/testdata/sf0.1")
      tars(dir10).size should be > (2 * shards.size)
      tars(dir10).foreach(
        _.length should be <= (target + 4L * 128 * 1024 + 1024L))
    } finally spark.conf.unset("spark.graft.tarShardTargetBytes")
  }
}
