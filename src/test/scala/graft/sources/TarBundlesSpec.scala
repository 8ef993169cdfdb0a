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
}
