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

  test("Tar.entries stream-decodes member-by-member equal to the " +
      "whole-array decode, and fails loudly on truncation, checksum " +
      "damage, and a lone zero block") {
    val rnd = new scala.util.Random(57)
    val es = (0 until 5).map(i => Tar.Entry(s"m$i.bin", 100L + i,
      Array.fill(1 + rnd.nextInt(1500))(rnd.nextInt(256).toByte)))
    val bytes = Tar.encode(es)
    def stream(b: Array[Byte]) = new java.io.ByteArrayInputStream(b)
    val got = Tar.entries(stream(bytes)).toSeq
    got.map(_.name) shouldBe es.map(_.name)
    got.map(_.mtime) shouldBe es.map(_.mtime)
    got.zip(es).foreach { case (g, e) => g.data.toSeq shouldBe e.data.toSeq }
    // equal to the array decode
    val arr = Tar.decode(bytes)
    got.map(g => (g.name, g.mtime, g.data.toSeq)) shouldBe
      arr.map(a => (a.name, a.mtime, a.data.toSeq))
    // truncation mid-member: EOF, never a silent short member
    intercept[java.io.EOFException] {
      Tar.entries(stream(bytes.take(bytes.length - 1200))).toSeq
    }
    // a flipped payload-adjacent header byte: checksum mismatch
    val dmg = bytes.clone(); dmg(136) = '9'
    intercept[IllegalArgumentException] {
      Tar.entries(stream(dmg)).toSeq
    }
    // a lone zero block followed by a NON-zero block is not a
    // terminator — this must reach the twin-block require (a stream
    // that merely ENDS after one zero block fails as EOF instead,
    // which the truncation case above already covers)
    val lone = bytes.dropRight(1024) ++ new Array[Byte](512) ++
      Array.fill(512)(1.toByte)
    val ex = intercept[IllegalArgumentException] {
      Tar.entries(stream(lone)).toSeq
    }
    ex.getMessage should include("single zero block")
  }

  test("incremental shard drain: an append-only second run writes ONLY " +
      "the new shards, every previously-closed shard file stays " +
      "byte-identical, a no-new-data run writes nothing, and the " +
      "flushed corpus reads back member-exact") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-sharddrain")
      .toFile.getAbsolutePath
    val stateDir = s"$base/state"
    val outDir = s"$base/shards"
    val target = 16384L
    def payload(id: Long, kind: String): Array[Byte] = {
      val n = ((id * 7 + kind.length * 13) % 200 + 40).toInt
      Array.tabulate(n)(j => ((id + j * 31 + kind(0)) % 251).toByte)
    }
    // deterministic per doc_id, so members(60) is an APPEND-ONLY
    // superset of members(30) — the drain's prefix property applies
    def members(n: Int) =
      (0 until n).map { i =>
        val id = i.toLong
        val b = payload(id, "bmp"); val g = payload(id, "gif")
        val p = payload(id, "png"); val w = payload(id, "wav")
        val sz = Seq(b, g, p, w).map(x => Tar.memberLength(x.length)).sum
        (id, b, g, p, w, sz)
      }.toDF("doc_id", "bmp", "gif", "png", "wav", "size_b")
    def snapshot(): Map[String, Seq[Byte]] = {
      val d = new java.io.File(outDir)
      if (!d.exists()) Map.empty
      else d.listFiles().filter(_.getName.endsWith(".tar"))
        .map(f => f.getName ->
          java.nio.file.Files.readAllBytes(f.toPath).toSeq).toMap
    }
    // run 1: 30 docs — only CLOSED bins written, the open one waits
    val c1 = graft.operators.Multimodal.shardDrain(spark, members(30),
      target, stateDir, outDir, flushOpen = false)
      .collect().map(r => (r.getLong(0), r.getBoolean(3)))
    c1 should not be empty
    c1.foreach(_._2 shouldBe true) // every drained bin is closed
    val snap1 = snapshot()
    snap1.keySet shouldBe
      c1.map(b => f"shard-${b._1}%05d.tar").toSet
    // run 2: append-only growth to 60 docs — only NEW bins write;
    // every file from run 1 must be byte-identical afterwards
    val c2 = graft.operators.Multimodal.shardDrain(spark, members(60),
      target, stateDir, outDir, flushOpen = false)
      .collect().map(r => (r.getLong(0), r.getBoolean(3)))
    c2 should not be empty
    val maxClosed1 = c1.map(_._1).max
    c2.foreach(_._1 should be > maxClosed1)
    val snap2 = snapshot()
    snap1.foreach { case (name, bytes) =>
      withClue(s"$name rewritten: ") { snap2(name) shouldBe bytes }
    }
    snap2.keySet shouldBe snap1.keySet ++
      c2.map(b => f"shard-${b._1}%05d.tar")
    // run 3: no new data — nothing to drain, nothing written
    val c3 = graft.operators.Multimodal.shardDrain(spark, members(60),
      target, stateDir, outDir, flushOpen = false).collect()
    c3 shouldBe empty
    snapshot() shouldBe snap2
    // run 4: flush the open shard — exactly one non-closed bin writes,
    // closed files still untouched, and the whole corpus reads back
    // member-exact through the tar source
    val c4 = graft.operators.Multimodal.shardDrain(spark, members(60),
      target, stateDir, outDir, flushOpen = true)
      .collect().map(r => (r.getLong(0), r.getBoolean(3)))
    c4.length shouldBe 1
    c4.head._2 shouldBe false
    snap2.foreach { case (name, bytes) =>
      withClue(s"$name rewritten by flush: ") {
        snapshot()(name) shouldBe bytes
      }
    }
    val got = TarBundles.members(spark, outDir)
      .select($"name", $"mtime", $"data").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getAs[Array[Byte]](2).toSeq))
    got.length shouldBe 60 * 4
    got.foreach { case (name, mtime, data) =>
      val id = name.substring(0, 12).toLong
      val kind = name.substring(13)
      mtime shouldBe id
      withClue(s"$name bytes: ") {
        data shouldBe payload(id, kind).toSeq
      }
    }
  }
}
