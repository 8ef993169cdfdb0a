package graft.operators

import java.nio.file.{Files, Path}

import org.apache.hadoop.conf.Configuration
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The Hadoop-FS generation swap honors the identical contract as the
  * java.io [[graft.ingest.GenSwap]] it twins (GenSwapSpec): at every
  * intermediate state some complete generation stays readable, and a
  * staged generation survives until the next publish completes —
  * exercised here through the Hadoop local filesystem, the same code
  * path a cluster's `hdfs://`/`s3a://` state dir takes.
  */
class FsSwapSpec extends AnyFunSuite with Matchers {

  private val conf = new Configuration()

  private def mkGen(root: Path, name: String, marker: String): String = {
    val dir = root.resolve(name)
    Files.createDirectories(dir)
    Files.writeString(dir.resolve(s"$marker.parquet"), marker)
    dir.toString
  }

  test("readable prefers the target generation, falls back to staged old") {
    val root = Files.createTempDirectory("fsswap")
    val t = root.resolve("t.parquet").toString
    val o = root.resolve("o.parquet").toString
    FsSwap.readable(conf, t, o) shouldBe None
    mkGen(root, "o.parquet", "gen1")
    FsSwap.readable(conf, t, o) shouldBe Some(o) // crash-recovery state
    mkGen(root, "t.parquet", "gen2")
    FsSwap.readable(conf, t, o) shouldBe Some(t)
  }

  test("publish replaces the target and clears the staged generation") {
    val root = Files.createTempDirectory("fsswap")
    val t = root.resolve("t.parquet").toString
    val o = root.resolve("o.parquet").toString
    mkGen(root, "t.parquet", "gen1")
    val tmp = mkGen(root, "tmp.parquet", "gen2")
    FsSwap.publish(conf, tmp, t, o)
    FsSwap.readable(conf, t, o) shouldBe Some(t)
    Files.exists(java.nio.file.Paths.get(t, "gen2.parquet")) shouldBe true
    Files.exists(java.nio.file.Paths.get(o)) shouldBe false // cleared
  }

  test("publish in recovery mode (target absent) keeps the staged " +
      "generation until the new target is in place") {
    val root = Files.createTempDirectory("fsswap")
    val t = root.resolve("t.parquet").toString
    val o = root.resolve("o.parquet").toString
    mkGen(root, "o.parquet", "gen1") // crash left only the staged gen
    val tmp = mkGen(root, "tmp.parquet", "gen2")
    FsSwap.publish(conf, tmp, t, o)
    FsSwap.readable(conf, t, o) shouldBe Some(t)
    Files.exists(java.nio.file.Paths.get(t, "gen2.parquet")) shouldBe true
  }

  test("failed publish throws instead of silently dropping a generation") {
    val root = Files.createTempDirectory("fsswap")
    val t = root.resolve("t.parquet").toString
    val o = root.resolve("o.parquet").toString
    intercept[java.io.IOException] {
      FsSwap.publish(conf,
        root.resolve("missing.parquet").toString, t, o)
    }
  }

  test("subdirectory generations (the drainStream scalars+pending " +
      "layout) are readable and swap atomically as one unit") {
    val root = Files.createTempDirectory("fsswap")
    val t = root.resolve("t").toString
    val o = root.resolve("o").toString
    // a generation whose parquet pieces are SUBDIRS named *.parquet
    val tmp = root.resolve("tmp")
    Files.createDirectories(tmp.resolve("scalars.parquet"))
    Files.createDirectories(tmp.resolve("pending.parquet"))
    Files.writeString(
      tmp.resolve("scalars.parquet").resolve("part-0.parquet"), "s")
    FsSwap.readable(conf, t, o) shouldBe None
    FsSwap.publish(conf, tmp.toString, t, o)
    FsSwap.readable(conf, t, o) shouldBe Some(t)
    Files.exists(java.nio.file.Paths.get(t, "pending.parquet")) shouldBe true
  }
}
