package graft.ingest

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Contract of the crash-safe spool generation swap: at every
  * intermediate state some complete generation stays readable, and a
  * staged generation survives until the next publish completes.
  */
class GenSwapSpec extends AnyFunSuite with Matchers {

  private def mkGen(root: Path, name: String, marker: String): String = {
    val dir = root.resolve(name)
    Files.createDirectories(dir)
    Files.writeString(dir.resolve(s"$marker.parquet"), marker)
    dir.toString
  }

  test("readable prefers the target generation, falls back to staged old") {
    val root = Files.createTempDirectory("genswap")
    val t = root.resolve("t.parquet").toString
    val o = root.resolve("o.parquet").toString
    GenSwap.readable(t, o) shouldBe None
    mkGen(root, "o.parquet", "gen1")
    GenSwap.readable(t, o) shouldBe Some(o) // crash-recovery state
    mkGen(root, "t.parquet", "gen2")
    GenSwap.readable(t, o) shouldBe Some(t)
  }

  test("publish replaces the target and clears the staged generation") {
    val root = Files.createTempDirectory("genswap")
    val t = root.resolve("t.parquet").toString
    val o = root.resolve("o.parquet").toString
    mkGen(root, "t.parquet", "gen1")
    val tmp = mkGen(root, "tmp.parquet", "gen2")
    GenSwap.publish(tmp, t, o)
    GenSwap.readable(t, o) shouldBe Some(t)
    Files.exists(java.nio.file.Paths.get(t, "gen2.parquet")) shouldBe true
    Files.exists(java.nio.file.Paths.get(o)) shouldBe false // cleared
  }

  test("publish in recovery mode (target absent) keeps the staged generation " +
      "until the new target is in place") {
    val root = Files.createTempDirectory("genswap")
    val t = root.resolve("t.parquet").toString
    val o = root.resolve("o.parquet").toString
    mkGen(root, "o.parquet", "gen1") // crash left only the staged gen
    val tmp = mkGen(root, "tmp.parquet", "gen2")
    // the pre-publish state must still be readable right up to the
    // rename: publish must NOT delete `o` before `t` exists (the
    // second-crash data-loss window). After publish, t wins.
    GenSwap.publish(tmp, t, o)
    GenSwap.readable(t, o) shouldBe Some(t)
    Files.exists(java.nio.file.Paths.get(t, "gen2.parquet")) shouldBe true
  }

  test("failed publish throws instead of silently dropping a generation") {
    val root = Files.createTempDirectory("genswap")
    val t = root.resolve("t.parquet").toString
    val o = root.resolve("o.parquet").toString
    // tmp does not exist -> rename must fail loudly
    intercept[java.io.IOException] {
      GenSwap.publish(root.resolve("missing.parquet").toString, t, o)
    }
  }
}
