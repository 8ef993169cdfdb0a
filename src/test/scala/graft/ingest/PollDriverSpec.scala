package graft.ingest

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, StandardOpenOption}

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** The backoff-wrapped poll task loop (SURVEY.md §3.2 / §2 #17, #19). */
class PollDriverSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def write(p: java.nio.file.Path, s: String): Unit = {
    Files.createDirectories(p.getParent)
    Files.write(p, s.getBytes(UTF_8), StandardOpenOption.CREATE,
      StandardOpenOption.TRUNCATE_EXISTING, StandardOpenOption.WRITE)
  }

  test("poll loop: records flow to the sink; backoff escalates on failure and resets") {
    val root = Files.createTempDirectory("graft-driver")
    val stateDir = Files.createTempDirectory("graft-driver-state").toString
    val cfg = MonitorConfig(Map(
      MonitorConfig.MonitorUpdate -> s"$root/in/:t",
      MonitorConfig.Refresh -> "PT1S",
      MonitorConfig.SourceRecordConverter -> "graft.ingest.Records$LineSplitRecordConverter"))

    var batches = Vector.empty[Seq[String]]
    var now = 0L
    val driver = new PollDriver(spark, cfg, stateDir,
      sink = ds => batches :+= ds.collect().toSeq.map(r => new String(r.value, UTF_8)),
      clock = () => now)

    write(root.resolve("in/f.csv"), "a\nb")
    driver.pollOnce() shouldBe 2L // line-split converter: 2 records
    batches.last.sorted shouldBe Seq("a", "b")

    now += 10000
    driver.pollOnce() shouldBe 0L // quiescent: no changes, sink gets empty batch
    // backoff step = the configured refresh rate (reference semantics)
    driver.currentBackoffMs shouldBe 1000L

    // failure: make the state dir unwritable by breaking the path
    val badDriver = new PollDriver(spark, cfg, "/proc/nonexistent/state",
      sink = _ => (), clock = () => now)
    badDriver.pollOnce() shouldBe -1L
    badDriver.currentBackoffMs shouldBe 2000L // escalated
    badDriver.pollOnce() shouldBe 0L // still inside the backoff window
    now += 10000
    badDriver.pollOnce() shouldBe -1L
    badDriver.currentBackoffMs shouldBe 4000L // doubled again
  }
}
