package graft.ingest

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Config parsing/validation semantics (SURVEY.md §2 #18). */
class MonitorConfigSpec extends AnyFunSuite with Matchers {

  private val base = Map(
    MonitorConfig.MonitorTail -> "/tails/:tails",
    MonitorConfig.MonitorUpdate -> "/updates/:updates,/more/:extra",
    MonitorConfig.Refresh -> "PT0S",
    MonitorConfig.FileMaxAge -> "P7D",
    MonitorConfig.KeyStyleKey -> "struct")

  test("parses the reference's example shape") {
    val cfg = MonitorConfig(base)
    cfg.tailDirs shouldBe Seq(MonitoredPath("/tails/", tail = true, "tails"))
    cfg.updateDirs.map(_.topic) shouldBe Seq("updates", "extra")
    cfg.updateDirs.forall(!_.tail) shouldBe true
    cfg.refresh.toMillis shouldBe 0L
    cfg.maxAge.map(_.toDays) shouldBe Some(7L)
    cfg.maxBackoff.toMinutes shouldBe 30L // default PT30M
    cfg.maxFilesPerPoll shouldBe 10000 // default
    cfg.keyStyle shouldBe Records.KeyStyle.StructKey
    cfg.converter shouldBe a[Records.NopRecordConverter]
  }

  test("monitor specs accept scheme-qualified paths (split on the LAST colon)") {
    val ms = MonitorConfig.parseMonitors(
      "s3a://bucket/in/:landing,hdfs://nn:8020/dir/:t2,/plain/:t3", tail = false)
    ms shouldBe Seq(
      MonitoredPath("s3a://bucket/in/", tail = false, "landing"),
      MonitoredPath("hdfs://nn:8020/dir/", tail = false, "t2"),
      MonitoredPath("/plain/", tail = false, "t3"))
    an[IllegalArgumentException] should be thrownBy
      MonitorConfig.parseMonitors("no-topic-here", tail = false)
  }

  test("fail-fast validation") {
    an[IllegalArgumentException] should be thrownBy MonitorConfig(Map.empty)
    an[IllegalArgumentException] should be thrownBy
      MonitorConfig(base.updated(MonitorConfig.MonitorTail, "nocolon"))
    an[IllegalArgumentException] should be thrownBy
      MonitorConfig(base.updated(MonitorConfig.Refresh, "not-a-duration"))
    an[IllegalArgumentException] should be thrownBy
      MonitorConfig(base.updated(MonitorConfig.KeyStyleKey, "banana"))
    an[IllegalArgumentException] should be thrownBy
      MonitorConfig(base.updated(MonitorConfig.MaxPollRecords, "0"))
    // negative ISO-8601 durations parse but must be rejected (hot loop)
    an[IllegalArgumentException] should be thrownBy
      MonitorConfig(base.updated(MonitorConfig.Refresh, "PT-5S"))
    // whitespace-only path must fail fast, not yield an empty glob
    an[IllegalArgumentException] should be thrownBy
      MonitorConfig(base.updated(MonitorConfig.MonitorTail, "  :topic"))
    // non-numeric int names the offending key
    val e = intercept[IllegalArgumentException] {
      MonitorConfig(base.updated(MonitorConfig.MaxPollRecords, "10k"))
    }
    e.getMessage should include(MonitorConfig.MaxPollRecords)
  }

  test("reflective converter loading") {
    val cfg = MonitorConfig(base.updated(
      MonitorConfig.SourceRecordConverter,
      "graft.ingest.Records$LineSplitRecordConverter"))
    cfg.converter shouldBe a[Records.LineSplitRecordConverter]
  }
}
