package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Single-source gate for the bench band calibration (round-10 verdict
  * "What's wrong" #3): the settled band tops exist in two places — the
  * canonical human-audited table in BASELINE.md and the literal map the
  * harness reads (`Bench.settledBandTop`) — and a drifted edit to
  * either silently miscalibrates the band trigger. This spec parses
  * BASELINE.md's "Settled band tops" table and requires exact equality
  * (same query set, same values), so the two copies cannot diverge
  * without failing the build.
  */
class BenchBandsSpec extends AnyFunSuite with Matchers {

  private def parseBaselineBands(): Map[String, Double] = {
    val lines = scala.io.Source.fromFile("BASELINE.md")("UTF-8").getLines().toSeq
    val start = lines.indexWhere(_.startsWith("## Settled band tops"))
    start should be >= 0
    val row = """\|\s*([A-Za-z0-9_]+)\s*\|\s*([0-9.]+)\s*\|""".r
    lines.drop(start + 1).takeWhile(!_.startsWith("## "))
      .collect { case row(q, v) => q -> v.toDouble }.toMap
  }

  test("BASELINE.md's band table and Bench.settledBandTop are identical") {
    val fromDoc = parseBaselineBands()
    fromDoc should not be empty
    // symmetric difference first, for a readable failure
    (fromDoc.keySet -- Bench.settledBandTop.keySet) shouldBe empty
    (Bench.settledBandTop.keySet -- fromDoc.keySet) shouldBe empty
    fromDoc shouldBe Bench.settledBandTop
  }

  test("every band-top query is a registered headliner (a demoted or " +
      "renamed query must drop its band row)") {
    Bench.settledBandTop.keySet -- SparkEntry.headlineQueries.toSet shouldBe empty
  }

  private def parseBaselineCrossings(): Set[String] = {
    val lines = scala.io.Source.fromFile("BASELINE.md")("UTF-8").getLines().toSeq
    val start = lines.indexWhere(_.startsWith("## Prior-round band crossings"))
    start should be >= 0
    val row = """\|\s*([A-Za-z0-9_]+)\s*\|""".r
    lines.drop(start + 1).takeWhile(!_.startsWith("## "))
      .collect { case row(q) if q != "query" => q }.toSet
  }

  test("BASELINE.md's prior-crossings list and Bench.priorBandCrossings are identical") {
    parseBaselineCrossings() shouldBe Bench.priorBandCrossings
  }

  test("every prior-crossing query has a settled band row (the 1.0x " +
      "trigger is meaningless without a band top)") {
    Bench.priorBandCrossings -- Bench.settledBandTop.keySet shouldBe empty
  }
}
