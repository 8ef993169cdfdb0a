package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** The Aho-Corasick scan must count EXACTLY the (position, pattern)
  * pairs a naive per-position probe counts — including overlapping
  * occurrences and nested patterns — and must run inside whole-stage
  * codegen (the reason it exists instead of N `contains` columns). */
class BlocklistScanSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def naive(text: String, pats: Seq[String]): (Long, Long) = {
    val hits = for {
      p <- pats
      i <- 0 to text.length - p.length
      if text.regionMatches(i, p, 0, p.length)
    } yield p
    (hits.size.toLong, hits.distinct.size.toLong)
  }

  test("matches a naive all-occurrences probe on adversarial strings") {
    import spark.implicits._
    val pats = Seq("aba", "ba", "a", "abab", "bb", "zzz")
    val rnd = new scala.util.Random(77)
    val rows = Seq("", "a", "ab", "aba", "abab", "ababab", "bbbb",
      "abba abab aba") ++
      (0 until 200).map(_ =>
        (0 until rnd.nextInt(40)).map(_ => "ab "(rnd.nextInt(3))).mkString)
    val got = rows.toDF("t")
      .select($"t", BlocklistScan.blocklist_scan($"t", pats).as("h"))
      .select($"t", $"h.n_hits", $"h.n_patterns")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    for (t <- rows)
      withClue(s"text '$t'") { got(t) shouldBe naive(t, pats) }
  }

  test("multi-byte UTF-8 patterns match byte-exactly, never mid-rune") {
    import spark.implicits._
    val pats = Seq("é", "éé", "e")
    val rows = Seq("été", "éé", "eée", "日本é語")
    val got = rows.toDF("t")
      .select(BlocklistScan.blocklist_scan($"t", pats).as("h"))
      .select($"h.n_hits", $"h.n_patterns")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    got shouldBe rows.map(naive(_, pats))
  }

  test("runs inside whole-stage codegen, not interpreted fallback") {
    import spark.implicits._
    // range() keeps the projection out of ConvertToLocalRelation's
    // constant folding, so the scan actually reaches codegen; the
    // generated source must call the static helper (a CodegenFallback
    // expression would show an Expression.eval reflection site instead)
    val df = spark.range(2).select(
        when($"id" === 0, "a table and a row scan").otherwise("x").as("t"))
      .select(BlocklistScan.blocklist_scan($"t", Seq("table", "scan")).as("h"))
      .select($"h.n_hits")
    val plan = df.queryExecution.executedPlan
    plan.toString should include("*(1) Project") // * = whole-stage span
    org.apache.spark.sql.execution.debug.codegenString(plan) should
      include("graft.functions.BlocklistScan.scan")
    df.collect().map(_.getLong(0)).sorted shouldBe Array(0L, 2L)
  }

  test("builder rejects empty and duplicate patterns loudly") {
    intercept[IllegalArgumentException] {
      BlocklistScan.build(Seq("a", ""))
    }.getMessage should include("empty pattern")
    intercept[IllegalArgumentException] {
      BlocklistScan.build(Seq("a", "a"))
    }.getMessage should include("duplicate")
  }
}
