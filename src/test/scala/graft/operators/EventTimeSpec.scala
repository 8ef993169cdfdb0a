package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{Tables, TestSpark}

/** Semantic gate for `evt_pattern_match`: the query's regex scan must
  * agree with an explicit hand-rolled automaton implementing the
  * leftmost-greedy non-overlapping semantics of `v[cv]*p` — an
  * implementation independent of BOTH regex engines (Java in Spark,
  * RE2 in DuckDB), so an engine-semantics surprise (overlap handling,
  * backtracking on the run boundary) fails here even if the two
  * engines happen to agree with each other.
  */
class EventTimeSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Leftmost non-overlapping matches of v[cv]*p: at a 'v', the greedy
    * [cv]* run ends at the first non-[cv] char, which must be 'p'
    * (backtracking cannot help — every interior char is c/v, never p);
    * on failure the scan advances one char, on success it resumes
    * after the match. Returns match lengths in order. */
  private def scanMatches(s: String): Seq[Int] = {
    val out = Seq.newBuilder[Int]
    var i = 0
    while (i < s.length) {
      if (s(i) == 'v') {
        var j = i + 1
        while (j < s.length && (s(j) == 'c' || s(j) == 'v')) j += 1
        if (j < s.length && s(j) == 'p') {
          out += (j - i + 1)
          i = j + 1
        } else i += 1
      } else i += 1
    }
    out.result()
  }

  test("pattern matcher agrees with an explicit automaton on every user " +
      "and on adversarial planted sequences") {
    // automaton unit truths first: overlap, backtracking, exclusion
    scanMatches("vcvp") shouldBe Seq(4)        // greedy run through c,v
    scanMatches("vcvevp") shouldBe Seq(2)      // error breaks the run
    scanMatches("vpvp") shouldBe Seq(2, 2)     // non-overlapping restart
    scanMatches("vvp") shouldBe Seq(3)         // v inside the run consumed
    scanMatches("pcv") shouldBe Seq()          // no purchase => no match
    scanMatches("vcsp") shouldBe Seq()         // signup breaks the run

    val events = Tables.events(spark, sf)
      .selectExpr("user_id", "ts div 1000 as tus", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val codes = Map("view" -> 'v', "click" -> 'c', "purchase" -> 'p',
      "signup" -> 's', "error" -> 'e')
    val seqs = events.groupBy(_._1).map { case (u, es) =>
      u -> es.sortBy(e => (e._2, e._3)).map(e => codes(e._4)).mkString
    }
    val expected = seqs.map { case (u, s) =>
      val m = scanMatches(s)
      (u, s.length.toLong, m.size.toLong,
        (if (m.isEmpty) 0 else m.max).toLong, m.sum.toLong)
    }.toSeq.sortBy(_._1)
    val got = graft.SparkEntry.queries("evt_pattern_match")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    got shouldBe expected
    // non-vacuity: the fixture actually exercises matching
    got.map(_._3).sum should be > 0L
  }
}
