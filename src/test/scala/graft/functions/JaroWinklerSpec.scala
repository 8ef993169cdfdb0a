package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Textbook vectors for the Jaro-Winkler kernel (the query's oracle
  * is DuckDB's independent implementation; these pin the classics
  * from the record-linkage literature plus the degenerate paths).
  */
class JaroWinklerSpec extends AnyFunSuite with Matchers {
  private def jw(a: String, b: String) = JaroWinkler.jaroWinkler(a, b)

  test("classic literature vectors and degenerate paths") {
    jw("martha", "marhta") shouldBe 0.9611111111111111 +- 1e-12
    jw("dixon", "dicksonx") shouldBe 0.8133333333333332 +- 1e-12
    jw("crate", "trace") shouldBe 0.7333333333333333 +- 1e-12
    jw("abcdef", "abcdef") shouldBe 1.0
    jw("", "abc") shouldBe 0.0
    jw("a", "b") shouldBe 0.0
    // the prefix boost only fires above the 0.7 threshold
    JaroWinkler.jaro("crate", "trace") shouldBe
      jw("crate", "trace") // no shared prefix -> no boost
    jw("prefixed", "prefixes") should be >
      JaroWinkler.jaro("prefixed", "prefixes")
    // symmetry
    jw("dixon", "dicksonx") shouldBe jw("dicksonx", "dixon") +- 1e-12
  }
}
