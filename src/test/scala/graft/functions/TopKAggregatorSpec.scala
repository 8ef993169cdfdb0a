package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pure properties of the bounded top-k buffer: any interleaving of
  * reduce/merge must equal sorting the full input and taking k — the
  * invariant that makes the map-side-combined shuffle safe.
  */
class TopKAggregatorSpec extends AnyFunSuite with Matchers {

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  private val itemGen = for {
    s <- Gen.chooseNum(-5.0, 5.0)
    id <- Gen.chooseNum(0L, 50L)
  } yield (s, id)

  private def expected(items: List[(Double, Long)], k: Int): List[(Double, Long)] =
    items.sortBy { case (s, id) => (-s, id) }.take(k)

  test("property: reduce-fold equals sort-and-take for any input and k") {
    checkProp(Prop.forAll(Gen.listOf(itemGen), Gen.chooseNum(1, 6)) { (items, k) =>
      val agg = new TopKAggregator(k)
      val buf = items.foldLeft(agg.zero)(agg.reduce)
      buf.scores.zip(buf.ids).toList == expected(items, k)
    })
  }

  test("property: merge of split halves equals whole-input fold (shuffle-combine safety)") {
    checkProp(Prop.forAll(Gen.listOf(itemGen), Gen.chooseNum(1, 6)) { (items, k) =>
      val agg = new TopKAggregator(k)
      val (l, r) = items.splitAt(items.length / 2)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      merged.scores.zip(merged.ids).toList == expected(items, k)
    })
  }

  test("duplicate (score, id) pairs are kept as multiset entries") {
    val agg = new TopKAggregator(3)
    val buf = List((1.0, 1L), (1.0, 1L), (2.0, 2L))
      .foldLeft(agg.zero)(agg.reduce)
    buf.scores.toList shouldBe List(2.0, 1.0, 1.0)
    buf.ids.toList shouldBe List(2L, 1L, 1L)
  }
}
