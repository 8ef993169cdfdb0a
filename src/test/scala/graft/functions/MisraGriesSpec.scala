package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pure properties of the mergeable Misra–Gries summary. The invariants
  * that make the heavy-hitters query's exact-recount design sound:
  * under ANY reduce/merge tree (= any Spark partitioning and combine
  * order), every term with true frequency > N/(cap+1) survives in the
  * summary, and every retained counter undercounts by at most
  * N/(cap+1). Alphabets larger than the capacity force the eviction
  * and merge-reduction paths that the tiny fixture vocabulary never
  * reaches.
  */
class MisraGriesSpec extends AnyFunSuite with Matchers {

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  /** Skewed alphabet: low ids drawn far more often, so streams contain
    * genuine heavy hitters as well as a long tail. */
  private val streamGen: Gen[List[String]] =
    Gen.listOf(Gen.frequency(
      5 -> Gen.const("hh0"), 3 -> Gen.const("hh1"),
      2 -> Gen.oneOf("m0", "m1", "m2"),
      3 -> Gen.chooseNum(0, 40).map(i => s"t$i")))

  private def foldSplit(agg: MisraGriesAggregator, parts: List[List[String]]): MG =
    parts.map(_.foldLeft(agg.zero)(agg.reduce)).foldLeft(agg.zero)(agg.merge)

  /** Random split points → random partitionings of the stream. */
  private def splitsGen(n: Int): Gen[List[Int]] =
    Gen.listOfN(3, Gen.chooseNum(0, math.max(0, n)))

  private def partsOf(xs: List[String], cuts: List[Int]): List[List[String]] = {
    val sorted = cuts.map(c => math.min(c, xs.length)).sorted
    val bounds = (0 :: sorted) :+ xs.length
    bounds.zip(bounds.tail).map { case (a, b) => xs.slice(a, math.max(a, b)) }
  }

  test("property: every term above N/(cap+1) survives any partitioning (containment)") {
    checkProp(Prop.forAll(streamGen, Gen.chooseNum(2, 8)) { (xs, cap) =>
      Prop.forAll(splitsGen(xs.length)) { cuts =>
        val agg = new MisraGriesAggregator(cap)
        val mg = foldSplit(agg, partsOf(xs, cuts))
        val truth = xs.groupBy(identity).view.mapValues(_.length.toLong)
        val thr = xs.length.toDouble / (cap + 1)
        truth.forall { case (t, c) =>
          c <= thr || mg.terms.contains(t)
        }
      }
    })
  }

  test("property: retained counts undercount by at most N/(cap+1) and never overcount") {
    checkProp(Prop.forAll(streamGen, Gen.chooseNum(2, 8)) { (xs, cap) =>
      Prop.forAll(splitsGen(xs.length)) { cuts =>
        val agg = new MisraGriesAggregator(cap)
        val mg = foldSplit(agg, partsOf(xs, cuts))
        val truth = xs.groupBy(identity).view.mapValues(_.length.toLong).toMap
        val thr = xs.length.toDouble / (cap + 1)
        mg.terms.toList.zip(mg.counts.toList).forall { case (t, est) =>
          val c = truth.getOrElse(t, 0L)
          est <= c && (c - est) <= thr
        } && mg.terms.length <= cap && mg.terms.distinct.length == mg.terms.length
      }
    })
  }

  test("merge order does not break the guarantee (associativity of the bound)") {
    val xs = (List.fill(40)("hot") ++ (0 until 60).map(i => s"cold$i")).toList
    val agg = new MisraGriesAggregator(4)
    val parts = xs.grouped(13).toList.map(_.foldLeft(agg.zero)(agg.reduce))
    val leftFold = parts.foldLeft(agg.zero)(agg.merge)
    val pairTree = parts.reduce(agg.merge)
    // both trees must retain the one genuine heavy hitter (40 > 100/5)
    leftFold.terms should contain("hot")
    pairTree.terms should contain("hot")
  }

  test("eviction path: capacity-1 summary of a majority stream keeps the majority item") {
    val xs = List("a", "b", "a", "c", "a", "d", "a", "a")
    val agg = new MisraGriesAggregator(1)
    val mg = xs.foldLeft(agg.zero)(agg.reduce)
    mg.terms.toList shouldBe List("a") // 5/8 majority must survive cap=1
  }
}
