package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Gates for the canonical Shannon codec: prefix-freeness by
  * construction, roundtrips, the < 1 bit/symbol-vs-entropy cost, and
  * loud rejection of hostile bit streams.
  */
class ShannonCodeSpec extends AnyFunSuite with Matchers {

  private def lengthsOf(text: String): Map[Char, Int] = {
    val freq = text.groupBy(identity).view.mapValues(_.length.toLong)
    val total = text.length.toLong
    freq.map { case (c, f) =>
      val k = (total + f - 1) / f
      c -> (if (k <= 1) 1
            else 64 - java.lang.Long.numberOfLeadingZeros(k - 1))
    }.toMap
  }

  test("roundtrip, canonical prefix-freeness, and the Shannon bound") {
    val rnd = new scala.util.Random(9)
    val alphabet = "abcdefgh XYZ.,"
    val texts = Seq(
      "aaaaaaaab", // skewed: one dominant symbol
      alphabet * 3, // uniform
      (0 until 2000).map(_ => alphabet(rnd.nextInt(alphabet.length)))
        .mkString,
      "z") // single-symbol corpus (the L-clamp path)
    texts.foreach { t =>
      val book = ShannonCode.canonical(lengthsOf(t))
      // prefix-freeness: no codeword is a prefix of another
      val codes = book.values.toSeq.map { case (v, l) =>
        String.format(s"%${l}s",
          java.lang.Long.toBinaryString(v)).replace(' ', '0')
      }
      for (a <- codes; b <- codes if a != b)
        b.startsWith(a) shouldBe false
      val (bytes, bits) = ShannonCode.encode(t, book)
      ShannonCode.decode(bytes, bits, book) shouldBe t
      // Shannon's guarantee: coded length < n·(H + 1) where the code
      // pays ceil(log2(1/p)) <= log2(1/p) + 1 per symbol
      val n = t.length.toDouble
      val h = t.groupBy(identity).values.map { g =>
        val p = g.length / n
        -p * math.log(p) / math.log(2)
      }.sum
      bits.toDouble should be < n * (h + 1) + 1e-9
      bits.toDouble should be >= n * h - 1e-9 // entropy lower bound
    }
  }

  test("hostile bit streams are rejected loudly") {
    val t = "abracadabra"
    val book = ShannonCode.canonical(lengthsOf(t))
    val (bytes, bits) = ShannonCode.encode(t, book)
    // truncated buffer
    an[IllegalArgumentException] should be thrownBy
      ShannonCode.decode(bytes.dropRight(1), bits, book)
    // dangling bits: claim one more bit than a whole codeword stream
    an[IllegalArgumentException] should be thrownBy
      ShannonCode.decode(bytes ++ Array(0.toByte), bits + 1, book)
    // unknown symbol at encode time
    an[IllegalArgumentException] should be thrownBy
      ShannonCode.encode("abraQ", book)
  }
}
