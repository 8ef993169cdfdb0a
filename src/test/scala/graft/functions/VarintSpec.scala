package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** LEB128 codec gates: roundtrip across every byte-length boundary,
  * the length formula the oracle prices with, and loud rejection of
  * truncated / overlong buffers.
  */
class VarintSpec extends AnyFunSuite with Matchers {

  test("roundtrip across byte-length boundaries; lengthOf matches") {
    val vals = Seq(0L, 1L, 127L, 128L, 16383L, 16384L, 2097151L,
      2097152L, Long.MaxValue)
    val enc = Varint.encode(vals)
    Varint.decode(enc) shouldBe vals
    enc.length shouldBe vals.map(Varint.lengthOf).sum
    Varint.lengthOf(127L) shouldBe 1
    Varint.lengthOf(128L) shouldBe 2
    Varint.lengthOf(16383L) shouldBe 2
    Varint.lengthOf(16384L) shouldBe 3
    Varint.lengthOf(Long.MaxValue) shouldBe 9
    // randomized roundtrip
    val rnd = new scala.util.Random(3)
    val rv = (0 until 500).map(_ => math.abs(rnd.nextLong()) % 3000000L)
    Varint.decode(Varint.encode(rv)) shouldBe rv
  }

  test("hostile buffers are rejected loudly") {
    // truncated: a continuation bit with no following byte
    an[IllegalArgumentException] should be thrownBy
      Varint.decode(Array(0x80.toByte))
    an[IllegalArgumentException] should be thrownBy
      Varint.decode(Varint.encode(Seq(16384L)).dropRight(1))
    // overlong: eleven continuation bytes can encode nothing valid
    an[IllegalArgumentException] should be thrownBy
      Varint.decode(Array.fill(11)(0x80.toByte))
    an[IllegalArgumentException] should be thrownBy
      Varint.encode(Seq(-1L))
  }
}
