package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Byte-level gates for the from-scratch Avro object-container codec:
  * roundtrips across block boundaries and scripts, zigzag edge values,
  * and loud rejection of every structural lie.
  */
class AvroLiteSpec extends AnyFunSuite with Matchers {
  import AvroLite.Doc

  test("roundtrips exactly: multi-block containers, CJK and empty " +
      "texts, negative and extreme ids through zigzag") {
    val docs = (0 until 27).map { i => // 27 docs -> 3 blocks (10/10/7)
      Doc(i.toLong * 7 - 13, // negative ids exercise zigzag
        if (i % 5 == 0) "" else s"doc 五 number $i ${"x" * i}")
    } :+ Doc(Long.MaxValue, "max") :+ Doc(Long.MinValue, "min")
    AvroLite.decode(AvroLite.encode(docs)) shouldBe docs
    // empty corpus: header-only container
    AvroLite.decode(AvroLite.encode(Seq.empty)) shouldBe Seq.empty
  }

  test("rejects structural lies loudly: bad magic, flipped sync, " +
      "count/size lies, truncation, trailing bytes") {
    val good = AvroLite.encode(
      (0 until 15).map(i => Doc(i.toLong, s"text $i")))
    def boom(m: Array[Byte]): Unit =
      intercept[IllegalArgumentException](AvroLite.decode(m))
        .getMessage should include("avro")
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    boom(badMagic)
    // flip a byte of the LAST sync marker (tail of the file)
    val badSync = good.clone()
    badSync(good.length - 3) = (badSync(good.length - 3) ^ 0x40).toByte
    boom(badSync)
    for (k <- Seq(0, 3, 4, 20, good.length - 17, good.length - 1))
      boom(good.take(k))
    boom(good ++ Array[Byte](5)) // a stray trailing "block count"
    // every single-bit flip anywhere either throws the codec's error
    // or (metadata-comment region aside — there is none in this
    // subset) decodes to a DIFFERENT doc list, never an index crash
    val rnd = new scala.util.Random(17)
    var silentSame = 0
    for (off <- 0 until good.length; bit <- Seq(0, rnd.nextInt(7) + 1)) {
      val m = good.clone(); m(off) = (m(off) ^ (1 << bit)).toByte
      try {
        val d = AvroLite.decode(m)
        // an undetected flip can only land INSIDE a record's payload
        // bytes — it must change the decoded data, never pass silently
        if (d == AvroLite.decode(good)) silentSame += 1
      } catch {
        case e: IllegalArgumentException =>
          e.getMessage should include("avro")
      }
    }
    silentSame shouldBe 0
  }
}
