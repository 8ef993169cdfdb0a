package graft.functions

/** Canonical Shannon prefix code — the entropy-coding tier with
  * ORACLE-PRICEABLE lengths. Huffman's optimal lengths come out of a
  * sequential heap merge no SQL engine can replay; Shannon's
  * (Shannon 1948) are pure arithmetic — L(c) = ⌈log₂(total/freq_c)⌉,
  * computable in both engines as the binary-string length of
  * (ceil-div − 1) — at a cost of < 1 bit/symbol vs optimal, and they
  * satisfy Kraft (Σ 2^−L ≤ Σ p = 1), so a canonical prefix code
  * exists: sort symbols by (length, symbol), assign consecutive
  * codewords, shifting left at every length increase. The ENCODER and
  * DECODER here are real (bit-packed output, first-code-per-length
  * canonical decoding); only the LENGTHS are the arithmetic the
  * DuckDB oracle reprices.
  */
object ShannonCode {

  /** Canonical codebook from symbol → code length (Kraft-feasible).
    * Returns symbol → (codeValue, length). */
  def canonical(lengths: Map[Char, Int]): Map[Char, (Long, Int)] = {
    require(lengths.nonEmpty, "shannon: empty alphabet")
    val kraft = lengths.values
      .map(l => BigDecimal(1) / BigDecimal(BigInt(1) << l)).sum
    require(kraft <= 1, s"shannon: lengths violate Kraft ($kraft > 1)")
    var code = 0L
    var prevLen = 0
    lengths.toSeq.sortBy { case (c, l) => (l, c) }.map { case (c, l) =>
      if (prevLen != 0) code = (code + 1) << (l - prevLen)
      prevLen = l
      c -> ((code, l))
    }.toMap
  }

  /** Bit-packed encoding (MSB-first). Returns (bytes, bitLength). */
  def encode(text: String, book: Map[Char, (Long, Int)]): (Array[Byte], Long) = {
    val out = new java.io.ByteArrayOutputStream(text.length)
    var acc = 0L
    var nAcc = 0
    var bits = 0L
    text.foreach { ch =>
      val (v, l) = book.getOrElse(ch,
        throw new IllegalArgumentException(s"shannon: '$ch' not in book"))
      // The 64-bit accumulator carries at most 7 bits before this
      // codeword (the drain loop below leaves nAcc < 8), so a 57-bit
      // codeword still fits exactly: 7 + 57 = 64. Beyond that the
      // shift would silently drop high bits. Unreachable for any
      // total/freq < 2^57 — loud.
      require(l <= 57, s"shannon: code length $l exceeds accumulator bound 57")
      acc = (acc << l) | v
      nAcc += l
      bits += l
      while (nAcc >= 8) {
        out.write(((acc >>> (nAcc - 8)) & 0xff).toInt)
        nAcc -= 8
      }
    }
    if (nAcc > 0) out.write(((acc << (8 - nAcc)) & 0xff).toInt)
    (out.toByteArray, bits)
  }

  /** Canonical decode of exactly `bits` bits. */
  def decode(bytes: Array[Byte], bits: Long,
      book: Map[Char, (Long, Int)]): String = {
    // canonical decoding tables: per length, the first code value and
    // the symbols of that length in canonical order
    val byLen = book.toSeq.groupBy(_._2._2).map { case (l, cs) =>
      val sorted = cs.sortBy(_._2._1)
      l -> ((sorted.head._2._1, sorted.map(_._1).toIndexedSeq))
    }
    val maxLen = byLen.keys.max
    val sb = new StringBuilder
    var v = 0L
    var l = 0
    var seen = 0L
    var i = 0
    while (seen < bits) {
      val byteIdx = i >> 3
      require(byteIdx < bytes.length, "shannon: truncated bit stream")
      val bit = (bytes(byteIdx) >> (7 - (i & 7))) & 1
      v = (v << 1) | bit
      l += 1
      seen += 1
      i += 1
      require(l <= maxLen, "shannon: bit pattern matches no codeword")
      byLen.get(l).foreach { case (first, syms) =>
        val idx = v - first
        if (idx >= 0 && idx < syms.length) {
          sb.append(syms(idx.toInt)); v = 0L; l = 0
        }
      }
    }
    require(l == 0, "shannon: dangling bits at end of stream")
    sb.result()
  }
}
