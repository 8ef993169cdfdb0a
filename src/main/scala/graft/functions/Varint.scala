package graft.functions

/** LEB128 variable-length integer codec — the posting-list byte
  * format of every production inverted index (Lucene, Elasticsearch;
  * 7 value bits per byte, high bit = continuation). Pure Scala, used
  * by `llm_postings_varint` to materialize delta-encoded posting
  * lists as real index bytes: the byte LENGTH of an encoded value is
  * pure arithmetic on its magnitude (1 byte below 2^7, 2 below 2^14,
  * …), which is what lets a DuckDB oracle price an index segment's
  * size without owning a codec.
  */
object Varint {

  /** Encoded byte length of one nonnegative value. */
  def lengthOf(v: Long): Int = {
    require(v >= 0, s"varint: negative value $v")
    var n = 1
    var x = v >>> 7
    while (x != 0) { n += 1; x >>>= 7 }
    n
  }

  def encode(vs: Seq[Long]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(vs.length * 2)
    vs.foreach { v0 =>
      require(v0 >= 0, s"varint: negative value $v0")
      var v = v0
      while ((v >>> 7) != 0) {
        out.write(((v & 0x7f) | 0x80).toInt)
        v >>>= 7
      }
      out.write((v & 0x7f).toInt)
    }
    out.toByteArray
  }

  /** Decode a whole buffer; rejects a trailing unterminated value and
    * overlong (> 10-byte) encodings loudly. */
  def decode(bs: Array[Byte]): Seq[Long] = {
    val out = Seq.newBuilder[Long]
    var i = 0
    while (i < bs.length) {
      var v = 0L
      var shift = 0
      var done = false
      while (!done) {
        require(i < bs.length, "varint: truncated value at end of buffer")
        require(shift < 64, "varint: overlong encoding")
        val b = bs(i) & 0xff
        // At shift 63 only bit 0 of the payload survives the shift; any
        // higher payload bit would be dropped silently — reject loudly.
        require(shift < 63 || (b & 0x7e) == 0, "varint: overlong encoding")
        v |= (b & 0x7fL) << shift
        shift += 7
        i += 1
        done = (b & 0x80) == 0
      }
      out += v
    }
    out.result()
  }
}
