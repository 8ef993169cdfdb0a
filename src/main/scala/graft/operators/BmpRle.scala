package graft.operators

import scala.collection.mutable

/** Minimal real RLE8 BMP codec — pure Scala, zero dependencies.
  *
  * Completes the compression-family ladder: [[Bmp]]/[[Wav]] are fixed
  * layout, [[Png]] is LZ77+Huffman (zlib), [[Gif]] is dictionary
  * coding (LZW) — this is RUN-LENGTH coding, the fourth classic
  * family, in its most widely deployed container: the BI_RLE8 BMP
  * (8-bit palette, bottom-up rows). The packet grammar is the full
  * public spec: encoded runs (count, index), ABSOLUTE packets
  * (0, n≥3: n literal indices, word-aligned with a pad byte), and the
  * escape codes end-of-line (0,0) and end-of-bitmap (0,1); delta
  * (0,2) is rejected as out of the strict subset. Lossless, so pixel
  * readouts stay formula-exact for a DuckDB oracle.
  *
  * The reference's data model treats payloads as opaque bytes
  * (`/root/reference/src/main/scala/com/eneco/trading/kafka/connect/ftp/source/SimpleFileConverter.scala:50-51`);
  * this codec is the decode step an image pipeline bolts onto it.
  */
object BmpRle {

  /** Decoded image: palette indices and looked-up 0xRRGGBB pixels,
    * both TOP-DOWN row-major (rows un-flipped from the file's
    * bottom-up order). */
  final case class Image(
      width: Int, height: Int, pixels: Array[Int], indices: Array[Int])

  private val HeaderLen = 54    // BITMAPFILEHEADER + BITMAPINFOHEADER
  private val PaletteLen = 1024 // 256 RGBQUAD entries

  /** The 256-entry palette both the encoder writes and the oracle
    * replays; the decoder READS it from the bytes (constants differ
    * from [[Gif]]'s so a swapped codec cannot hash-match). */
  def paletteR(i: Int): Int = (7 * i + 3) % 256
  def paletteG(i: Int): Int = (11 * i + 5) % 256
  def paletteB(i: Int): Int = (13 * i + 9) % 256

  private def putU16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
  }
  private def putU32(b: Array[Byte], off: Int, v: Long): Unit =
    (0 until 4).foreach(i => b(off + i) = ((v >> (8 * i)) & 0xff).toByte)
  private def getU16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def getU32(b: Array[Byte], off: Int): Long =
    (0 until 4).map(i => (b(off + i) & 0xffL) << (8 * i)).sum

  /** RLE-encode one row: maximal runs of length ≥ 2 become encoded
    * packets (split at the 255 count cap); stretches of length-1 runs
    * become ABSOLUTE packets when ≥ 3 accumulate (the spec's minimum),
    * else single-count encoded packets — so ordinary corpora exercise
    * BOTH packet kinds. */
  private def encodeRow(row: Array[Int], out: mutable.ArrayBuilder[Byte]): Unit = {
    // maximal runs
    val runs = mutable.ArrayBuffer.empty[(Int, Int)] // (len, value)
    var i = 0
    while (i < row.length) {
      var j = i + 1
      while (j < row.length && row(j) == row(i)) j += 1
      runs += ((j - i, row(i)))
      i = j
    }
    var k = 0
    while (k < runs.length) {
      if (runs(k)._1 == 1) {
        // count the stretch of singletons
        var e = k
        while (e < runs.length && runs(e)._1 == 1) e += 1
        val n = e - k
        if (n >= 3) {
          // absolute packets (cap 255), word-aligned
          var p = k
          while (p < e) {
            val take = math.min(255, e - p)
            if (take >= 3) {
              out += 0; out += take.toByte
              (p until p + take).foreach(q => out += runs(q)._2.toByte)
              if (take % 2 == 1) out += 0 // pad to word boundary
            } else {
              (p until p + take).foreach { q =>
                out += 1; out += runs(q)._2.toByte
              }
            }
            p += take
          }
        } else {
          (k until e).foreach { q => out += 1; out += runs(q)._2.toByte }
        }
        k = e
      } else {
        var left = runs(k)._1
        while (left > 0) {
          val take = math.min(255, left)
          out += take.toByte; out += runs(k)._2.toByte
          left -= take
        }
        k += 1
      }
    }
  }

  /** Encode w×h palette indices (top-down row-major) as a BI_RLE8
    * BMP: 54-byte headers, 256-entry palette, bottom-up rows, EOL
    * after every row but the last, EOB at the end. */
  def encode(w: Int, h: Int, idx: Int => Int): Array[Byte] = {
    require(w > 0 && h > 0 && w.toLong * h <= (1L << 26),
      s"bmprle encode: bad dims ${w}x$h")
    val data = mutable.ArrayBuilder.make[Byte]
    var y = h - 1
    while (y >= 0) { // file rows are bottom-up
      val row = Array.tabulate(w) { x =>
        val v = idx(y * w + x)
        require(v >= 0 && v < 256, s"bmprle encode: index $v out of range")
        v
      }
      encodeRow(row, data)
      if (y > 0) { data += 0; data += 0 } // EOL
      y -= 1
    }
    data += 0; data += 1 // EOB
    val rle = data.result()
    val out = new Array[Byte](HeaderLen + PaletteLen + rle.length)
    out(0) = 'B'; out(1) = 'M'
    putU32(out, 2, out.length.toLong)            // file size
    putU32(out, 10, (HeaderLen + PaletteLen).toLong) // pixel offset
    putU32(out, 14, 40L)                         // BITMAPINFOHEADER
    putU32(out, 18, w.toLong)
    putU32(out, 22, h.toLong)                    // positive: bottom-up
    putU16(out, 26, 1)                           // planes
    putU16(out, 28, 8)                           // bits per pixel
    putU32(out, 30, 1L)                          // BI_RLE8
    putU32(out, 34, rle.length.toLong)           // biSizeImage
    var i = 0
    while (i < 256) { // palette: RGBQUAD = B, G, R, reserved
      out(HeaderLen + 4 * i) = paletteB(i).toByte
      out(HeaderLen + 4 * i + 1) = paletteG(i).toByte
      out(HeaderLen + 4 * i + 2) = paletteR(i).toByte
      i += 1
    }
    System.arraycopy(rle, 0, out, HeaderLen + PaletteLen, rle.length)
    out
  }

  /** Parse a BI_RLE8 BMP. Strict: every header claim validated, rows
    * must fill exactly to the width before EOL/EOB, runs may never
    * overflow a row, delta escapes are rejected, the byte stream must
    * end exactly at EOB — hostile bytes fail loudly, never shift
    * pixels. */
  def decode(bytes: Array[Byte]): Image = {
    require(bytes.length >= HeaderLen + PaletteLen + 2,
      s"bmprle: ${bytes.length} bytes cannot hold headers+palette+EOB")
    require(bytes(0) == 'B' && bytes(1) == 'M', "bmprle: bad magic")
    require(getU32(bytes, 2) == bytes.length,
      "bmprle: declared file size disagrees with the payload")
    val off = getU32(bytes, 10)
    require(off == HeaderLen + PaletteLen,
      s"bmprle: pixel offset $off != ${HeaderLen + PaletteLen}")
    require(getU32(bytes, 14) == 40L, "bmprle: header size != 40")
    val w = getU32(bytes, 18).toInt
    val h = getU32(bytes, 22).toInt
    require(w > 0 && h > 0, s"bmprle: unsupported dims ${w}x$h")
    require(w.toLong * h <= (1L << 26),
      s"bmprle: ${w}x$h exceeds the 64M-pixel decode cap")
    require(getU16(bytes, 26) == 1, "bmprle: planes != 1")
    require(getU16(bytes, 28) == 8, "bmprle: bits per pixel != 8")
    require(getU32(bytes, 30) == 1L, "bmprle: compression != BI_RLE8")
    val sizeImage = getU32(bytes, 34)
    require(HeaderLen + PaletteLen + sizeImage == bytes.length,
      "bmprle: biSizeImage disagrees with the payload")
    val pal = Array.tabulate(256) { i =>
      ((bytes(HeaderLen + 4 * i + 2) & 0xff) << 16) |
        ((bytes(HeaderLen + 4 * i + 1) & 0xff) << 8) |
        (bytes(HeaderLen + 4 * i) & 0xff)
    }
    val idx = new Array[Int](w * h) // file order: bottom-up rows
    var p = HeaderLen + PaletteLen
    var x = 0
    var yFile = 0 // 0 = bottom row
    var eob = false
    def rd(): Int = {
      require(p < bytes.length, "bmprle: truncated packet stream")
      val v = bytes(p) & 0xff; p += 1; v
    }
    while (!eob) {
      require(yFile < h, "bmprle: packets beyond the last row")
      val n = rd()
      if (n > 0) {
        val v = rd()
        require(x + n <= w, s"bmprle: run overflows row $yFile")
        var k = 0
        while (k < n) { idx(yFile * w + x) = v; x += 1; k += 1 }
      } else {
        val esc = rd()
        esc match {
          case 0 => // end of line
            require(x == w, s"bmprle: EOL before row $yFile filled")
            x = 0; yFile += 1
          case 1 => // end of bitmap
            require(x == w && yFile == h - 1,
              "bmprle: EOB before the bitmap filled")
            eob = true
          case 2 =>
            throw new IllegalArgumentException(
              "bmprle: delta escape outside the strict subset")
          case cnt =>
            require(x + cnt <= w,
              s"bmprle: absolute packet overflows row $yFile")
            var k = 0
            while (k < cnt) { idx(yFile * w + x) = rd(); x += 1; k += 1 }
            if (cnt % 2 == 1)
              require(rd() == 0, "bmprle: nonzero absolute pad byte")
        }
      }
    }
    require(p == bytes.length, "bmprle: trailing bytes after EOB")
    // un-flip to top-down and look the palette up
    val topIdx = new Array[Int](w * h)
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var xx = 0
      while (xx < w) {
        val v = idx((h - 1 - y) * w + xx)
        topIdx(y * w + xx) = v
        px(y * w + xx) = pal(v)
        xx += 1
      }
      y += 1
    }
    Image(w, h, px, topIdx)
  }

  /** Deterministic payload generator behind `mm_rle_decode`, two
    * regimes so BOTH packet kinds occur: every fourth 4-pixel stretch
    * varies PER PIXEL (runs of singletons → absolute packets), the
    * rest are constant 4-pixel stretches (→ encoded run packets).
    * Constants differ from every other codec generator; the oracle
    * replays the same two-regime formula. */
  def fromText(docId: Long, t: String): Array[Byte] = {
    val m = t.length
    val w = (m % 13) + 6
    val h = (m % 5) + 3
    encode(w, h, { i =>
      if ((i / 4) % 4 == 0) {
        val c = t.charAt(i % m).toInt
        ((c * 17L + i * 23L + docId) % 256L).toInt
      } else {
        val c = t.charAt((i / 4) % m).toInt
        ((c * 17L + (i / 4) * 23L + docId) % 256L).toInt
      }
    })
  }
}
