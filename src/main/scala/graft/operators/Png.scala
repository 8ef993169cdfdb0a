package graft.operators

import java.util.zip.{CRC32, Deflater, Inflater}

/** Minimal real PNG codec — pure Scala over the JDK's built-in zlib
  * (`java.util.zip.Deflater`/`Inflater`), zero new dependencies.
  *
  * The qualitatively missing codec tier after [[Bmp]]/[[Wav]]
  * (round-11 verdict #7): those prove FIXED-LAYOUT parsing; PNG adds
  * the machinery of a real compressed container — chunked framing
  * with per-chunk CRC-32, a zlib-deflated pixel stream, and per-row
  * predictive filters (None/Sub/Up/Average/Paeth) that must be
  * REVERSED byte-exactly during decode. The subset is 8-bit truecolor
  * (color type 2), non-interlaced — the format's canonical core — so
  * after inflation every byte position is fixed arithmetic a DuckDB
  * oracle can price from the generating formula (compression is
  * lossless, so pixel readouts are formula-exact even though the
  * container's byte length is not).
  *
  * The reference's data model treats payloads as opaque bytes
  * (`/root/reference/src/main/scala/com/eneco/trading/kafka/connect/ftp/source/SimpleFileConverter.scala:50-51`);
  * this codec is the decode step an image pipeline bolts onto that
  * model. Filter math follows the public PNG specification (RFC 2083
  * §6); no image library is consulted or available in this container.
  */
object Png {

  /** Decoded image: pixels TOP-DOWN row-major packed 0xRRGGBB (PNG
    * stores rows top-down already — no [[Bmp]]-style un-flip; the
    * work is CRC checking, inflation, and filter reversal). */
  final case class Image(
      width: Int, height: Int, bitDepth: Int, colorType: Int,
      pixels: Array[Int])

  private val Signature: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def putU32(b: Array[Byte], off: Int, v: Long): Unit = {
    var i = 0 // network byte order (big-endian), unlike BMP/WAV
    while (i < 4) { b(off + i) = ((v >> (8 * (3 - i))) & 0xff).toByte; i += 1 }
  }

  private def getU32(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 4) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    v
  }

  private def crcOf(tag: String, data: Array[Byte], from: Int, len: Int): Long = {
    val c = new CRC32
    tag.foreach(ch => c.update(ch.toInt))
    c.update(data, from, len)
    c.getValue
  }

  private def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](12 + data.length)
    putU32(out, 0, data.length.toLong)
    (0 until 4).foreach(i => out(4 + i) = tag.charAt(i).toByte)
    System.arraycopy(data, 0, out, 8, data.length)
    putU32(out, 8 + data.length, crcOf(tag, data, 0, data.length))
    out
  }

  /** PNG's Paeth predictor (spec §6.6): nearest of a (left),
    * b (above), c (upper-left) to a + b − c, ties a → b → c. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode w×h 8-bit truecolor; `pix(i)` yields (r, g, b) at
    * top-down row-major index i. Row y uses filter type
    * `filterOf(y)` (0-4) — the caller can exercise every filter.
    * The IDAT stream is split in two chunks to keep multi-IDAT
    * concatenation an exercised decode path, per the spec's "any
    * number of IDAT chunks" rule. */
  def encode(w: Int, h: Int, pix: Int => (Int, Int, Int),
      filterOf: Int => Int = _ % 5): Array[Byte] = {
    require(w > 0 && h > 0, s"png encode: degenerate dims ${w}x$h")
    val rowLen = w * 3
    // raw scanlines (no filter bytes yet), top-down
    val raw = new Array[Byte](h * rowLen)
    var i = 0
    while (i < w * h) {
      val (r, g, b) = pix(i)
      raw(i * 3) = (r & 0xff).toByte
      raw(i * 3 + 1) = (g & 0xff).toByte
      raw(i * 3 + 2) = (b & 0xff).toByte
      i += 1
    }
    // filtered stream: per row one filter-type byte + rowLen bytes
    val filt = new Array[Byte](h * (1 + rowLen))
    var y = 0
    while (y < h) {
      val ft = filterOf(y)
      require(ft >= 0 && ft <= 4, s"png encode: bad filter type $ft")
      filt(y * (1 + rowLen)) = ft.toByte
      var x = 0
      while (x < rowLen) {
        val cur = raw(y * rowLen + x) & 0xff
        val a = if (x >= 3) raw(y * rowLen + x - 3) & 0xff else 0
        val b = if (y > 0) raw((y - 1) * rowLen + x) & 0xff else 0
        val c = if (x >= 3 && y > 0) raw((y - 1) * rowLen + x - 3) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => paeth(a, b, c)
        }
        filt(y * (1 + rowLen) + 1 + x) = ((cur - pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    // zlib-deflate the filtered stream
    val defl = new Deflater(Deflater.DEFAULT_COMPRESSION, false)
    defl.setInput(filt); defl.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!defl.finished()) zbuf.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    val z = zbuf.toByteArray
    val ihdr = new Array[Byte](13)
    putU32(ihdr, 0, w.toLong)
    putU32(ihdr, 4, h.toLong)
    ihdr(8) = 8  // bit depth
    ihdr(9) = 2  // color type: truecolor
    ihdr(10) = 0 // deflate
    ihdr(11) = 0 // adaptive filtering
    ihdr(12) = 0 // no interlace
    val cut = z.length / 2 // two IDATs: concatenation is a real path
    Signature ++ chunk("IHDR", ihdr) ++
      chunk("IDAT", z.take(cut)) ++ chunk("IDAT", z.drop(cut)) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Parse 8-bit truecolor non-interlaced PNG. Every chunk CRC is
    * verified, the inflated stream must have the exact filtered-
    * scanline length, and every filter byte must name a valid type —
    * hostile bytes fail loudly, never shift pixels. */
  def decode(bytes: Array[Byte]): Image = {
    require(bytes.length >= 8 + 25 + 12 + 12, // sig + IHDR + IDAT + IEND
      s"png: ${bytes.length} bytes cannot hold sig+IHDR+IDAT+IEND")
    require((0 until 8).forall(i => bytes(i) == Signature(i)),
      "png: bad signature")
    var off = 8
    var w = 0; var h = 0
    var seenIhdr = false; var seenIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!seenIend) {
      require(off + 12 <= bytes.length, "png: truncated chunk header")
      val len = getU32(bytes, off)
      require(len <= Int.MaxValue - 12 && off + 12 + len <= bytes.length,
        s"png: chunk length $len overruns the file")
      val tag = new String(bytes.slice(off + 4, off + 8), "US-ASCII")
      require(tag.forall(c => c.isLetter),
        s"png: invalid chunk tag '$tag'")
      val dataOff = off + 8
      val storedCrc = getU32(bytes, dataOff + len.toInt)
      require(storedCrc == crcOf(tag, bytes, dataOff, len.toInt),
        s"png: bad CRC on $tag chunk")
      tag match {
        case "IHDR" =>
          require(!seenIhdr, "png: duplicate IHDR")
          require(len == 13, s"png: IHDR length $len != 13")
          require(off == 8, "png: IHDR must be the first chunk")
          w = getU32(bytes, dataOff).toInt
          h = getU32(bytes, dataOff + 4).toInt
          require(w > 0 && h > 0, s"png: unsupported dims ${w}x$h")
          require(bytes(dataOff + 8) == 8, "png: bit depth != 8")
          require(bytes(dataOff + 9) == 2,
            s"png: color type ${bytes(dataOff + 9)} unsupported")
          require(bytes(dataOff + 10) == 0, "png: unknown compression")
          require(bytes(dataOff + 11) == 0, "png: unknown filter method")
          require(bytes(dataOff + 12) == 0, "png: interlace unsupported")
          seenIhdr = true
        case "IDAT" =>
          require(seenIhdr, "png: IDAT before IHDR")
          idat.write(bytes, dataOff, len.toInt)
        case "IEND" =>
          require(len == 0, "png: IEND must be empty")
          require(off + 12 == bytes.length,
            "png: trailing bytes after IEND")
          seenIend = true
        case other =>
          // strict subset: the generator emits no ancillary chunks,
          // so any other tag is hostile input here
          throw new IllegalArgumentException(
            s"png: unexpected chunk '$other'")
      }
      off += 12 + len.toInt
    }
    require(seenIhdr, "png: missing IHDR")
    val rowLen = w * 3
    val expect = h.toLong * (1 + rowLen)
    require(expect <= Int.MaxValue, s"png: image too large")
    // inflate the concatenated IDAT stream
    val infl = new Inflater(false)
    infl.setInput(idat.toByteArray)
    val filt = new Array[Byte](expect.toInt)
    var got = 0
    try {
      while (got < filt.length && !infl.finished()) {
        val n = infl.inflate(filt, got, filt.length - got)
        require(n > 0 || infl.finished(),
          "png: truncated or corrupt zlib stream")
        got += n
      }
      require(got == filt.length && (infl.finished() ||
          infl.inflate(new Array[Byte](1)) == 0 && infl.finished()),
        s"png: inflated ${got} bytes, scanlines need ${filt.length}")
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(
          s"png: corrupt zlib stream (${e.getMessage})")
    } finally infl.end()
    // reverse per-row filters into raw scanlines
    val raw = new Array[Byte](h * rowLen)
    var y = 0
    while (y < h) {
      val ft = filt(y * (1 + rowLen)) & 0xff
      require(ft <= 4, s"png: invalid filter type $ft on row $y")
      var x = 0
      while (x < rowLen) {
        val f = filt(y * (1 + rowLen) + 1 + x) & 0xff
        val a = if (x >= 3) raw(y * rowLen + x - 3) & 0xff else 0
        val b = if (y > 0) raw((y - 1) * rowLen + x) & 0xff else 0
        val c = if (x >= 3 && y > 0) raw((y - 1) * rowLen + x - 3) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => paeth(a, b, c)
        }
        raw(y * rowLen + x) = ((f + pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val px = new Array[Int](w * h)
    var i = 0
    while (i < px.length) {
      px(i) = ((raw(i * 3) & 0xff) << 16) |
        ((raw(i * 3 + 1) & 0xff) << 8) | (raw(i * 3 + 2) & 0xff)
      i += 1
    }
    Image(w, h, 8, 2, px)
  }

  /** Deterministic payload generator behind `mm_png_decode`: a real
    * PNG whose dims and pixels derive from the document's printable-
    * ASCII text by pure integer arithmetic — the SAME formula the
    * DuckDB oracle replays. h ≥ 5, so rows exercise every filter
    * type 0-4 (filterOf = y % 5). Constants differ from
    * [[Bmp.fromText]] so a swapped codec cannot hash-match. */
  def fromText(docId: Long, t: String): Array[Byte] = {
    val m = t.length
    val w = (m % 19) + 4
    val h = (m % 11) + 5
    encode(w, h, { i =>
      val c = t.charAt(i % m).toInt
      (c % 256, (c * 11 + i) % 256, ((i * 17L + docId) % 256L).toInt)
    })
  }
}
