package graft.operators

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, DataFormatException, Inflater}

/** From-scratch gzip (RFC 1952) member codec — pure Scala plus the
  * JDK's raw `Inflater`, zero new deps.
  *
  * The compression tier BMP/WAV/PNG/Avro left open on the CONTAINER
  * side: PNG exercises zlib-wrapped deflate inside a chunked image
  * container; gzip is the wrapper 100 TB text corpora actually ship
  * in (`*.jsonl.gz`). Both halves are real:
  *
  *  - [[encode]] writes stored-mode DEFLATE (RFC 1951 BTYPE=00) in
  *    65535-byte blocks with a fixed header (MTIME=0, OS=255), so the
  *    container is SPEC-DETERMINED byte for byte and its length is
  *    pure arithmetic — `10 + 5·blocks + n + 8` — which a DuckDB
  *    oracle prices with no codec of its own. Stored mode is the
  *    deliberate choice: any compressed encoding's length is
  *    implementation-dependent and would be unpriceable.
  *  - [[decode]] is a general gzip reader: OWN header parsing
  *    (magic, CM, FLG with FEXTRA/FNAME/FCOMMENT/FHCRC skipping and
  *    reserved-bit rejection), raw-deflate inflation (accepts ANY
  *    conformant deflate stream, not just stored blocks — the spec
  *    cross-validates against `GZIPOutputStream`'s compressed
  *    output), then OWN trailer verification of both CRC32 and
  *    ISIZE. Every structural lie fails a loud `require`.
  *
  * The reference's data model treats payloads as opaque bytes
  * (`/root/reference/src/main/scala/com/eneco/trading/kafka/connect/ftp/source/SimpleFileConverter.scala:50-51`);
  * this codec is the decompress step an ingest pipeline bolts onto
  * that model before line splitting.
  */
object Gzip {

  /** A decoded member: the payload plus the header/trailer facts the
    * parser verified (deflateLen = compressed body bytes, useful for
    * split planning). */
  final case class Member(
      data: Array[Byte], mtime: Long, os: Int, deflateLen: Int)

  /** Max payload of one stored DEFLATE block (16-bit LEN). */
  private val MaxStored = 65535

  /** Blocks [[encode]] emits for an `n`-byte payload (≥ 1: the empty
    * payload still needs a final stored block). */
  def storedBlocks(n: Int): Int = math.max(1, (n + MaxStored - 1) / MaxStored)

  /** Container length [[encode]] produces — header 10 + 5 per stored
    * block + payload + trailer 8. The oracle's arithmetic twin. */
  def encodedLength(n: Int): Int = 10 + 5 * storedBlocks(n) + n + 8

  def encode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(encodedLength(data.length))
    // header: magic, CM=8 (deflate), FLG=0, MTIME=0, XFL=0, OS=255
    out.write(0x1f); out.write(0x8b); out.write(8); out.write(0)
    (0 until 4).foreach(_ => out.write(0))
    out.write(0); out.write(0xff)
    // stored blocks: 3-bit header (BFINAL, BTYPE=00) pads to one
    // byte, then LEN and its ones'-complement NLEN, little-endian
    val nBlocks = storedBlocks(data.length)
    var off = 0
    for (b <- 0 until nBlocks) {
      val len = math.min(MaxStored, data.length - off)
      out.write(if (b == nBlocks - 1) 1 else 0)
      out.write(len & 0xff); out.write((len >> 8) & 0xff)
      out.write(~len & 0xff); out.write((~len >> 8) & 0xff)
      out.write(data, off, len)
      off += len
    }
    val crc = new CRC32(); crc.update(data)
    writeLe32(out, crc.getValue)
    writeLe32(out, data.length.toLong & 0xffffffffL)
    out.toByteArray
  }

  private def writeLe32(out: ByteArrayOutputStream, v: Long): Unit =
    (0 until 4).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))

  def decode(bytes: Array[Byte]): Member = {
    require(bytes.length >= 18,
      s"gzip: ${bytes.length} bytes cannot hold header(10)+trailer(8)")
    def u8(i: Int) = bytes(i) & 0xff
    def le32(i: Int): Long =
      (0 until 4).map(j => u8(i + j).toLong << (8 * j)).sum
    require(u8(0) == 0x1f && u8(1) == 0x8b,
      f"gzip: bad magic ${u8(0)}%02x${u8(1)}%02x")
    require(u8(2) == 8, s"gzip: unsupported compression method ${u8(2)}")
    val flg = u8(3)
    require((flg & 0xe0) == 0, f"gzip: reserved FLG bits set ($flg%02x)")
    val mtime = le32(4)
    val os = u8(9)
    // optional header fields, in RFC order
    var p = 10
    if ((flg & 4) != 0) { // FEXTRA
      require(p + 2 <= bytes.length - 8, "gzip: truncated FEXTRA length")
      val xlen = u8(p) | (u8(p + 1) << 8)
      p += 2 + xlen
      require(p <= bytes.length - 8, "gzip: FEXTRA overruns the member")
    }
    for (bit <- Seq(8, 16) if (flg & bit) != 0) { // FNAME, FCOMMENT
      while (p < bytes.length - 8 && bytes(p) != 0) p += 1
      require(p < bytes.length - 8,
        "gzip: unterminated zero-terminated header field")
      p += 1
    }
    if ((flg & 2) != 0) { // FHCRC
      p += 2
      require(p <= bytes.length - 8, "gzip: truncated FHCRC")
    }
    // raw deflate body; the trailer is whatever the inflater leaves
    val inf = new Inflater(true)
    inf.setInput(bytes, p, bytes.length - p)
    val buf = new Array[Byte](8192)
    val out = new ByteArrayOutputStream()
    try {
      while (!inf.finished()) {
        val k = inf.inflate(buf)
        if (k > 0) out.write(buf, 0, k)
        else require(inf.finished(), "gzip: truncated deflate stream")
      }
    } catch {
      case e: DataFormatException =>
        inf.end()
        throw new IllegalArgumentException(
          s"gzip: corrupt deflate body: ${e.getMessage}")
    }
    val rem = inf.getRemaining
    val deflateLen = (bytes.length - p) - rem
    inf.end()
    require(rem == 8,
      s"gzip: expected exactly the 8 trailer bytes after deflate, found $rem")
    val data = out.toByteArray
    val tOff = bytes.length - 8
    val crc = new CRC32(); crc.update(data)
    require(crc.getValue == le32(tOff),
      f"gzip: CRC32 mismatch (computed ${crc.getValue}%08x, stored ${le32(tOff)}%08x)")
    require((data.length.toLong & 0xffffffffL) == le32(tOff + 4),
      s"gzip: ISIZE mismatch (payload ${data.length}, stored ${le32(tOff + 4)})")
    Member(data, mtime, os, deflateLen)
  }
}
