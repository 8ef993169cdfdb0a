package graft.operators

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.US_ASCII

/** From-scratch POSIX ustar (tar) archive codec — pure Scala, zero
  * deps.
  *
  * The MULTI-FILE container tier the codec family lacked: gzip wraps
  * one stream, Avro one schema'd table — but the multimodal-training
  * world ships sample BUNDLES as `.tar` shards (the WebDataset
  * convention: `000123.jpg` + `000123.txt` + `000123.json` side by
  * side, sequential reads, no random access needed). The format is
  * fixed 512-byte blocks and OCTAL-ASCII header fields, so every
  * byte the writer emits and every length the reader derives is pure
  * integer arithmetic a DuckDB oracle can price: member overhead =
  * 512 (header) + payload rounded up to 512, archive tail = two zero
  * blocks.
  *
  *  - [[encode]] writes ustar headers (name, 0644 mode, size/mtime in
  *    octal, the 8-space-seeded checksum, typeflag '0', magic
  *    "ustar\u0000" "00") — byte-deterministic given (name, bytes,
  *    mtime).
  *  - [[decode]] walks the blocks: validates the magic, RECOMPUTES
  *    the header checksum (the field every tar implementation uses to
  *    detect desync — a shifted or corrupted header fails loudly
  *    here), parses octal sizes, strips padding, and demands the
  *    two-zero-block terminator. Every structural lie is a `require`.
  *
  * The reference's data model treats payloads as opaque bytes
  * (`/root/reference/src/main/scala/com/eneco/trading/kafka/connect/ftp/source/SimpleFileConverter.scala:50-51`);
  * this codec is the bundle-unpacking step a multimodal ingest bolts
  * onto that model.
  */
object Tar {

  final case class Entry(name: String, mtime: Long, data: Array[Byte])

  private val Block = 512

  /** Archive length [[encode]] produces for payload sizes `ns` —
    * the oracle's arithmetic twin: per member a header block plus
    * ceil(n/512) data blocks, plus the two terminator blocks. */
  def encodedLength(ns: Seq[Int]): Long =
    ns.map(n => Block.toLong + ((n + Block - 1) / Block).toLong * Block)
      .sum + 2L * Block

  private def octal(v: Long, width: Int): Array[Byte] = {
    // POSIX numeric field: zero-padded octal, NUL terminator
    val s = java.lang.Long.toOctalString(v)
    require(s.length < width, s"tar: value $v overflows a $width field")
    (("0" * (width - 1 - s.length)) + s + "\u0000").getBytes(US_ASCII)
  }

  private def headerFor(e: Entry): Array[Byte] = {
    val h = new Array[Byte](Block)
    val name = e.name.getBytes(US_ASCII)
    require(name.length > 0 && name.length <= 100,
      s"tar: name '${e.name}' must be 1..100 bytes")
    System.arraycopy(name, 0, h, 0, name.length)
    System.arraycopy(octal(420L, 8), 0, h, 100, 8) // mode 0644
    System.arraycopy(octal(0L, 8), 0, h, 108, 8) // uid
    System.arraycopy(octal(0L, 8), 0, h, 116, 8) // gid
    System.arraycopy(octal(e.data.length.toLong, 12), 0, h, 124, 12)
    System.arraycopy(octal(e.mtime, 12), 0, h, 136, 12)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // checksum seed
    h(156) = '0' // typeflag: regular file
    System.arraycopy("ustar\u000000".getBytes(US_ASCII), 0, h, 257, 8)
    val sum = h.map(_ & 0xff).sum.toLong
    // checksum field: 6 octal digits, NUL, space
    val cs = java.lang.Long.toOctalString(sum)
    val padded = ("0" * (6 - cs.length)) + cs
    System.arraycopy((padded + "\u0000 ").getBytes(US_ASCII), 0, h, 148, 8)
    h
  }

  /** Bytes one member occupies in the archive: header block + payload
    * rounded up to the block size. `encodedLength(ns) = Σ memberLength
    * + 2·Block`; shard binning prices bundles with this so the on-disk
    * shard size is exactly Σ memberLength + terminator. */
  def memberLength(n: Int): Long =
    Block.toLong + ((n + Block - 1) / Block).toLong * Block

  /** Stream one member to an open sink: header, payload, padding.
    * Heap use is the member's own bytes — the shard writer calls this
    * per member against an open FS stream, so a shard's total size
    * never materializes in memory (the whole-archive `encode` is for
    * small in-query archives and tests). */
  def writeEntry(os: java.io.OutputStream, e: Entry): Unit = {
    os.write(headerFor(e))
    os.write(e.data)
    val pad = (Block - e.data.length % Block) % Block
    if (pad > 0) os.write(new Array[Byte](pad))
  }

  /** The two-zero-block archive terminator [[decode]] demands. */
  def writeTerminator(os: java.io.OutputStream): Unit =
    os.write(new Array[Byte](2 * Block))

  /** Streaming [[decode]]: members pulled ONE at a time from an open
    * stream — heap holds one member, never the shard (the read-side
    * twin of [[writeEntry]]; the whole-array `decode` remains for
    * small in-query archives and the fuzz gates). Same structural
    * validations, same loud failures: bad magic, checksum mismatch,
    * unsupported typeflag, and a single zero block without its twin
    * all throw; a truncated stream fails with EOF inside readFully.
    * The iterator ends after the two-zero-block terminator, which it
    * demands. The caller owns (and closes) the stream. */
  def entries(in: java.io.InputStream): Iterator[Entry] =
    new Iterator[Entry] {
      private val din = new java.io.DataInputStream(in)
      private var pendingE: Entry = null
      private var done = false
      private def readBlock(): Array[Byte] = {
        val b = new Array[Byte](Block); din.readFully(b); b
      }
      private def parseOctal(h: Array[Byte], off: Int, width: Int,
          what: String): Long = {
        var v = 0L
        var i = off
        val end = off + width
        while (i < end && (h(i) == ' ' || h(i) == '0')) i += 1
        while (i < end && h(i) != 0 && h(i) != ' ') {
          require(h(i) >= '0' && h(i) <= '7',
            s"tar: non-octal byte in $what")
          v = v * 8 + (h(i) - '0'); i += 1
        }
        v
      }
      private def advance(): Unit = if (!done && pendingE == null) {
        val h = readBlock()
        if (h.forall(_ == 0)) {
          require(readBlock().forall(_ == 0),
            "tar: single zero block is not a valid terminator")
          done = true
        } else {
          val magic = new String(h, 257, 5, US_ASCII)
          require(magic == "ustar", s"tar: bad magic '$magic'")
          var sum = 0L
          var i = 0
          while (i < Block) {
            sum += (if (i >= 148 && i < 156) ' '.toInt else (h(i) & 0xff))
            i += 1
          }
          val stored = parseOctal(h, 148, 8, "checksum")
          require(sum == stored,
            s"tar: header checksum mismatch (computed $sum, stored $stored)")
          val nameEnd = (0 until 100).find(h(_) == 0).getOrElse(100)
          val name = new String(h, 0, nameEnd, US_ASCII)
          val size = parseOctal(h, 124, 12, "size")
          val mtime = parseOctal(h, 136, 12, "mtime")
          require(h(156) == '0' || h(156) == 0,
            s"tar: unsupported typeflag '${h(156).toChar}'")
          // the 12-wide octal field permits sizes past Int range; a
          // negative or JVM-array-overflowing size must fail HERE —
          // size.toInt truncation would either throw an obscure
          // NegativeArraySizeException or silently under-read and
          // desync the stream (the array decode bounds this against
          // the archive length; the stream has no length to check)
          require(size >= 0 && size <= Int.MaxValue - 2L * Block,
            s"tar: member '$name' size $size out of supported range")
          val data = new Array[Byte](size.toInt)
          din.readFully(data)
          val pad = ((Block - size % Block) % Block).toInt
          if (pad > 0) din.readFully(new Array[Byte](pad))
          pendingE = Entry(name, mtime, data)
        }
      }
      def hasNext: Boolean = { advance(); pendingE != null }
      def next(): Entry = {
        advance()
        require(pendingE != null, "tar: next() past the terminator")
        val e = pendingE; pendingE = null; e
      }
    }

  def encode(entries: Seq[Entry]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    entries.foreach(writeEntry(out, _))
    writeTerminator(out)
    out.toByteArray
  }

  def decode(bytes: Array[Byte]): Seq[Entry] = {
    require(bytes.length % Block == 0,
      s"tar: ${bytes.length} bytes is not block-aligned")
    require(bytes.length >= 2 * Block, "tar: shorter than the terminator")
    def u8(i: Int) = bytes(i) & 0xff
    def zeroBlock(off: Int): Boolean =
      (off until off + Block).forall(bytes(_) == 0)
    def parseOctal(off: Int, width: Int, what: String): Long = {
      var v = 0L
      var i = off
      val end = off + width
      while (i < end && (bytes(i) == ' ' || bytes(i) == '0')) i += 1
      while (i < end && bytes(i) != 0 && bytes(i) != ' ') {
        require(bytes(i) >= '0' && bytes(i) <= '7',
          s"tar: non-octal byte in $what at offset $i")
        v = v * 8 + (bytes(i) - '0'); i += 1
      }
      v
    }
    val out = Seq.newBuilder[Entry]
    var p = 0
    var terminated = false
    while (!terminated) {
      require(p + Block <= bytes.length, "tar: truncated before terminator")
      if (zeroBlock(p)) {
        require(p + 2 * Block <= bytes.length && zeroBlock(p + Block),
          "tar: single zero block is not a valid terminator")
        terminated = true
      } else {
        val magic = new String(bytes, p + 257, 5, US_ASCII)
        require(magic == "ustar", s"tar: bad magic '$magic' at offset $p")
        // recompute the checksum with the field itself read as spaces
        var sum = 0L
        for (i <- 0 until Block)
          sum += (if (i >= 148 && i < 156) ' '.toInt else u8(p + i))
        val stored = parseOctal(p + 148, 8, "checksum")
        require(sum == stored,
          s"tar: header checksum mismatch at offset $p " +
            s"(computed $sum, stored $stored)")
        val nameEnd = (p until p + 100).find(bytes(_) == 0)
          .getOrElse(p + 100)
        val name = new String(bytes, p, nameEnd - p, US_ASCII)
        val size = parseOctal(p + 124, 12, "size")
        val mtime = parseOctal(p + 136, 12, "mtime")
        require(bytes(p + 156) == '0' || bytes(p + 156) == 0,
          s"tar: unsupported typeflag '${bytes(p + 156).toChar}'")
        val dataOff = p + Block
        require(dataOff + size <= bytes.length,
          s"tar: member '$name' overruns the archive")
        val data = java.util.Arrays.copyOfRange(
          bytes, dataOff, dataOff + size.toInt)
        out += Entry(name, mtime, data)
        p = dataOff + (((size + Block - 1) / Block) * Block).toInt
      }
    }
    out.result()
  }
}
