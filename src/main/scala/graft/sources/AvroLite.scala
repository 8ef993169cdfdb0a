package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

/** Minimal real Avro object-container codec — pure Scala, zero
  * dependencies, written from the public Apache Avro 1.x specification.
  *
  * The codec ladder so far covers images ([[graft.operators.Bmp]],
  * [[graft.operators.Png]], [[graft.operators.Gif]],
  * [[graft.operators.BmpRle]]) and audio ([[graft.operators.Wav]]);
  * this adds the tier a DATA pipeline actually moves rows in — a
  * binary ROW format: zigzag-varint longs, length-prefixed UTF-8
  * strings, an embedded JSON schema in the header metadata map,
  * 16-byte sync markers, and multi-record block framing
  * (count, byte size, payload, sync). Every structural claim is
  * validated on decode — a count lie, a size lie, a flipped sync, or
  * trailing bytes fail loudly, never shift records.
  *
  * The subset: schema = record{long doc_id, string text}, codec =
  * null (uncompressed blocks — the compression tiers are priced by
  * the other codecs). The reference treats payloads as opaque bytes
  * (`/root/reference/src/main/scala/com/eneco/trading/kafka/connect/ftp/source/SimpleFileConverter.scala:50-51`);
  * this is the row-decode step a corpus-ingest pipeline bolts onto it.
  */
object AvroLite {

  final case class Doc(docId: Long, text: String)

  val SchemaJson: String =
    """{"type":"record","name":"Document","fields":[""" +
      """{"name":"doc_id","type":"long"},{"name":"text","type":"string"}]}"""

  private val Magic: Array[Byte] =
    Array('O'.toByte, 'b'.toByte, 'j'.toByte, 1.toByte)

  /** Records per block — small so real corpora produce MULTI-block
    * containers and the per-block sync check is genuinely exercised. */
  private val BlockRecords = 10

  // ── zigzag varint (the Avro long encoding) ──

  private[sources] def writeLong(out: mutable.ArrayBuilder[Byte], v: Long): Unit = {
    var z = (v << 1) ^ (v >> 63) // zigzag
    while ((z & ~0x7fL) != 0L) {
      out += ((z & 0x7f) | 0x80).toByte
      z >>>= 7
    }
    out += z.toByte
  }

  private final class Reader(bytes: Array[Byte]) {
    var pos = 0
    def u8(): Int = {
      require(pos < bytes.length, "avro: truncated varint")
      val b = bytes(pos) & 0xff; pos += 1; b
    }
    def readLong(): Long = {
      var z = 0L
      var shift = 0
      var b = 0
      do {
        require(shift < 64, "avro: varint longer than 10 bytes")
        b = u8()
        z |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      (z >>> 1) ^ -(z & 1L) // un-zigzag
    }
    def readBytes(n: Long): Array[Byte] = {
      require(n >= 0 && pos + n <= bytes.length,
        s"avro: $n-byte item overruns the container")
      val out = java.util.Arrays.copyOfRange(bytes, pos, pos + n.toInt)
      pos += n.toInt
      out
    }
    def readString(): String = new String(readBytes(readLong()), UTF_8)
  }

  private def writeString(out: mutable.ArrayBuilder[Byte], s: String): Unit = {
    val b = s.getBytes(UTF_8)
    writeLong(out, b.length.toLong)
    out ++= b
  }

  /** Deterministic 16-byte sync marker derived from a seed — the spec
    * requires a per-file marker, not a particular randomness source. */
  private def syncOf(seed: Long): Array[Byte] =
    Array.tabulate(16) { i =>
      var z = seed + 0x9E3779B97F4A7C15L * (i + 1)
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      ((z ^ (z >>> 27)) & 0xff).toByte
    }

  /** Encode docs as one Avro object-container file (null codec). */
  def encode(docs: Seq[Doc], syncSeed: Long = 42L): Array[Byte] = {
    val out = mutable.ArrayBuilder.make[Byte]
    out ++= Magic
    // header metadata map: one block of 2 entries, then end-of-map 0
    writeLong(out, 2L)
    writeString(out, "avro.schema"); writeString(out, SchemaJson)
    writeString(out, "avro.codec"); writeString(out, "null")
    writeLong(out, 0L)
    val sync = syncOf(syncSeed)
    out ++= sync
    docs.grouped(BlockRecords).foreach { block =>
      val body = mutable.ArrayBuilder.make[Byte]
      block.foreach { d =>
        writeLong(body, d.docId)
        writeString(body, d.text)
      }
      val b = body.result()
      writeLong(out, block.size.toLong)
      writeLong(out, b.length.toLong)
      out ++= b
      out ++= sync
    }
    out.result()
  }

  /** Parse an Avro object container written in this subset. Strict:
    * magic, schema, codec, every block's count/size/sync, and the
    * exact end of file are all validated. */
  def decode(bytes: Array[Byte]): Seq[Doc] = {
    require(bytes.length >= 4 + 1 + 16, "avro: too short for a container")
    require((0 until 4).forall(i => bytes(i) == Magic(i)),
      "avro: bad magic (Obj\\x01 expected)")
    val r = new Reader(bytes)
    r.pos = 4
    // metadata map: repeated (count, entries) blocks until count 0;
    // a negative count is followed by a byte size (spec) — rejected
    // here as outside the strict subset our writer emits
    var schema: String = null
    var codec: String = null
    var n = r.readLong()
    while (n != 0L) {
      require(n > 0, "avro: negative metadata block count unsupported")
      var i = 0L
      while (i < n) {
        val k = r.readString()
        val v = r.readString()
        k match {
          case "avro.schema" => schema = v
          case "avro.codec" => codec = v
          case _ => () // other metadata is legal and ignored
        }
        i += 1
      }
      n = r.readLong()
    }
    require(schema == SchemaJson,
      s"avro: schema mismatch — expected the Document record, got $schema")
    // the general spec treats a missing avro.codec as null; THIS
    // subset's writer always emits it, so absence means a corrupted
    // metadata key and is rejected rather than silently tolerated
    require(codec == "null",
      s"avro: codec '$codec' unsupported (explicit null only)")
    val sync = r.readBytes(16L)
    val out = mutable.ArrayBuffer.empty[Doc]
    while (r.pos < bytes.length) {
      val cnt = r.readLong()
      require(cnt > 0, s"avro: non-positive block count $cnt")
      val size = r.readLong()
      val end = r.pos + size
      require(size >= 0 && end <= bytes.length,
        s"avro: block size $size overruns the container")
      var i = 0L
      while (i < cnt) {
        val id = r.readLong()
        val text = r.readString()
        out += Doc(id, text)
        i += 1
      }
      require(r.pos == end,
        s"avro: block declared $size bytes but records used ${r.pos - (end - size)}")
      val s2 = r.readBytes(16L)
      require(java.util.Arrays.equals(sync, s2),
        "avro: sync marker mismatch after block")
    }
    out.toSeq
  }
}
