package graft.ingest

import java.security.MessageDigest

/** The engine's core nontrivial operator: stateful change/delta
  * extraction — the Spark-side re-expression of the reference's
  * `handleFetchedFile` (`FtpMonitor.scala:70-105`) and `requiresFetch`
  * (`FtpMonitor.scala:35-46`). Pure functions: all effects (state
  * persistence, emission) live in the caller, which makes the six-case
  * semantics property-testable and usable from both the batch poll loop
  * and `flatMapGroupsWithState`.
  *
  * Unlike the reference we slice with Long-checked bounds (the reference
  * casts sizes to Int at `FtpMonitor.scala:77,80`, silently corrupting
  * >2 GiB files; see SURVEY.md §7.4).
  */
object TailDiff {

  def sha256Hex(bytes: Array[Byte], len: Int = -1): String = {
    val md = MessageDigest.getInstance("SHA-256")
    md.update(bytes, 0, if (len < 0) bytes.length else len)
    md.digest().map("%02x".format(_)).mkString
  }

  /** Fetch iff unseen, or size changed, or mtime changed. */
  def requiresFetch(current: FileAttributes, prev: Option[FileMetaData]): Boolean =
    prev match {
      case None => true
      case Some(known) if known.size != current.size => true
      case Some(known) if known.timestamp != current.timestamp => true
      case _ => false
    }

  /** Build the post-fetch metadata, preserving `firstFetched` across
    * fetches (`FtpMonitor.scala:49-67`). */
  def metaAfterFetch(cur: FetchedFile, prev: Option[FileMetaData], now: Long): FileMetaData = {
    val hash = sha256Hex(cur.body)
    prev match {
      case None => FileMetaData(cur.path, cur.size, cur.timestamp, hash, now, now, now)
      case Some(old) =>
        FileMetaData(cur.path, cur.size, cur.timestamp, hash,
          old.firstFetched, old.lastModified, now)
    }
  }

  /** The six cases of `handleFetchedFile`:
    *  (a) tail, grew, prefix hash matches  → appended slice, offset = prev size
    *  (b) tail, grew, prefix changed       → whole body, offset 0 (fallback)
    *  (c) tail, shrunk or same size        → empty body
    *  (d) update mode, content changed     → whole body, offset 0
    *  (e) unchanged (size+hash equal)      → empty body, touch lastInspected only
    *  (f) new file                         → whole body, offset 0
    *
    * Returns the new state and the body to emit. Like the reference, a
    * record is produced for every handled fetch — empty bodies included;
    * sinks may filter them.
    */
  def handleFetchedFile(
      tail: Boolean,
      prev: Option[FileMetaData],
      cur: FetchedFile,
      now: Long): (FileMetaData, FileBody) = {
    val meta = metaAfterFetch(cur, prev, now)
    prev match {
      // a state row self-invalidated by a truncated STREAMING emission
      // (see [[ChunkedEmission]]) matches nothing: full re-dump, even
      // when the file shrank to (or below) the previously emitted
      // length — case (c) would otherwise skip the never-delivered base
      case Some(p) if p.hash.startsWith(TruncatedMarkerPrefix) =>
        (meta.modifiedAt(now), FileBody(cur.body, 0))
      case Some(p) if p.size != meta.size || p.hash != meta.hash =>
        if (tail) {
          if (meta.size > p.size) {
            // a known prefix larger than any JVM array can never match
            // an in-hand array body — that IS the truncated case (b')
            // below, not a crash ([[handleFetchedStream]] is the path
            // that verifies >2 GiB prefixes without materializing them)
            if (p.size <= Int.MaxValue && cur.body.length >= p.size.toInt) {
              val prefixHash = sha256Hex(cur.body, p.size.toInt)
              if (p.hash == prefixHash) { // (a) clean append
                val delta = java.util.Arrays.copyOfRange(cur.body, p.size.toInt, cur.body.length)
                (meta.modifiedAt(now), FileBody(delta, p.size))
              } else { // (b) previously-seen content changed: fall back to full
                (meta.modifiedAt(now), FileBody(cur.body, 0))
              }
            } else {
              // listed size grew but the in-hand body is shorter than
              // the known prefix (truncated between list and read):
              // the prefix cannot be verified — (b)-style full dump of
              // what was actually read, never a crash of the poll batch
              (meta.modifiedAt(now), FileBody(cur.body, 0))
            }
          } else { // (c) shrunk (or same size, different hash) while tailing
            (meta.modifiedAt(now), FileBody.empty)
          }
        } else { // (d) update mode: dump the whole file on any change
          (meta.modifiedAt(now), FileBody(cur.body, 0))
        }
      case Some(_) => // (e) refetched (mtime changed) but content identical
        (meta, FileBody.empty)
      case None => // (f) new file
        (meta.modifiedAt(now), FileBody(cur.body, 0))
    }
  }

  /** Chunked sha-256 of the first `len` bytes of `in` (the stream is
    * NOT closed). Returns (hex digest, bytes actually digested) — the
    * count is short when the stream ends early. No length cap: this is
    * how a >2 GiB known prefix is verified without materializing it. */
  def sha256HexPrefixStream(in: java.io.InputStream, len: Long): (String, Long) = {
    val md = MessageDigest.getInstance("SHA-256")
    val buf = new Array[Byte](64 * 1024)
    var remaining = len
    var done = false
    while (remaining > 0 && !done) {
      val want = math.min(remaining, buf.length.toLong).toInt
      val n = in.read(buf, 0, want)
      if (n < 0) done = true
      else { md.update(buf, 0, n); remaining -= n }
    }
    (md.digest().map("%02x".format(_)).mkString, len - remaining)
  }

  /** Default per-record byte cap for [[handleFetchedStreamChunked]]:
    * large enough that normal deltas stay one record, small enough that
    * a task never holds more than one modest chunk in memory. */
  val DefaultMaxRecordBytes: Int = 64 << 20

  /** Read up to `want` bytes at byte `pos` from a fresh stream —
    * TOLERANT: a source that ends early (truncated between the digest
    * pass and this read) or vanishes (deleted) yields the bytes that
    * were actually readable, possibly none, never an exception. The
    * missing-tail inconsistency is repaired by the next poll (size/
    * mtime change re-detects), the same race posture as list/fetch. */
  private def readUpTo(
      open: () => java.io.InputStream,
      pos: Long,
      want: Int): Array[Byte] =
    try {
      val in = open()
      try {
        var skipped = 0L
        var eof = false
        while (skipped < pos && !eof) {
          val s = in.skip(pos - skipped)
          if (s <= 0) {
            // skip() may return 0 without EOF; disambiguate with a read
            if (in.read() < 0) eof = true else skipped += 1
          } else skipped += s
        }
        if (eof) Array.emptyByteArray
        else {
          val out = new java.io.ByteArrayOutputStream(math.min(want, 1 << 20))
          val buf = new Array[Byte](64 * 1024)
          var remaining = want
          var done = false
          while (remaining > 0 && !done) {
            val n = in.read(buf, 0, math.min(remaining, buf.length))
            if (n < 0) done = true
            else { out.write(buf, 0, n); remaining -= n }
          }
          out.toByteArray
        }
      } finally in.close()
    } catch {
      // a Spark task kill must still kill the task (an interrupt on an
      // NIO-channel-backed stream surfaces as ClosedByInterrupt, which
      // is an IOException but NOT an InterruptedIOException)
      case e: java.io.InterruptedIOException => throw e
      case e: java.nio.channels.ClosedByInterruptException => throw e
      // vanished or unreadable between the digest pass and this read:
      // treated as truncation-at-pos — the caller's finalMeta
      // self-invalidates the state row so the next poll re-fetches
      case _: java.io.IOException => Array.emptyByteArray
    }

  /** Lazy chunked emission of byte range [from, until): one
    * [[FileBody]] of at most `maxChunk` bytes per pull, offsets
    * advancing like the LineSplit converter's. Guarantees at least one
    * record (empty-body) even when the range is empty or the source
    * vanished — every handled fetch produces a record. A short read
    * (the source truncated or deleted between the digest pass and this
    * one) ends the iteration after its (short) record and raises the
    * `truncated` flag, which [[ChunkedEmission.finalMeta]] turns into a
    * self-invalidating state row. */
  private[ingest] final class RangeChunks(
      open: () => java.io.InputStream,
      from: Long,
      until: Long,
      maxChunk: Int) extends Iterator[FileBody] {
    private var pos = from
    private var emitted = 0
    private var finished = false
    private var pending: FileBody = _
    /** True once a read came up short of the digested range. */
    private[ingest] var truncated = false
    /** Position after the last byte actually emitted. */
    private[ingest] def endPos: Long = pos
    private def advance(): Unit = {
      if (pending != null || finished) return
      if (pos >= until) {
        if (emitted == 0) { pending = FileBody.empty; return }
        finished = true; return
      }
      val want = math.min(until - pos, maxChunk.toLong).toInt
      val got = readUpTo(open, pos, want)
      if (got.length == 0) {
        // source truncated/vanished at pos: stop, keeping the
        // record-per-fetch guarantee. `finished` is set even when the
        // guarantee record is still pending — otherwise the next
        // hasNext would re-open and re-read the source, and a
        // reappeared file would emit extra chunks under a permanently
        // raised `truncated` flag.
        truncated = true
        finished = true
        if (emitted == 0) pending = FileBody.empty
      } else {
        pending = FileBody(got, pos)
        pos += got.length
        if (got.length < want) {
          // readUpTo only returns short on EOF: the source ended early —
          // finish after this chunk without another probe read
          truncated = true
          finished = true
        }
      }
    }
    override def hasNext: Boolean = { advance(); pending != null }
    override def next(): FileBody = {
      advance()
      if (pending == null) throw new NoSuchElementException("RangeChunks")
      val out = pending
      pending = null
      emitted += 1
      out
    }
  }

  /** Prefix of the self-invalidating state-row hash written when an
    * emission was truncated (see [[ChunkedEmission]]). Both tail/diff
    * faces treat a previous hash with this prefix as never-matchable:
    * the whole current content full-dumps, whatever the sizes say. */
  private[ingest] val TruncatedMarkerPrefix = "!truncated@"

  /** A chunked tail/diff emission. `chunks` must be drained before
    * `finalMeta()` is read: on a clean emission it returns the digest
    * pass's metadata, but when the source was truncated or deleted
    * between the two passes it returns a SELF-INVALIDATING state row
    * (size = bytes whose emission is certain, hash = a
    * [[TruncatedMarkerPrefix]] marker no sha-256 hex can equal), so
    * the next poll's handlers full-dump unconditionally — the
    * undelivered suffix is re-delivered instead of silently skipped,
    * preserving at-least-once even if the file returns to
    * byte-identical pass-1 content or shrinks to the emitted length.
    * `rangeLen` is the emission range's width in bytes (0 for the
    * empty-body cases) — the single-record face checks it BEFORE
    * reading anything. */
  final case class ChunkedEmission(
      initialMeta: FileMetaData,
      chunks: Iterator[FileBody],
      finalMeta: () => FileMetaData,
      rangeLen: Long)

  /** [[handleFetchedFile]] for bodies that must NOT be materialized —
    * the >2 GiB append-log case a 100 TB corpus actually has. Same
    * six-case semantics, re-derived over a re-openable byte source:
    *
    *  - pass 1 streams the content once through TWO digests (the full
    *    hash for the state row, and the known-prefix hash for the
    *    append check), counting actual bytes;
    *  - pass 2 re-reads ONLY the range being emitted (the appended
    *    delta, or the whole body on fallback), LAZILY in chunks of at
    *    most `maxRecordBytes` with advancing offsets — a 10 GiB append
    *    emits N bounded records instead of failing on the JVM array
    *    bound, and only one chunk is in memory at a time.
    *
    * The state row records the byte count ACTUALLY digested
    * (`actualLen`), not the listed size, so size and hash always
    * describe the same bytes even when the file grows or shrinks
    * during pass 1 — a listed-size row with a different-content hash
    * would never prefix-match again and every subsequent poll would
    * full-dump.
    *
    * Truncation between the passes degrades to emitting the bytes
    * actually readable (short final record), and a source deleted
    * between the passes ends the emission — never an exception from a
    * mid-batch race; `finalMeta()` then self-invalidates the state row
    * so the next poll re-fetches and full-dumps (see
    * [[ChunkedEmission]]). Pass-1 failures (file deleted before the
    * digest read) DO propagate: the caller decides whether a missing
    * file skips the row.
    *
    * `open` must yield a fresh stream per call. */
  def handleFetchedStreamChunked(
      tail: Boolean,
      prev: Option[FileMetaData],
      path: String,
      timestamp: Long,
      open: () => java.io.InputStream,
      now: Long,
      maxRecordBytes: Int = DefaultMaxRecordBytes): ChunkedEmission = {
    require(maxRecordBytes > 0, "maxRecordBytes must be positive")
    val prefixLen = prev.map(_.size).getOrElse(0L)
    // pass 1: full + prefix digests in one read
    val fullMd = MessageDigest.getInstance("SHA-256")
    val prefixMd = MessageDigest.getInstance("SHA-256")
    var actualLen = 0L
    locally {
      val in = open()
      try {
        val buf = new Array[Byte](64 * 1024)
        var n = in.read(buf)
        while (n >= 0) {
          fullMd.update(buf, 0, n)
          if (actualLen < prefixLen) {
            val p = math.min(prefixLen - actualLen, n.toLong).toInt
            prefixMd.update(buf, 0, p)
          }
          actualLen += n
          n = in.read(buf)
        }
      } finally in.close()
    }
    val fullHash = fullMd.digest().map("%02x".format(_)).mkString
    val prefixHash = prefixMd.digest().map("%02x".format(_)).mkString
    // size = actualLen (the bytes the hash describes), NOT the listed
    // size: the two differ when the file mutates between list and read,
    // and a (listed-size, actual-content-hash) pair would never
    // prefix-match again — every later poll would full-dump
    val meta = prev match {
      case None => FileMetaData(path, actualLen, timestamp, fullHash, now, now, now)
      case Some(old) => FileMetaData(path, actualLen, timestamp, fullHash,
        old.firstFetched, old.lastModified, now)
    }
    def emission(m: FileMetaData, from: Long): ChunkedEmission = {
      val rc = new RangeChunks(open, from, actualLen, maxRecordBytes)
      ChunkedEmission(m, rc, () =>
        if (!rc.truncated) m
        else m.copy(size = rc.endPos,
          hash = s"$TruncatedMarkerPrefix${rc.endPos}"),
        actualLen - from)
    }
    def silent(m: FileMetaData): ChunkedEmission =
      ChunkedEmission(m, Iterator.single(FileBody.empty), () => m, 0L)
    prev match {
      // a self-invalidated state row matches nothing: full re-dump,
      // whatever the size comparison says — the bytes it covers were
      // never confirmed delivered (a shrink to exactly the emitted
      // length would otherwise slip through case (c) silently)
      case Some(p) if p.hash.startsWith(TruncatedMarkerPrefix) =>
        emission(meta.modifiedAt(now), 0L)
      case Some(p) if p.size != meta.size || p.hash != meta.hash =>
        if (tail) {
          if (meta.size > p.size) {
            if (actualLen >= p.size && p.hash == prefixHash) { // (a)
              emission(meta.modifiedAt(now), p.size)
            } else { // (b) prefix changed / (b') truncated mid-read
              emission(meta.modifiedAt(now), 0L)
            }
          } else { // (c) shrunk (or same size, different hash)
            silent(meta.modifiedAt(now))
          }
        } else { // (d) update mode
          emission(meta.modifiedAt(now), 0L)
        }
      case Some(_) => // (e) content identical
        silent(meta)
      case None => // (f) new file
        emission(meta.modifiedAt(now), 0L)
    }
  }

  /** Single-record face of [[handleFetchedStreamChunked]]: fails loudly
    * — BEFORE reading or allocating anything — if the emitted range
    * cannot fit one in-memory record; the bound is intrinsic to a
    * single-record model (the reference Int-casts and silently corrupts
    * instead, FtpMonitor.scala:77,80). Batch callers use the chunked
    * face, which has no such bound. */
  def handleFetchedStream(
      tail: Boolean,
      prev: Option[FileMetaData],
      path: String,
      timestamp: Long,
      open: () => java.io.InputStream,
      now: Long): (FileMetaData, FileBody) = {
    val em = handleFetchedStreamChunked(
      tail, prev, path, timestamp, open, now,
      maxRecordBytes = Int.MaxValue - 8)
    require(em.rangeLen <= Int.MaxValue - 8,
      s"emitted record exceeds the JVM array bound (${em.rangeLen} bytes): $path")
    val first = em.chunks.next()
    // rangeLen <= maxRecordBytes guarantees a single chunk
    em.chunks.foreach(_ => ())
    (em.finalMeta(), first)
  }
}
