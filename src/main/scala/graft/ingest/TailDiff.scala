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

  /** [[handleFetchedFile]] for bodies that must NOT be materialized —
    * the >2 GiB append-log case a 100 TB corpus actually has. Same
    * six-case semantics, re-derived over a re-openable byte source:
    *
    *  - pass 1 streams the content once through TWO digests (the full
    *    hash for the state row, and the known-prefix hash for the
    *    append check), counting actual bytes;
    *  - pass 2 re-reads ONLY the range being emitted (the appended
    *    delta, or the whole body on fallback).
    *
    * Nothing but the emitted record is ever in memory, so the JVM
    * array bound applies exactly where it is intrinsic: the record
    * itself. A clean tail-append of any size file works as long as
    * the DELTA fits an array; the loud failure is reserved for a
    * full-dump of a >2 GiB body, which no in-memory record model can
    * represent (the reference's model has the same bound and silently
    * corrupts instead, Int-casting at FtpMonitor.scala:77,80).
    *
    * `open` must yield a fresh stream per call (both passes). A file
    * mutating between the passes can pair pass-1 state with pass-2
    * bytes — the same list/fetch race posture as the poll itself: the
    * next poll re-detects and repairs. */
  def handleFetchedStream(
      tail: Boolean,
      prev: Option[FileMetaData],
      path: String,
      listedSize: Long,
      timestamp: Long,
      open: () => java.io.InputStream,
      now: Long): (FileMetaData, FileBody) = {
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
    val meta = prev match {
      case None => FileMetaData(path, listedSize, timestamp, fullHash, now, now, now)
      case Some(old) => FileMetaData(path, listedSize, timestamp, fullHash,
        old.firstFetched, old.lastModified, now)
    }
    def readRange(from: Long, until: Long): Array[Byte] = {
      val len = until - from
      require(len <= Int.MaxValue,
        s"emitted record exceeds the JVM array bound ($len bytes): $path")
      val out = new Array[Byte](len.toInt)
      val in = open()
      try {
        var skipped = 0L
        while (skipped < from) {
          val s = in.skip(from - skipped)
          if (s <= 0) throw new java.io.EOFException(
            s"source ended at $skipped while skipping to $from: $path")
          skipped += s
        }
        var off = 0
        while (off < out.length) {
          val n = in.read(out, off, out.length - off)
          if (n < 0) throw new java.io.EOFException(
            s"source ended at ${from + off} reading to $until: $path")
          off += n
        }
        out
      } finally in.close()
    }
    prev match {
      case Some(p) if p.size != meta.size || p.hash != meta.hash =>
        if (tail) {
          if (meta.size > p.size) {
            if (actualLen >= p.size && p.hash == prefixHash) { // (a)
              (meta.modifiedAt(now), FileBody(readRange(p.size, actualLen), p.size))
            } else { // (b) prefix changed / (b') truncated mid-read
              (meta.modifiedAt(now), FileBody(readRange(0L, actualLen), 0))
            }
          } else { // (c) shrunk (or same size, different hash)
            (meta.modifiedAt(now), FileBody.empty)
          }
        } else { // (d) update mode
          (meta.modifiedAt(now), FileBody(readRange(0L, actualLen), 0))
        }
      case Some(_) => // (e) content identical
        (meta, FileBody.empty)
      case None => // (f) new file
        (meta.modifiedAt(now), FileBody(readRange(0L, actualLen), 0))
    }
  }
}
