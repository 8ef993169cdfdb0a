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
            require(p.size <= Int.MaxValue,
              s"tail slice beyond 2 GiB unsupported for in-memory bodies: ${cur.path}")
            if (cur.body.length >= p.size.toInt) {
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
}
