package graft.ingest

/** Core data model of the ingestion engine — the Spark re-expression of
  * the reference's case classes (`FileMetaData.scala:6-16`,
  * `FtpMonitor.scala:16-25` in /root/reference). Instants are carried as
  * epoch-millis Longs: they serialize exactly, compare cheaply, and match
  * the reference's own persisted representation
  * (`ConnectFileMetaDataStore.scala:62-66`).
  *
  * All types are case classes with Spark `Encoder`s derivable from
  * `spark.implicits._`, so the typed Dataset operators (tail-diff state
  * function) stay codegen-friendly.
  */

/** What a listing reveals without downloading (`FileMetaData.scala:6-8`). */
final case class FileAttributes(path: String, size: Long, timestamp: Long)

/** Persisted per-file state — the engine's only "table"
  * (`FileMetaData.scala:12-16`). `offset` is late-added in the reference
  * with default -1 and a lenient decoder; we keep the default for state
  * compatibility across versions.
  */
final case class FileMetaData(
    path: String,
    size: Long,
    timestamp: Long,
    hash: String,
    firstFetched: Long,
    lastModified: Long,
    lastInspected: Long,
    offset: Long = -1L) {
  def attribs: FileAttributes = FileAttributes(path, size, timestamp)
  def modifiedAt(now: Long): FileMetaData = copy(lastModified = now)
  def inspectedAt(now: Long): FileMetaData = copy(lastInspected = now)
}

/** A fully downloaded file (`FtpMonitor.scala:16`). */
final case class FetchedFile(path: String, size: Long, timestamp: Long, body: Array[Byte])

/** The (possibly partial) payload to emit (`FtpMonitor.scala:24-25`). */
final case class FileBody(bytes: Array[Byte], offset: Long)
object FileBody {
  val empty: FileBody = FileBody(Array.emptyByteArray, 0L)
}

/** A monitored source spec: glob + mode + destination topic
  * (`FtpMonitor.scala:19-21` + `FtpSourceConfig.scala:10`). A path ending
  * in a slash implies a trailing `*` glob.
  */
final case class MonitoredPath(path: String, tail: Boolean, topic: String) {
  def glob: String = GlobPath.normalize(path)
}

/** One emitted change record — the Spark row behind both key styles
  * (`SimpleFileConverter.scala:43-66`): `path` is the string key, (path,
  * offset) the struct key, `value` the raw (delta) bytes.
  */
final case class FileChangeRecord(
    topic: String,
    path: String,
    offset: Long,
    value: Array[Byte])
