package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Directory-listing scan (SURVEY.md §2 #1-4): Spark's `binaryFile`
  * source replaces the reference's `FtpFileLister` (`FtpFileLister.scala:
  * 27-53`). The glob goes straight into the load path, where Catalyst's
  * `InMemoryFileIndex` performs the same directory-pruned descent the
  * reference hand-rolls (it never lists subtrees that can't match), but
  * parallelized across the cluster for large directory trees.
  *
  * Listing is metadata-only: `content` is not selected, and the
  * binaryFile source prunes the column, so no byte is downloaded before
  * the change-detection filter decides it must be (mirrors the
  * reference's list-before-fetch split, at executor scale).
  */
object Listing {

  /** binaryFile's fixed schema (needed explicitly for readStream). */
  val binaryFileSchema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("modificationTime", TimestampType),
    StructField("length", LongType),
    StructField("content", BinaryType)))

  /** Normalize a source-reported URI to a bare path — strips any scheme
    * and authority (`file:`, `hdfs://namenode`, `s3a://bucket` …) so it
    * joins against the `toUri.getPath` form the listing produces.
    * Shared with the streaming source so batch and streaming record
    * paths are identical for the same file. */
  private[graft] def stripScheme(c: org.apache.spark.sql.Column) =
    regexp_replace(c, "^[a-zA-Z][a-zA-Z0-9+.-]*:(//[^/]*)?", "")

  /** Escape Hadoop-glob metacharacters so a literal listed path is never
    * re-interpreted as a pattern by `load()` (a file named `data[1].csv`
    * must fetch itself, not glob-expand). */
  private def escapeGlob(path: String): String =
    path.replaceAll("([\\\\\\[\\]{}*?])", "\\\\$1")

  /** Metadata-only listing of one monitored glob:
    * (path, uri, size, timestamp-millis). `path` is the scheme-stripped
    * record identity (shared with the streaming pipeline); `uri` is the
    * fully-qualified form the FETCH must use — resolving the bare path
    * against the default FileSystem would silently read nothing for a
    * monitored dir on a non-default filesystem (s3a:// / hdfs:// source
    * on a cluster whose fs.defaultFS differs). Missing/empty matches →
    * empty frame (a monitored dir that doesn't exist yet is not an
    * error, same as an FTP dir that hasn't been created).
    *
    * Uses Hadoop `globStatus` — the same engine behind Catalyst's
    * `InMemoryFileIndex`, with identical glob semantics and pruned
    * directory descent — rather than a `binaryFile` scan, because
    * Spark's file sources plan zero splits for zero-length files, which
    * would make empty files invisible to change detection (the reference
    * emits a record for an emptying update, EndToEnd.scala:90-92). The
    * glob expansion runs where the reference's LIST ran (driver); for
    * huge trees, monitored globs fan out per-directory and this is
    * trivially parallelized over `dirs` before the union in Monitor.
    */
  def list(spark: SparkSession, mp: MonitoredPath): DataFrame = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(mp.glob)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val statuses = Option(fs.globStatus(p)).getOrElse(Array.empty)
    statuses.filter(_.isFile)
      .map(st => (st.getPath.toUri.getPath, st.getPath.toString,
        st.getLen, st.getModificationTime))
      .toSeq
      .toDF("path", "uri", "size", "timestamp")
  }

  /** Max-age cutoff on listing metadata (SURVEY.md §2 #4) — evaluated
    * before any content is read, like `FtpMonitor.scala:110`. */
  def filterMaxAge(listing: DataFrame, maxAgeMs: Option[Long], nowMs: Long): DataFrame =
    maxAgeMs match {
      case Some(ms) => listing.filter(col("timestamp") >= nowMs - ms)
      case None => listing
    }

  /** Content fetch for an explicit set of (uri, size, timestamp-ms)
    * listing rows — the bounded post-diff fetch list, addressed by the
    * QUALIFIED uri from [[list]] so files on non-default filesystems
    * resolve correctly (the emitted `path` column is scheme-stripped
    * back to the record identity). Non-empty files are read by the
    * executor-parallel `binaryFile` source; zero-length files (which
    * binaryFile cannot plan) are synthesized from the listing metadata
    * with an empty body — but only if they still exist, so a 0-byte
    * file deleted between list and fetch is not fabricated into the
    * records and state. Returns (path, size, timestamp, body). */
  def fetch(spark: SparkSession, files: Seq[(String, Long, Long)]): DataFrame = {
    import spark.implicits._
    val emptySchema = StructType(Seq(
      StructField("path", StringType),
      StructField("size", LongType),
      StructField("timestamp", LongType),
      StructField("body", BinaryType)))
    val (zeroLen, nonEmptyAll) = files.partition(_._2 == 0L)
    // tolerate files deleted between list and fetch (the reference's
    // poll has the same race and simply retries next cycle): a missing
    // path must not fail the whole batch and wedge the loop. Strategy
    // per PARENT DIRECTORY, chosen by how many of ITS files we fetch:
    // few → per-file exists() (bounded RPCs, no dependence on directory
    // size); many → one listStatus (one RPC amortized over the batch,
    // but O(directory size) on object stores — only worth it when the
    // fetch list itself is large). The FileSystem is resolved PER
    // DIRECTORY from the qualified uri, never from fs.defaultFS.
    val conf = spark.sparkContext.hadoopConfiguration
    val listThreshold = 16
    val byDir = (nonEmptyAll ++ zeroLen)
      .groupBy(f => new org.apache.hadoop.fs.Path(f._1).getParent)
    val existing: Set[String] = byDir.iterator.flatMap { case (dir, files) =>
      val fs = dir.getFileSystem(conf)
      if (files.size < listThreshold)
        files.iterator.map(_._1)
          .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p)))
      else {
        val listed =
          try fs.listStatus(dir).iterator
            .filter(_.isFile).map(_.getPath.toString).toSet
          catch { case _: java.io.FileNotFoundException => Set.empty[String] }
        files.iterator.map(_._1).filter(u =>
          listed.contains(new org.apache.hadoop.fs.Path(u).toString))
      }
    }.toSet
    val nonEmpty = nonEmptyAll.filter(f => existing.contains(f._1))
    val zeroDf = zeroLen.filter(f => existing.contains(f._1))
      .map { case (u, _, ts) =>
        (new org.apache.hadoop.fs.Path(u).toUri.getPath, 0L, ts, Array.emptyByteArray) }
      .toDF("path", "size", "timestamp", "body")
    val bodyDf =
      if (nonEmpty.isEmpty)
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), emptySchema)
      else
        spark.read.format("binaryFile").load(nonEmpty.map(f => escapeGlob(f._1)): _*)
          .select(
            stripScheme(col("path")).as("path"),
            col("length").as("size"),
            unix_millis(col("modificationTime")).as("timestamp"),
            col("content").as("body"))
    bodyDf.unionByName(zeroDf)
  }
}
