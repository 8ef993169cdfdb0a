package graft.ingest

import java.time.Duration

/** Typed configuration surface — the "query language" of the ingestion
  * engine (SURVEY.md §2 #18; reference `FtpSourceConfig.scala:19-77`).
  * Parses the same shapes: `path:topic` monitor lists, ISO-8601
  * durations, a key-style enum, reflective converter class names —
  * with fail-fast validation at construction (the reference throws from
  * the connector's `start`, `FtpSourceConnector.scala:34-37`).
  */
final case class MonitorConfig(
    tailDirs: Seq[MonitoredPath],
    updateDirs: Seq[MonitoredPath],
    refresh: Duration,
    maxAge: Option[Duration],
    maxBackoff: Duration,
    maxFilesPerPoll: Int,
    maxPollRecords: Int,
    keyStyle: Records.KeyStyle,
    converterClass: Option[String]) {
  def dirs: Seq[MonitoredPath] = tailDirs ++ updateDirs
  def converter: Records.RecordConverter = converterClass
    .map(Records.loadConverter)
    .getOrElse(new Records.NopRecordConverter)
}

object MonitorConfig {
  val MonitorTail = "monitor.tail"
  val MonitorUpdate = "monitor.update"
  val Refresh = "refresh"
  val FileMaxAge = "file.maxage"
  val MaxBackoff = "max.backoff"
  /** Cap on RECORDS per poll, applied after converter expansion with a
    * carry-over buffer — the reference's `ftp.max.poll.records`
    * (`FtpSourceTask.scala:47-52`). */
  val MaxPollRecords = "max.poll.records"
  /** Cap on FILES fetched per poll (listing-level rate limit; the
    * streaming analog is `maxFilesPerTrigger`). */
  val MaxPollFiles = "max.poll.files"
  val KeyStyleKey = "keystyle"
  val SourceRecordConverter = "sourcerecordconverter"

  /** `path:topic[,path:topic...]` — same grammar as the reference
    * (`FtpSourceConfig.scala:55-59`), except the path side may itself
    * contain colons (`s3a://bucket/in/`, `hdfs://nn/dir/`): the spec
    * splits on the LAST colon, since topics cannot contain one
    * (Kafka's legal topic charset is [a-zA-Z0-9._-]). */
  private[ingest] def parseMonitors(
      spec: String, tail: Boolean): Seq[MonitoredPath] =
    spec.split(',').filter(_.nonEmpty).toSeq.map { pair =>
      // trim BEFORE the non-empty guard: "  :topic" must fail fast,
      // not produce an empty monitored path
      val cut = pair.lastIndexOf(':')
      val parts =
        if (cut < 0) Array(pair.trim)
        else Array(pair.substring(0, cut).trim, pair.substring(cut + 1).trim)
      parts match {
        case Array(path, topic) if path.nonEmpty && topic.nonEmpty =>
          MonitoredPath(path, tail, topic)
        case _ => throw new IllegalArgumentException(
          s"invalid monitor spec '$pair': expected path:topic")
      }
    }

  def apply(props: Map[String, String]): MonitorConfig = {
    def duration(key: String, default: String): Duration = {
      val d =
        try Duration.parse(props.getOrElse(key, default))
        catch {
          case e: java.time.format.DateTimeParseException =>
            throw new IllegalArgumentException(
              s"invalid ISO-8601 duration for $key: '${props(key)}'", e)
        }
      // ISO-8601 parses negative durations ("PT-5S") — reject them.
      // Zero stays legal: refresh PT0S means continuous polling (the
      // failure backoff floors its doubling base at 1 s regardless)
      if (d.isNegative) throw new IllegalArgumentException(
        s"$key must be a non-negative duration, got '$d'")
      d
    }
    val tails = props.get(MonitorTail).map(parseMonitors(_, tail = true))
      .getOrElse(Seq.empty)
    val updates = props.get(MonitorUpdate).map(parseMonitors(_, tail = false))
      .getOrElse(Seq.empty)
    if (tails.isEmpty && updates.isEmpty)
      throw new IllegalArgumentException(
        s"at least one of $MonitorTail / $MonitorUpdate must be set")
    val keyStyle = props.getOrElse(KeyStyleKey, "string") match {
      case "string" => Records.KeyStyle.StringKey
      case "struct" => Records.KeyStyle.StructKey
      case other => throw new IllegalArgumentException(
        s"invalid $KeyStyleKey '$other': expected string|struct")
    }
    def positiveInt(key: String): Int = {
      val raw = props.getOrElse(key, "10000")
      val v =
        try raw.toInt
        catch {
          case e: NumberFormatException => throw new IllegalArgumentException(
            s"$key must be an integer, got '$raw'", e)
        }
      if (v <= 0) throw new IllegalArgumentException(s"$key must be positive")
      v
    }
    MonitorConfig(
      tailDirs = tails,
      updateDirs = updates,
      refresh = duration(Refresh, "PT1M"),
      maxAge = props.get(FileMaxAge).map(_ => duration(FileMaxAge, "")),
      maxBackoff = duration(MaxBackoff, "PT30M"),
      maxFilesPerPoll = positiveInt(MaxPollFiles),
      maxPollRecords = positiveInt(MaxPollRecords),
      keyStyle = keyStyle,
      converterClass = props.get(SourceRecordConverter))
  }
}
