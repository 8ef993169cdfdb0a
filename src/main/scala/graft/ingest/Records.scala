package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Record shaping + pluggable conversion (SURVEY.md §2 #9-11, #14).
  *
  * The output contract is a Kafka-shaped DataFrame — `key: binary`,
  * `value: binary`, `topic: string` — which `writeStream.format("kafka")`
  * (or batch `write.format("kafka")`) produces verbatim; the `topic`
  * column gives per-record routing (one query, many topics), replacing
  * the reference's `monitor2topic` lookup (`FtpSourceTask.scala:24-25`).
  */
object Records {

  sealed trait KeyStyle
  object KeyStyle {
    /** key = file path (SimpleFileConverter.scala:43-52) */
    case object StringKey extends KeyStyle
    /** key = {name, offset} struct, JSON-serialized
      * (SimpleFileConverter.scala:54-66) */
    case object StructKey extends KeyStyle
  }

  /** Shape change records for the Kafka sink. `dropEmpty` filters the
    * EmptyFileBody no-op records (unchanged/shrunk cases) that the
    * reference leaves to consumers to ignore. */
  def toKafkaFrame(
      records: Dataset[FileChangeRecord],
      keyStyle: KeyStyle = KeyStyle.StringKey,
      dropEmpty: Boolean = true): DataFrame = {
    // column predicate, not a typed lambda: stays in whole-stage
    // codegen instead of deserializing every record's full payload
    val base =
      if (dropEmpty) records.filter(length(col("value")) > 0) else records
    val keyed = keyStyle match {
      case KeyStyle.StringKey =>
        base.toDF().withColumn("key", col("path").cast("binary"))
      case KeyStyle.StructKey =>
        base.toDF().withColumn("key",
          to_json(struct(col("path").as("name"), col("offset"))).cast("binary"))
    }
    keyed.select(col("key"), col("value"), col("topic"))
  }

  /** Pluggable 1→N record expansion (SURVEY.md §2 #10): the UDTF-like
    * converter surface (`SourceRecordConverter.scala:9-17`). Implemented
    * as a serializable function applied via typed `flatMap` so it runs
    * distributed and inside the same stage as the tail-diff map. */
  trait RecordConverter extends Serializable {
    def convert(in: FileChangeRecord): Seq[FileChangeRecord]
  }

  /** Default no-op converter. */
  final class NopRecordConverter extends RecordConverter {
    override def convert(in: FileChangeRecord): Seq[FileChangeRecord] = Seq(in)
  }

  /** Example converter: split a payload into one record per line,
    * preserving byte offsets (the README's CSV-to-rows use case,
    * /root/reference/README.md:61-92). Blank lines emit no record but
    * still advance the offset — every emitted offset is the line's true
    * byte position in the file.
    *
    * Splits on the RAW bytes, never through a String round-trip: a
    * UTF-8 decode would substitute U+FFFD for non-UTF-8 payloads
    * (latin-1 CSVs, binary frames), corrupting the emitted value AND
    * drifting every subsequent offset. */
  final class LineSplitRecordConverter extends RecordConverter {
    override def convert(in: FileChangeRecord): Seq[FileChangeRecord] = {
      if (in.value.isEmpty) return Seq(in)
      val body = in.value
      val out = Seq.newBuilder[FileChangeRecord]
      var start = 0
      var i = 0
      while (i <= body.length) {
        if (i == body.length || body(i) == '\n') {
          if (i > start)
            out += FileChangeRecord(in.topic, in.path, in.offset + start,
              java.util.Arrays.copyOfRange(body, start, i))
          start = i + 1
        }
        i += 1
      }
      out.result()
    }
  }

  /** Reflective plugin loading, like `FileConverter.scala:20-26`:
    * converters are named by class in config and must have a no-arg
    * constructor. */
  def loadConverter(className: String): RecordConverter =
    Class.forName(className).getDeclaredConstructor()
      .newInstance().asInstanceOf[RecordConverter]

  def applyConverter(
      records: Dataset[FileChangeRecord],
      converter: RecordConverter): Dataset[FileChangeRecord] = {
    import records.sparkSession.implicits._
    records.flatMap(converter.convert _)
  }

  /** Deterministic (head, tail) split of a record batch at `n` records —
    * the reference's `stream.splitAt(maxPollRecords)` carry-over
    * pagination (`FtpSourceTask.scala:47-52`), applied AFTER converter
    * expansion so a 1→N converter cannot blow past the cap.
    *
    * A split needs a total order; ranking runs over the METADATA triple
    * (path, offset, topic) only — the value bytes never enter the
    * single-partition window — and the full rows rejoin by semi/anti
    * join, so payload stays distributed. Per-poll volume is already
    * bounded by the file-level cap upstream. Converters must emit
    * unique (path, offset, topic) per record for the split to be exact
    * (both built-ins do: offsets advance per line). */
  def splitAt(
      records: Dataset[FileChangeRecord],
      n: Long): (Dataset[FileChangeRecord], Dataset[FileChangeRecord]) = {
    import org.apache.spark.sql.expressions.Window
    val keys = Seq("path", "offset", "topic")
    val w = Window.orderBy(keys.map(col): _*)
    val head = records.toDF().select(keys.map(col): _*)
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rn") <= n).drop("rn")
    import records.sparkSession.implicits._
    (records.join(head, keys, "left_semi").as[FileChangeRecord],
     records.join(head, keys, "left_anti").as[FileChangeRecord])
  }
}
