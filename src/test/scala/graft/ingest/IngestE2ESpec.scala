package graft.ingest

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** End-to-end replay of the reference's black-box suite
  * (/root/reference/src/test/scala/.../EndToEnd.scala, scenarios in
  * /root/repo/FIXTURES.md §1): five sequential change-sets over two
  * tailed and two updated files, driven through `Monitor.poll` with the
  * state threaded between polls, asserting per-poll records match the
  * applied diffs exactly — topic, key path, struct offset, value bytes.
  */
class IngestE2ESpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  // byte payloads from EndToEnd.scala:102-106
  private val sEmpty = Array.emptyByteArray
  private val s0 = (0 to 255).map(_.toByte).toArray
  private val s1 = "Hebban olla vogala nestas hagunnan hinase hic enda thu wat unbidan we nu\r\n\t :)".getBytes(UTF_8)
  private val s2 = "<mandatory quote to show off erudition here>".getBytes(UTF_8)
  private val s3 = "!".getBytes(UTF_8)

  sealed trait Change { def body: Array[Byte] }
  case class Update(body: Array[Byte]) extends Change
  case class Append(body: Array[Byte]) extends Change

  /** Expected emitted diff: (value bytes, struct-key offset). */
  case class Diff(body: Array[Byte], offset: Long)

  /** Local-FS mutator with the reference's semantics: Update =
    * truncate-write (always produces a diff, even when empty); Append
    * drops zero-length bodies entirely (EndToEnd.scala:83-97). */
  private def applyChanges(root: Path, chgs: Seq[(String, Change)]): Seq[(String, Diff)] =
    chgs.flatMap { case (name, chg) =>
      val p = root.resolve(name.stripPrefix("/"))
      Files.createDirectories(p.getParent)
      chg match {
        case Update(body) =>
          Files.write(p, body, StandardOpenOption.CREATE,
            StandardOpenOption.TRUNCATE_EXISTING, StandardOpenOption.WRITE)
          Some(name -> Diff(body, 0L))
        case Append(body) if body.nonEmpty =>
          val oldSize = if (Files.exists(p)) Files.size(p) else 0L
          Files.write(p, body, StandardOpenOption.CREATE, StandardOpenOption.APPEND)
          Some(name -> Diff(body, oldSize))
        case _ => None
      }
    }

  test("happy flow: file changes surface as correctly-keyed records across 5 polls") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-e2e")
    val dirs = Seq(
      MonitoredPath(s"$root/tails/", tail = true, topic = "tails"),
      MonitoredPath(s"$root/updates/", tail = false, topic = "updates"))
    val topicOf = Map("/tails/t0" -> "tails", "/tails/t1" -> "tails",
      "/updates/u0" -> "updates", "/updates/u1" -> "updates")

    // change-sets from EndToEnd.scala:113-135 / FIXTURES.md §1
    val changeSets: Seq[Seq[(String, Change)]] = Seq(
      Seq("/tails/t0" -> Append(s0), "/tails/t1" -> Append(sEmpty),
          "/updates/u0" -> Update(s1), "/updates/u1" -> Update(sEmpty)),
      Seq("/tails/t0" -> Append(s1), "/tails/t1" -> Append(s3),
          "/updates/u0" -> Update(sEmpty), "/updates/u1" -> Update(s2)),
      Seq("/tails/t0" -> Append(s3), "/updates/u1" -> Update(s1)),
      Seq("/tails/t1" -> Append(s1), "/updates/u0" -> Update(s2)),
      Seq("/tails/t0" -> Append(s0), "/tails/t1" -> Append(s2),
          "/updates/u0" -> Update(s3), "/updates/u1" -> Update(s2)))

    var state = spark.emptyDataset[FileMetaData]
    var pollNo = 0
    changeSets.foreach { chgs =>
      pollNo += 1
      val diffs = applyChanges(root, chgs)
      val out = Monitor.poll(spark, dirs, state, nowMs = 10000L + pollNo)
      val got = out.records.collect()
        .map(r => (r.topic, r.path, r.offset, r.value.toSeq)).toSet
      val expected = diffs.map { case (name, d) =>
        (topicOf(name), s"$root${name}", d.offset, d.body.toSeq)
      }.toSet
      withClue(s"poll $pollNo: ") { got shouldBe expected }
      state = out.newState
      // state invariant: one row per known file
      val st = state.collect()
      st.map(_.path).distinct.length shouldBe st.length
    }

    // final state reflects the final file contents
    val finalState = state.collect().map(m => m.path -> m).toMap
    finalState(s"$root/tails/t0").size shouldBe (s0.length + s1.length + s3.length + s0.length).toLong
    finalState(s"$root/updates/u1").size shouldBe s2.length.toLong
  }

  test("quiescent poll emits nothing and preserves state") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-quiet")
    val dirs = Seq(MonitoredPath(s"$root/tails/", tail = true, topic = "tails"))
    applyChanges(root, Seq("/tails/a" -> Append(s1)))
    val p1 = Monitor.poll(spark, dirs, spark.emptyDataset[FileMetaData], nowMs = 1L)
    p1.records.count() shouldBe 1L
    val st1 = p1.newState.collect().toSeq
    val p2 = Monitor.poll(spark, dirs, p1.newState, nowMs = 2L)
    p2.records.count() shouldBe 0L
    p2.newState.collect().toSeq shouldBe st1
  }

  test("max-age filter drops old files before fetch (FtpMonitor.scala:110)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-age")
    val dirs = Seq(MonitoredPath(s"$root/d/", tail = false, topic = "t"))
    applyChanges(root, Seq("/d/old" -> Update(s1)))
    val mtime = Files.getLastModifiedTime(root.resolve("d/old")).toMillis
    // cutoff excludes the file: now - maxAge > mtime
    val out = Monitor.poll(spark, dirs, spark.emptyDataset[FileMetaData],
      maxAgeMs = Some(1000L), nowMs = mtime + 10000L)
    out.records.count() shouldBe 0L
    // cutoff includes it
    val out2 = Monitor.poll(spark, dirs, spark.emptyDataset[FileMetaData],
      maxAgeMs = Some(60000L), nowMs = mtime + 10000L)
    out2.records.count() shouldBe 1L
  }

  test("limit bounds records per poll; remainder arrives on the next poll") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-limit")
    val dirs = Seq(MonitoredPath(s"$root/d/", tail = false, topic = "t"))
    applyChanges(root, (0 until 5).map(i => s"/d/f$i" -> Update(s3)))
    val p1 = Monitor.poll(spark, dirs, spark.emptyDataset[FileMetaData],
      maxFilesPerPoll = 3, nowMs = 1L)
    p1.records.count() shouldBe 3L
    val p2 = Monitor.poll(spark, dirs, p1.newState, maxFilesPerPoll = 3, nowMs = 2L)
    p2.records.count() shouldBe 2L
    val p3 = Monitor.poll(spark, dirs, p2.newState, maxFilesPerPoll = 3, nowMs = 3L)
    p3.records.count() shouldBe 0L
  }

  test("record converter expands one record into N (line split)") {
    val conv = new Records.LineSplitRecordConverter
    val in = FileChangeRecord("t", "/f.csv", 0L, "a,1\nb,2\nc,3".getBytes(UTF_8))
    val out = conv.convert(in)
    out.map(r => new String(r.value, UTF_8)) shouldBe Seq("a,1", "b,2", "c,3")
    out.map(_.offset) shouldBe Seq(0L, 4L, 8L)
    // blank lines emit nothing but still advance the byte offsets
    val blanks = conv.convert(FileChangeRecord("t", "/g", 0L, "a\n\nb".getBytes(UTF_8)))
    blanks.map(r => new String(r.value, UTF_8)) shouldBe Seq("a", "b")
    blanks.map(_.offset) shouldBe Seq(0L, 3L) // "b" is truly at byte 3
    // reflective loading, like FileConverter.scala:20-26
    val loaded = Records.loadConverter("graft.ingest.Records$LineSplitRecordConverter")
    loaded.convert(in).length shouldBe 3
  }

  test("streamed tail/diff path (inlineBodyMax=1) emits the same records as the array path") {
    import spark.implicits._
    val rootA = Files.createTempDirectory("graft-stream-a")
    val rootB = Files.createTempDirectory("graft-stream-b")
    // identical change sequences in two roots: root A polls with the
    // default inline path, root B forces EVERY non-empty body through
    // TailDiff.handleFetchedStream (size > 1 byte => null body) — the
    // production wiring of the >2 GiB path, proven equivalent at small
    // scale (the 2 GiB-boundary behavior itself is TailDiffSpec's
    // generated-stream case)
    val changeSets: Seq[Seq[(String, Change)]] = Seq(
      Seq("/tails/t0" -> Append(s0), "/updates/u0" -> Update(s1)),
      Seq("/tails/t0" -> Append(s1), "/updates/u0" -> Update(s2)),
      Seq("/tails/t0" -> Append(s3), "/updates/u0" -> Update(sEmpty)))
    def run(root: Path, inlineMax: Long): Seq[Set[(String, String, Long, Seq[Byte])]] = {
      val dirs = Seq(
        MonitoredPath(s"$root/tails/", tail = true, topic = "tails"),
        MonitoredPath(s"$root/updates/", tail = false, topic = "updates"))
      var state = spark.emptyDataset[FileMetaData]
      changeSets.zipWithIndex.map { case (chgs, i) =>
        applyChanges(root, chgs)
        val out = Monitor.poll(spark, dirs, state, nowMs = 100L + i,
          inlineBodyMax = inlineMax)
        val got = out.records.collect()
          .map(r => (r.topic, r.path.stripPrefix(root.toString), r.offset,
            r.value.toSeq)).toSet
        state = out.newState
        got
      }
    }
    val arrayPath = run(rootA, Listing.DefaultInlineBodyMax)
    val streamPath = run(rootB, 1L)
    streamPath.flatten should not be empty
    streamPath shouldBe arrayPath
  }

  test("chunked append: an oversized delta emits N records that reconstruct the file") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-chunked")
    val dirs = Seq(MonitoredPath(s"$root/logs/", tail = true, topic = "logs"))
    // poll 1: seed a tailed file (one chunk wide)
    applyChanges(root, Seq("/logs/app.log" -> Update(s3)))
    val p1 = Monitor.poll(spark, dirs, spark.emptyDataset[FileMetaData],
      nowMs = 1L, inlineBodyMax = 0L, maxRecordBytes = 7)
    p1.records.count() shouldBe 1L
    // poll 2: append a delta far wider than maxRecordBytes — the
    // streaming tail/diff must emit ceil(len/7) records with advancing
    // offsets (the LineSplit discipline) instead of one oversized body
    val delta = (0 until 100).map(i => ('a' + i % 26).toChar).mkString.getBytes(UTF_8)
    applyChanges(root, Seq("/logs/app.log" -> Append(delta)))
    val p2 = Monitor.poll(spark, dirs, p1.newState,
      nowMs = 2L, inlineBodyMax = 0L, maxRecordBytes = 7)
    val recs = p2.records.collect().sortBy(_.offset)
    recs.length shouldBe (delta.length + 6) / 7
    recs.head.offset shouldBe s3.length.toLong // delta starts after the seed
    // offsets advance by each record's width, with no gaps or overlaps
    recs.sliding(2).foreach {
      case Array(a, b) => b.offset shouldBe a.offset + a.value.length
      case _ => ()
    }
    recs.flatMap(_.value).toSeq shouldBe delta.toSeq
    // the full file reconstructs from ALL emitted records in offset order
    val all = (p1.records.collect() ++ recs).sortBy(_.offset)
    all.flatMap(_.value).toSeq shouldBe (s3 ++ delta).toSeq
    // state carries the true size: the next poll sees no change
    val p3 = Monitor.poll(spark, dirs, p2.newState, nowMs = 3L,
      inlineBodyMax = 0L, maxRecordBytes = 7)
    p3.records.count() shouldBe 0L
  }

  test("broadcast conf carrier survives both Java and Kryo serializers") {
    val conf = new org.apache.hadoop.conf.Configuration(false)
    conf.set("graft.test.key", "v1")
    val carrier = new Listing.SerializableHadoopConf(conf)
    // Java serialization (default spark.serializer)
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(carrier); oos.close()
    val viaJava = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[Listing.SerializableHadoopConf]
    viaJava.value.get("graft.test.key") shouldBe "v1"
    // Kryo (a deployment setting spark.serializer=KryoSerializer):
    // FieldSerializer bypasses writeObject/readObject hooks, so the
    // carrier must not rely on them — the eager byte-array field is
    // what round-trips here
    val kryo = new org.apache.spark.serializer.KryoSerializer(
      new org.apache.spark.SparkConf(false)).newInstance()
    val viaKryo = kryo.deserialize[Listing.SerializableHadoopConf](
      kryo.serialize(carrier))
    viaKryo.value.get("graft.test.key") shouldBe "v1"
  }

  test("distributed listing equals the driver listing, spec tags intact") {
    val root = Files.createTempDirectory("graft-distlist")
    (0 until 3).foreach { i =>
      Files.write(root.resolve(s"f$i.txt"), s"body$i".getBytes(UTF_8))
      Files.write(root.resolve(s"g$i.log"), s"log$i".getBytes(UTF_8))
    }
    // 10 specs (over the distribute threshold), two of them overlapping
    // the same files under different topics
    val mps = (0 until 8).map(i =>
      MonitoredPath(s"$root/f${i % 3}.txt", tail = true, topic = s"t$i")) ++
      Seq(MonitoredPath(s"$root/*.log", tail = false, topic = "logs"),
        MonitoredPath(s"$root/*.txt", tail = true, topic = "all-txt"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4), r.getString(5))).sortBy(r => (r._1, r._6))
    val distributed = rows(Listing.listAll(spark, mps))
    val driver = rows(Listing.listAll(spark, mps, distributeThreshold = 1000))
    distributed should not be empty
    distributed.length shouldBe 8 + 3 + 3 // 8 single-file specs + 2 globs
    distributed shouldBe driver
  }

  test("glob-metachar filenames are fetched literally, not pattern-expanded") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-meta")
    val dirs = Seq(MonitoredPath(s"$root/in/", tail = false, topic = "t"))
    applyChanges(root, Seq("/in/data[1].csv" -> Update(s3), "/in/x{y}.bin" -> Update(s2)))
    val out = Monitor.poll(spark, dirs, spark.emptyDataset[FileMetaData], nowMs = 1L)
    out.records.collect().map(r => (r.path.split('/').last, r.value.toSeq)).toSet shouldBe
      Set(("data[1].csv", s3.toSeq), ("x{y}.bin", s2.toSeq))
  }

  test("a path matched by two monitored specs emits to both topics with each spec's mode") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-multispec")
    val dirs = Seq(
      MonitoredPath(s"$root/d/", tail = true, topic = "raw"),
      MonitoredPath(s"$root/d/", tail = false, topic = "full"))
    applyChanges(root, Seq("/d/f" -> Update(s1)))
    val p1 = Monitor.poll(spark, dirs, spark.emptyDataset[FileMetaData], nowMs = 1L)
    p1.records.collect().map(_.topic).sorted.toSeq shouldBe Seq("full", "raw")
    // state keeps exactly one row for the file
    p1.newState.collect().length shouldBe 1
    // append: the tail spec emits only the delta, the update spec the whole file
    applyChanges(root, Seq("/d/f" -> Append(s3)))
    val p2 = Monitor.poll(spark, dirs, p1.newState, nowMs = 2L)
    val byTopic = p2.records.collect().map(r => r.topic -> r).toMap
    byTopic("raw").value.toSeq shouldBe s3.toSeq // delta only
    byTopic("raw").offset shouldBe s1.length.toLong
    byTopic("full").value.toSeq shouldBe (s1 ++ s3).toSeq // whole body
    byTopic("full").offset shouldBe 0L
  }

  test("multi-spec path through the STREAMING branch: both topics, one state row, chunked") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-multispec-stream")
    val dirs = Seq(
      MonitoredPath(s"$root/d/", tail = true, topic = "raw"),
      MonitoredPath(s"$root/d/", tail = false, topic = "full"))
    // inlineBodyMax=0 forces every body through the chunked streaming
    // tail/diff; maxRecordBytes=7 forces multi-record emission — the
    // conservative smallest-(size, hash) state reduce must still
    // produce exactly one row per path from the two specs' last-chunk
    // metas
    applyChanges(root, Seq("/d/f" -> Update(s1)))
    val p1 = Monitor.poll(spark, dirs, spark.emptyDataset[FileMetaData],
      nowMs = 1L, inlineBodyMax = 0L, maxRecordBytes = 7)
    val r1 = p1.records.collect()
    r1.map(_.topic).distinct.sorted.toSeq shouldBe Seq("full", "raw")
    // each topic's chunked records reconstruct the file
    for (t <- Seq("raw", "full")) withClue(t) {
      r1.filter(_.topic == t).sortBy(_.offset).flatMap(_.value).toSeq shouldBe s1.toSeq
    }
    val st1 = p1.newState.collect()
    st1.length shouldBe 1
    st1.head.size shouldBe s1.length.toLong
    // append: tail spec emits chunked delta, update spec chunked whole
    applyChanges(root, Seq("/d/f" -> Append(s3)))
    val p2 = Monitor.poll(spark, dirs, p1.newState,
      nowMs = 2L, inlineBodyMax = 0L, maxRecordBytes = 7)
    val r2 = p2.records.collect()
    r2.filter(_.topic == "raw").sortBy(_.offset)
      .flatMap(_.value).toSeq shouldBe s3.toSeq
    r2.filter(_.topic == "raw").map(_.offset).min shouldBe s1.length.toLong
    r2.filter(_.topic == "full").sortBy(_.offset)
      .flatMap(_.value).toSeq shouldBe (s1 ++ s3).toSeq
    p2.newState.collect().length shouldBe 1
  }

  test("a file vanishing before fetch is skipped AND counted in skippedFiles") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-skipcount")
    val dirs = Seq(MonitoredPath(s"$root/in/", tail = false, topic = "t"))
    applyChanges(root, Seq("/in/keep.csv" -> Update(s1), "/in/gone.csv" -> Update(s2)))
    // the change-set metadata is materialized inside poll() (localCheckpoint),
    // but the fetch runs when records are first consumed — deleting here
    // lands deterministically between list and fetch
    val out = Monitor.poll(spark, dirs, spark.emptyDataset[FileMetaData], nowMs = 1L)
    Files.delete(root.resolve("in/gone.csv"))
    val got = out.records.collect()
    got.map(_.path.split('/').last).toSeq shouldBe Seq("keep.csv")
    out.skippedFiles() shouldBe 1L
    // the vanished file never reaches state: the next poll re-detects it
    out.newState.collect().map(_.path.split('/').last).toSeq shouldBe Seq("keep.csv")
  }

  test("kafka frame shaping: both key styles, empty bodies dropped") {
    import spark.implicits._
    val recs = Seq(
      FileChangeRecord("t1", "/a", 0L, "x".getBytes(UTF_8)),
      FileChangeRecord("t2", "/b", 7L, "y".getBytes(UTF_8)),
      FileChangeRecord("t1", "/c", 0L, Array.emptyByteArray)).toDS()
    val stringFrame = Records.toKafkaFrame(recs, Records.KeyStyle.StringKey).collect()
    stringFrame.length shouldBe 2
    stringFrame.map(r => new String(r.getAs[Array[Byte]]("key"), UTF_8)).toSet shouldBe Set("/a", "/b")
    val structFrame = Records.toKafkaFrame(recs, Records.KeyStyle.StructKey).collect()
    structFrame.map(r => new String(r.getAs[Array[Byte]]("key"), UTF_8)).toSet shouldBe
      Set("""{"name":"/a","offset":0}""", """{"name":"/b","offset":7}""")
    structFrame.map(_.getAs[String]("topic")).toSet shouldBe Set("t1", "t2")
  }
}
