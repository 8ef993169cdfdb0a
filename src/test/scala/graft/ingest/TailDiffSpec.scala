package graft.ingest

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Unit + property coverage of the six tail/diff cases
  * (reference semantics: /root/reference/src/main/scala/.../FtpMonitor
  * .scala:70-105) and the change-detection predicate (`:35-46`).
  */
class TailDiffSpec extends AnyFunSuite with Matchers {

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(50), p)
    assert(res.passed, res.status.toString)
  }

  private val now = 1000L
  private def fetched(path: String, body: Array[Byte], ts: Long = 5L) =
    FetchedFile(path, body.length.toLong, ts, body)
  private def metaOf(body: Array[Byte], ts: Long = 5L, path: String = "/f") =
    TailDiff.metaAfterFetch(fetched(path, body, ts), None, 1L)

  test("requiresFetch: unseen, size change, mtime change, unchanged") {
    val attrs = FileAttributes("/f", 10L, 5L)
    TailDiff.requiresFetch(attrs, None) shouldBe true
    TailDiff.requiresFetch(attrs, Some(metaOf(Array.fill(9)(1.toByte)))) shouldBe true
    TailDiff.requiresFetch(attrs, Some(metaOf(Array.fill(10)(1.toByte), ts = 4L))) shouldBe true
    TailDiff.requiresFetch(attrs, Some(metaOf(Array.fill(10)(1.toByte), ts = 5L))) shouldBe false
  }

  test("(f) new file emits whole body at offset 0") {
    val body = "hello".getBytes
    val (meta, fb) = TailDiff.handleFetchedFile(tail = true, None, fetched("/f", body), now)
    fb.bytes shouldBe body
    fb.offset shouldBe 0L
    meta.firstFetched shouldBe now
    meta.lastModified shouldBe now
  }

  test("(a) tail append with matching prefix emits only the delta") {
    val before = "abcdef".getBytes
    val after = "abcdefGHI".getBytes
    val prev = metaOf(before)
    val (meta, fb) = TailDiff.handleFetchedFile(tail = true, Some(prev), fetched("/f", after, 6L), now)
    new String(fb.bytes) shouldBe "GHI"
    fb.offset shouldBe 6L
    meta.size shouldBe 9L
    meta.firstFetched shouldBe prev.firstFetched // preserved across fetches
  }

  test("(b) tail grew but prefix changed: fall back to whole file at 0") {
    val prev = metaOf("abcdef".getBytes)
    val after = "XXXdefGHI".getBytes
    val (_, fb) = TailDiff.handleFetchedFile(tail = true, Some(prev), fetched("/f", after, 6L), now)
    fb.bytes shouldBe after
    fb.offset shouldBe 0L
  }

  test("(b') listed-grew but body truncated mid-read: full dump, never a crash") {
    // the listing said the file grew to 20 bytes, but by read time it
    // held only 3 — the known 6-byte prefix cannot be verified, so the
    // in-hand body dumps at offset 0 instead of crashing the poll batch
    val prev = metaOf("abcdef".getBytes)
    val cur = FetchedFile("/f", 20L, 6L, "xyz".getBytes)
    val (_, fb) = TailDiff.handleFetchedFile(tail = true, Some(prev), cur, now)
    new String(fb.bytes) shouldBe "xyz"
    fb.offset shouldBe 0L
  }

  test("(c) tail shrunk: empty body") {
    val prev = metaOf("abcdef".getBytes)
    val (_, fb) = TailDiff.handleFetchedFile(tail = true, Some(prev), fetched("/f", "abc".getBytes, 6L), now)
    fb.bytes shouldBe empty
  }

  test("(d) update mode emits whole body on change") {
    val prev = metaOf("abcdef".getBytes)
    val after = "changed!".getBytes
    val (_, fb) = TailDiff.handleFetchedFile(tail = false, Some(prev), fetched("/f", after, 6L), now)
    fb.bytes shouldBe after
    fb.offset shouldBe 0L
  }

  test("(e) unchanged content (mtime-only change): empty body, lastInspected touched") {
    val body = "same".getBytes
    val prev = metaOf(body, ts = 5L)
    val (meta, fb) = TailDiff.handleFetchedFile(tail = true, Some(prev), fetched("/f", body, 9L), now)
    fb.bytes shouldBe empty
    meta.lastInspected shouldBe now
    meta.lastModified shouldBe prev.lastModified // NOT touched
  }

  test("empty update of an existing file emits an empty whole-body record") {
    val prev = metaOf("text".getBytes)
    val (_, fb) = TailDiff.handleFetchedFile(tail = false, Some(prev), fetched("/f", Array.emptyByteArray, 6L), now)
    fb.bytes shouldBe empty
    fb.offset shouldBe 0L
  }

  // ── properties (SURVEY.md §5: scalacheck upgrade) ──

  private val chunkGen = Gen.nonEmptyListOf(Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray)

  test("property: concatenation of emitted tail deltas reconstructs the file; offsets are contiguous") {
    checkProp(Prop.forAll(Gen.nonEmptyListOf(chunkGen)) { chunks =>
      var file = Array.emptyByteArray
      var state: Option[FileMetaData] = None
      var emitted = Array.emptyByteArray
      var nextOffset = 0L
      var ts = 0L
      var offsetsOk = true
      chunks.foreach { c =>
        file = file ++ c
        ts += 1
        val (m, fb) = TailDiff.handleFetchedFile(tail = true, state, fetched("/f", file, ts), ts)
        offsetsOk &&= (fb.offset == nextOffset)
        emitted = emitted ++ fb.bytes
        nextOffset += fb.bytes.length
        state = Some(m)
      }
      offsetsOk && java.util.Arrays.equals(emitted, file)
    })
  }

  test("property: update mode always emits the latest content at offset 0") {
    checkProp(Prop.forAll(Gen.nonEmptyListOf(chunkGen)) { versions =>
      var state: Option[FileMetaData] = None
      var ts = 0L
      var ok = true
      versions.foreach { v =>
        ts += 1
        val (m, fb) = TailDiff.handleFetchedFile(tail = false, state, fetched("/f", v, ts), ts)
        val changed = !state.exists(s => s.size == v.length && s.hash == TailDiff.sha256Hex(v))
        ok &&= (if (changed) java.util.Arrays.equals(fb.bytes, v) && fb.offset == 0L
                else fb.bytes.isEmpty)
        state = Some(m)
      }
      ok
    })
  }

  /** Generated byte source: `total` bytes of `byteAt(i)`, never
    * materialized — how the >2 GiB cases run without 2 GiB of heap. */
  private class PatternStream(total: Long, byteAt: Long => Byte)
      extends java.io.InputStream {
    private var pos = 0L
    override def read(): Int =
      if (pos >= total) -1 else { val b = byteAt(pos); pos += 1; b & 0xff }
    override def read(buf: Array[Byte], off: Int, len: Int): Int = {
      if (pos >= total) return -1
      val n = math.min(len.toLong, total - pos).toInt
      var i = 0
      while (i < n) { buf(off + i) = byteAt(pos + i); i += 1 }
      pos += n
      n
    }
    override def skip(n: Long): Long = {
      val s = math.max(0L, math.min(n, total - pos)); pos += s; s
    }
  }

  test("streaming tail: clean append past the 2 GiB boundary emits only the delta") {
    // prev size one JVM-array-bound past Int.MaxValue: the case the
    // reference silently corrupts (Int casts, FtpMonitor.scala:77,80)
    // and the array path cannot represent at all
    val prevSize = Int.MaxValue.toLong + 10L
    val delta = "appended-after-two-gib".getBytes
    val total = prevSize + delta.length
    def byteAt(i: Long): Byte =
      if (i < prevSize) ((i * 31) ^ (i >>> 13)).toByte
      else delta((i - prevSize).toInt)
    // prev state as an earlier streaming poll would have recorded it
    val (prevHash, digested) =
      TailDiff.sha256HexPrefixStream(new PatternStream(prevSize, byteAt), prevSize)
    digested shouldBe prevSize
    val prev = FileMetaData("/big.log", prevSize, 5L, prevHash, 1L, 1L, 1L)
    val (meta, fb) = TailDiff.handleFetchedStream(tail = true, Some(prev),
      "/big.log", 6L, () => new PatternStream(total, byteAt), now)
    fb.offset shouldBe prevSize
    fb.bytes.toSeq shouldBe delta.toSeq
    meta.size shouldBe total
    meta.lastModified shouldBe now
    meta.firstFetched shouldBe 1L
  }

  test("array path: prev size beyond the array bound degrades to a full dump, not a crash") {
    // state written by a streaming poll of a >2 GiB file, then the
    // (shrunk) file is fetched as an in-memory body: the known prefix
    // can never match an array, which IS the truncated case (b')
    val prev = FileMetaData("/big.log", Int.MaxValue.toLong + 10L, 5L,
      "0" * 64, 1L, 1L, 1L)
    val body = "rewritten".getBytes
    val (_, fb) = TailDiff.handleFetchedFile(tail = true, Some(prev),
      FetchedFile("/big.log", Int.MaxValue.toLong + 20L, 6L, body), now)
    fb.offset shouldBe 0L
    fb.bytes shouldBe body
  }

  test("property: stream and array paths agree on every case at small scale") {
    val bodies = Gen.listOf(Gen.chooseNum(0, 255).map(_.toByte)).map(_.toArray)
    checkProp(Prop.forAll(bodies, bodies, Gen.oneOf(true, false),
        Gen.oneOf(true, false)) { (b1: Array[Byte], b2: Array[Byte],
        tail: Boolean, seen: Boolean) =>
      val prev = if (seen) Some(metaOf(b1)) else None
      val arr = TailDiff.handleFetchedFile(tail, prev,
        FetchedFile("/f", b2.length.toLong, 6L, b2), now)
      val str = TailDiff.handleFetchedStream(tail, prev, "/f", 6L,
        () => new java.io.ByteArrayInputStream(b2), now)
      arr._1 == str._1 &&
        arr._2.offset == str._2.offset &&
        java.util.Arrays.equals(arr._2.bytes, str._2.bytes)
    })
  }

  test("chunked emission: exact chunk boundaries, advancing offsets, reconstruction") {
    val prevBody = "0123456789".getBytes // 10 bytes
    val delta = "abcdefghijklmnopqrstu".getBytes // 21 bytes
    val full = prevBody ++ delta
    val prev = metaOf(prevBody)
    for (chunk <- Seq(1, 7, 20, 21, 22, 1000)) withClue(s"chunk=$chunk: ") {
      val em = TailDiff.handleFetchedStreamChunked(
        tail = true, Some(prev), "/f", 6L,
        () => new java.io.ByteArrayInputStream(full), now, maxRecordBytes = chunk)
      val bodies = em.chunks.toSeq
      em.finalMeta().size shouldBe full.length.toLong // clean emission
      bodies.length shouldBe (delta.length + chunk - 1) / chunk
      bodies.head.offset shouldBe prevBody.length.toLong
      bodies.sliding(2).foreach {
        case Seq(a, b) => b.offset shouldBe a.offset + a.bytes.length
        case _ => ()
      }
      bodies.flatMap(_.bytes).toArray shouldBe delta
    }
  }

  test("chunked emission: empty range still yields exactly one empty record") {
    // unchanged content (case e) and an empty new file (case f) both
    // guarantee a record per handled fetch
    val body = "same".getBytes
    val prev = metaOf(body)
    val emE = TailDiff.handleFetchedStreamChunked(
      tail = true, Some(prev), "/f", 5L,
      () => new java.io.ByteArrayInputStream(body), now, maxRecordBytes = 3)
    emE.chunks.toSeq shouldBe Seq(FileBody.empty)
    val emF = TailDiff.handleFetchedStreamChunked(
      tail = true, None, "/f", 5L,
      () => new java.io.ByteArrayInputStream(Array.emptyByteArray), now,
      maxRecordBytes = 3)
    emF.initialMeta.size shouldBe 0L
    val recs = emF.chunks.toSeq
    recs.length shouldBe 1
    recs.head.bytes shouldBe empty
  }

  test("truncation between passes degrades to the bytes actually readable") {
    // pass 1 digests 30 bytes; the source then shrinks to 17 before the
    // emission pass — emitted records cover [10, 17) and stop, no EOF
    val prevBody = "0123456789".getBytes
    val full = prevBody ++ "abcdefghijklmnopqrst".getBytes // 30 bytes
    val prev = metaOf(prevBody)
    var opens = 0
    def open(): java.io.InputStream = {
      opens += 1
      if (opens == 1) new java.io.ByteArrayInputStream(full)
      else new java.io.ByteArrayInputStream(full.take(17))
    }
    val em = TailDiff.handleFetchedStreamChunked(
      tail = true, Some(prev), "/f", 6L,
      () => open(), now, maxRecordBytes = 4)
    em.initialMeta.size shouldBe 30L // pass-1 digest state
    val bodies = em.chunks.toSeq
    bodies.head.offset shouldBe 10L
    bodies.flatMap(_.bytes).toArray shouldBe full.slice(10, 17)
    // the PUBLISHED state row self-invalidates: size covers only the
    // bytes whose emission is certain, and the hash marker can never
    // match a sha-256 — the next poll must re-fetch and full-dump, so
    // the undelivered suffix is re-delivered even if the file returns
    // to byte-identical pass-1 content (at-least-once preserved)
    val fin = em.finalMeta()
    fin.size shouldBe 17L
    fin.hash shouldBe "!truncated@17"
  }

  test("source deleted between passes ends emission without an exception") {
    val prevBody = "0123456789".getBytes
    val full = prevBody ++ "abcdef".getBytes
    val prev = metaOf(prevBody)
    var opens = 0
    def open(): java.io.InputStream = {
      opens += 1
      if (opens == 1) new java.io.ByteArrayInputStream(full)
      else throw new java.io.FileNotFoundException("/f")
    }
    val em = TailDiff.handleFetchedStreamChunked(
      tail = true, Some(prev), "/f", 6L,
      () => open(), now, maxRecordBytes = 4)
    // the record-per-fetch guarantee holds even when nothing is readable
    em.chunks.toSeq shouldBe Seq(FileBody.empty)
    // and the state row self-invalidates at the emission start
    em.finalMeta().hash shouldBe "!truncated@10"
  }

  test("a self-invalidated state row forces a full dump in both faces") {
    // state written by a truncated streaming emission; the file then
    // shrinks to exactly the emitted length with DIFFERENT content —
    // size-based case (c) would silently skip the never-delivered base
    val prev = FileMetaData("/f", 17L, 5L, "!truncated@17", 1L, 1L, 1L)
    val body = "seventeen-bytes!!".getBytes
    body.length shouldBe 17
    val (m1, fb1) = TailDiff.handleFetchedFile(
      tail = true, Some(prev), fetched("/f", body, 6L), now)
    fb1.offset shouldBe 0L
    fb1.bytes shouldBe body
    m1.hash should not startWith "!truncated"
    val em = TailDiff.handleFetchedStreamChunked(
      tail = true, Some(prev), "/f", 6L,
      () => new java.io.ByteArrayInputStream(body), now, maxRecordBytes = 1000)
    val bodies = em.chunks.toSeq
    bodies.head.offset shouldBe 0L
    bodies.flatMap(_.bytes).toArray shouldBe body
    em.finalMeta().hash should not startWith "!truncated"
  }

  test("single-record face fails loudly only past the array bound semantics") {
    // a normal emission returns one record identical to the chunked
    // face's concatenation
    val prevBody = "0123456789".getBytes
    val delta = "abc".getBytes
    val full = prevBody ++ delta
    val prev = metaOf(prevBody)
    val (_, fb) = TailDiff.handleFetchedStream(
      tail = true, Some(prev), "/f", 6L,
      () => new java.io.ByteArrayInputStream(full), now)
    fb.offset shouldBe 10L
    fb.bytes shouldBe delta
  }

  test("backoff doubles up to cap and resets on success") {
    var b = ExponentialBackoff(stepMs = 1000L, capMs = 30 * 60 * 1000L)
    b.intervalMs shouldBe 1000L
    b = b.nextFailure(0L); b.intervalMs shouldBe 2000L
    b = b.nextFailure(0L); b.intervalMs shouldBe 4000L
    (1 to 60).foreach(_ => b = b.nextFailure(0L))
    b.intervalMs shouldBe 30 * 60 * 1000L // capped
    b.passed(0L) shouldBe false
    b.passed(30 * 60 * 1000L) shouldBe true
    b = b.nextSuccess(100L)
    b.intervalMs shouldBe 1000L
    b.endTimeMs shouldBe 1100L
  }
}
