package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** End-to-end gate for the continuous dedup pipeline: in-batch dupes,
  * cross-batch dupes, and state-vs-batch dupes all resolve exactly as
  * the batch operator would, the state table accumulates one
  * bucket-aligned generation per batch, and the periodic compact keeps
  * the bucket layout (and the survivors) intact.
  */
class StreamingDedupSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("streaming exact dedup: survivors, state folds, and periodic compaction") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val table = "sd_state"
    val ckpt = Files.createTempDirectory("graft-sdedup-ckpt")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val input = MemoryStream[(Long, String)]
    @volatile var out = Vector.empty[(Long, String)]
    val q = StreamingDedup.exactDedupStream(
      input.toDF().toDF("doc_id", "text"), table, buckets = 4,
      ckpt.toString,
      sink = ds => out ++= ds.collect().toVector
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1),
      compactEvery = 2L)

    def tableFiles(): Int = {
      val loc = new java.io.File(new java.net.URI(
        spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(table)).location.toString))
      loc.listFiles().count(_.getName.endsWith(".parquet"))
    }

    try {
      // batch 0: one in-batch duplicate (doc 3 repeats doc 1's body)
      input.addData((1L, "aaa"), (2L, "bbb"), (3L, "aaa"))
      q.processAllAvailable()
      out.map(_._1) shouldBe Vector(1L, 2L)

      // batch 1: doc 5 duplicates state (doc 2's body) — only 4 survives;
      // (batchId+1) % 2 == 0 → compact runs after the fold
      input.addData((4L, "ccc"), (5L, "bbb"))
      q.processAllAvailable()
      out.map(_._1) shouldBe Vector(1L, 2L, 4L)
      tableFiles() should be <= 4 // compacted: one file per bucket

      // batch 2: in-batch dup (8=6) AND state dup (7=4's body)
      input.addData((6L, "ddd"), (7L, "ccc"), (8L, "ddd"))
      q.processAllAvailable()
      out.map(_._1) shouldBe Vector(1L, 2L, 4L, 6L)

      // the state is exactly the survivor hash set
      spark.table(table).collect().map(_.getString(0)).sorted shouldBe
        out.map(_._2).sorted
      // survivor hashes really are the batch bodies' sha-256
      out.toMap.apply(1L) shouldBe
        java.security.MessageDigest.getInstance("SHA-256")
          .digest("aaa".getBytes("UTF-8")).map("%02x".format(_)).mkString
    } finally {
      q.stop()
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("continuous dedup survives a restart: offsets recover, the bucketed " +
      "state persists, and cross-restart duplicates stay blocked") {
    import java.nio.charset.StandardCharsets.UTF_8
    val dir = java.nio.file.Files.createTempDirectory("graft-sdedup-src")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sdedup-rckpt")
    val table = "sd_restart_state"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    def writeDocs(name: String, docs: (Long, String)*): Unit =
      java.nio.file.Files.write(dir.resolve(name),
        docs.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
          .mkString("\n").getBytes(UTF_8))
    def source() = spark.readStream
      .schema("doc_id LONG, text STRING").json(dir.toString)
    @volatile var out = Vector.empty[Long]
    def start() = StreamingDedup.exactDedupStream(
      source(), table, buckets = 4, ckpt.toString,
      sink = ds => out ++= ds.collect().map(_.getLong(0)).sorted)

    try {
      writeDocs("b0.json", (1L, "aaa"), (2L, "bbb"))
      val q1 = start()
      try q1.processAllAvailable()
      finally q1.stop() // crash/restart boundary
      out shouldBe Vector(1L, 2L)

      // doc 3 duplicates PRE-restart state; doc 4 is new. The restarted
      // query must not re-emit batch 0 (offsets recovered) and must
      // still block 3 (state table persisted outside the checkpoint)
      writeDocs("b1.json", (3L, "aaa"), (4L, "ccc"))
      val q2 = start()
      try {
        q2.processAllAvailable()
        out shouldBe Vector(1L, 2L, 4L)
        spark.table(table).count() shouldBe 3L
      } finally q2.stop()
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("streaming CDC dedup: only new chunks emit, insertions share all " +
      "undisturbed chunks cross-batch, compaction keeps the state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.unsafe.types.UTF8String
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val table = "scdc_state"
    val ckpt = Files.createTempDirectory("graft-scdc-ckpt")
    spark.sql(s"DROP TABLE IF EXISTS $table")

    // single-threaded twin of the streamed chunker (same as DedupSpec's)
    def cdcChunks(text: String): Seq[String] = {
      val n = text.length
      val cuts = (8 to n).filter { i =>
        graft.functions.RollingHash.hash(
          UTF8String.fromString(text.substring(i - 8, i)), 31L) % 16 == 0
      }.filter(_ < n)
      val bounds = (0 +: cuts) :+ n
      bounds.sliding(2).map { case Seq(a, b) => text.substring(a, b) }.toSeq
    }
    def fpsOf(text: String): Set[Long] = cdcChunks(text)
      .map(c => graft.functions.RollingHash.hash2(UTF8String.fromString(c)))
      .toSet

    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep dark forest before nightfall comes again"
    val other = "entirely different content words making a separate " +
      "document body so its chunk fingerprints are disjoint from the first"
    val shifted = "X" + base // insertion at the front shifts every offset

    val input = MemoryStream[(Long, String)]
    @volatile var out = Vector.empty[(Long, Long, Long)] // (cfp, clen, first_doc)
    val q = StreamingDedup.cdcDedupStream(
      input.toDF().toDF("doc_id", "text"), table, buckets = 4,
      ckpt.toString,
      sink = (ds, _) => out ++= ds.collect().toVector
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1),
      compactEvery = 2L)

    def tableFiles(): Int = {
      val loc = new java.io.File(new java.net.URI(
        spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(table)).location.toString))
      loc.listFiles().count(_.getName.endsWith(".parquet"))
    }

    try {
      // batch 0: doc 3 duplicates doc 1 verbatim (in-batch) — every
      // chunk emits once, base chunks owned by doc 1 (min doc_id)
      input.addData((1L, base), (2L, other), (3L, base))
      q.processAllAvailable()
      out.map(_._1).toSet shouldBe (fpsOf(base) ++ fpsOf(other))
      out.filter(t => fpsOf(base).contains(t._1)).map(_._3).toSet shouldBe Set(1L)

      // batch 1: a front insertion in a re-sent document — fixed-size
      // blocks would all shift, but content-defined boundaries keep
      // every chunk after the disturbance, and those anti-join away
      // against the STATE (cross-batch sharing); only the genuinely
      // new prefix chunk(s) emit. Compaction runs after this batch.
      val expectedNew = fpsOf(shifted) -- fpsOf(base)
      expectedNew.size should be > 0
      expectedNew.size should be < cdcChunks(shifted).size // most survive
      val before = out.map(_._1).toSet
      input.addData((4L, shifted))
      q.processAllAvailable()
      out.map(_._1).toSet -- before shouldBe expectedNew
      tableFiles() should be <= 4 // compacted: one file per bucket

      // batch 2: verbatim resend AFTER compaction — zero new chunks
      val atCompact = out.size
      input.addData((5L, other))
      q.processAllAvailable()
      out.size shouldBe atCompact

      // the state is exactly the emitted fingerprint set
      spark.table(table).collect().map(_.getLong(0)).sorted shouldBe
        out.map(_._1).sorted.toArray
    } finally {
      q.stop()
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("continuous components: cross-batch merges resolve through the alias, " +
      "labels never rewrite, compaction folds the alias away") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val labels = "scc_labels"; val alias = "scc_alias"
    val ckpt = Files.createTempDirectory("graft-scc-ckpt")
    spark.sql(s"DROP TABLE IF EXISTS $labels")
    spark.sql(s"DROP TABLE IF EXISTS $alias")
    val input = MemoryStream[(Long, Long)]
    @volatile var merges = Vector.empty[(Long, Long)]
    val q = StreamingDedup.componentStream(
      input.toDF().toDF("u", "v"), labels, alias, buckets = 4,
      ckpt.toString,
      sink = ds => merges ++= ds.collect().toVector
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1))
    def resolved(): Map[Long, Long] =
      StreamingDedup.resolvedComponents(spark, labels, alias)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    try {
      // batch 0: two separate components
      input.addData((1L, 2L), (3L, 4L))
      q.processAllAvailable()
      merges.toSet shouldBe Set((2L, 1L), (4L, 3L))
      resolved() shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L)
      // batch 1: a bridge merges them — the OLD root 3 must re-root to
      // 1 via the alias, with no labels rewrite
      input.addData((2L, 3L))
      q.processAllAvailable()
      merges.toSet shouldBe Set((2L, 1L), (4L, 3L), (3L, 1L))
      resolved() shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L)
      // labels rows still carry their ORIGINAL append-time values
      spark.table(labels).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
        .apply(4L) shouldBe 3L
      // batch 2: a fresh pair attaches through an old member — 5 and 6
      // land in component 1 the batch they arrive
      input.addData((5L, 6L), (4L, 5L))
      q.processAllAvailable()
      resolved() shouldBe (1L to 6L).map(_ -> 1L).toMap
      // the final state equals the batch union-find over ALL edges
      val all = Seq((1L, 2L), (3L, 4L), (2L, 3L), (5L, 6L), (4L, 5L))
        .toDF("doc1", "doc2")
      val batchLabels = graft.operators.Dedup.componentLabels(spark, all)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      resolved() shouldBe batchLabels
      // the alias is FLAT: no dst ever appears as a src
      val a = spark.table(alias).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      a.map(_._2).toSet.intersect(a.map(_._1).toSet) shouldBe Set.empty
      // scheduled compaction folds the alias into labels; reads agree
      StreamingDedup.compactComponents(spark, labels, alias, 4)
      spark.table(alias).count() shouldBe 0L
      resolved() shouldBe batchLabels
    } finally {
      q.stop()
      spark.sql(s"DROP TABLE IF EXISTS $labels")
      spark.sql(s"DROP TABLE IF EXISTS $alias")
    }
  }

  test("streaming prefix join: in-batch and cross-batch pairs emit with exact " +
      "jaccard, the whole corpus folds into state, compaction keeps it") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val posts = "spj_posts"; val fps = "spj_fps"
    val ckpt = Files.createTempDirectory("graft-spjoin-ckpt")
    spark.sql(s"DROP TABLE IF EXISTS $posts")
    spark.sql(s"DROP TABLE IF EXISTS $fps")
    // 30-token docs with doc-distinct vocab: 28 distinct 3-shingles;
    // appending one token adds 1 shingle and keeps all 28 → jaccard
    // 28/29, comfortably over τ = 1/2; unrelated docs sit at 0
    def doc(prefix: String) = (0 until 30).map(i => s"$prefix$i").mkString(" ")
    val (a, b, c) = (doc("alpha"), doc("beta"), doc("gamma"))
    val input = MemoryStream[(Long, String)]
    @volatile var out = Vector.empty[(Long, Long, Double)]
    val q = StreamingDedup.prefixJoinStream(
      input.toDF().toDF("doc_id", "text"), posts, fps, buckets = 4,
      ckpt.toString,
      sink = (ds, _) => out ++= ds.collect().toVector
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._2)),
      compactEvery = 2L)
    try {
      // batch 0: 3 is a τ-pair of 1 IN-BATCH; 2 is unrelated
      input.addData((1L, a), (2L, b), (3L, a + " alphaX"))
      q.processAllAvailable()
      out.map(t => (t._1, t._2)) shouldBe Vector((1L, 3L))
      out.head._3 shouldBe 28.0 / 29.0 // |∩|=28, |∪|=29 — exact
      // batch 1: 5 pairs CROSS-BATCH with both 1 and 3; 4 is
      // unrelated. Compaction of both tables runs after this batch.
      input.addData((4L, c), (5L, a + " alphaY"))
      q.processAllAvailable()
      out.map(t => (t._1, t._2)) shouldBe
        Vector((1L, 3L), (1L, 5L), (3L, 5L))
      out(2)._3 shouldBe 28.0 / 30.0 // two 29-sets sharing 28
      // batch 2: a cross-batch match found AFTER the compaction
      input.addData((6L, b + " betaX"))
      q.processAllAvailable()
      out.map(t => (t._1, t._2)) shouldBe
        Vector((1L, 3L), (1L, 5L), (3L, 5L), (2L, 6L))
      // a JOIN, not a dedup: the WHOLE corpus folded into both tables
      spark.table(fps).select("doc_id").collect()
        .map(_.getLong(0)).sorted shouldBe Array(1L, 2L, 3L, 4L, 5L, 6L)
      spark.table(posts).select("doc_id").distinct().collect()
        .map(_.getLong(0)).sorted shouldBe Array(1L, 2L, 3L, 4L, 5L, 6L)
    } finally {
      q.stop()
      spark.sql(s"DROP TABLE IF EXISTS $posts")
      spark.sql(s"DROP TABLE IF EXISTS $fps")
    }
  }

  test("streaming NEAR-dup: banded state blocks tau-matches across batches, " +
      "folds and compaction keep both state tables") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val bands = "snd_bands"; val fps = "snd_fps"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sneardup-ckpt")
    spark.sql(s"DROP TABLE IF EXISTS $bands")
    spark.sql(s"DROP TABLE IF EXISTS $fps")
    // 30-token docs: appending one token keeps 28 of 29 shingles →
    // jaccard 28/29 ≈ 0.966, comfortably over τ=0.9; disjoint vocab
    // between different docs keeps unrelated jaccard at 0
    def doc(prefix: String) = (0 until 30).map(i => s"$prefix$i").mkString(" ")
    val (a, b, c, d) = (doc("alpha"), doc("beta"), doc("gamma"), doc("delta"))
    val input = MemoryStream[(Long, String)]
    @volatile var out = Vector.empty[Long]
    val q = StreamingDedup.nearDedupStream(
      input.toDF().toDF("doc_id", "text"), bands, fps, buckets = 4,
      ckpt.toString,
      sink = ds => out ++= ds.collect().map(_.getLong(0)).sorted,
      compactEvery = 2L)
    try {
      // batch 0: 3 is a near-dup of 1 (in-batch) → survivors 1, 2
      input.addData((1L, a), (2L, b), (3L, a + " alphaX"))
      q.processAllAvailable()
      out shouldBe Vector(1L, 2L)

      // batch 1: 5 near-dups STATE doc 2 → only 4 survives; compaction
      // of both state tables runs after this batch
      input.addData((4L, c), (5L, b + " betaX"))
      q.processAllAvailable()
      out shouldBe Vector(1L, 2L, 4L)

      // batch 2: 7 near-dups state (4), 8 near-dups 6 in-batch → 6 only;
      // state matches still block AFTER the compaction
      input.addData((6L, d), (7L, c + " gammaX"), (8L, d + " deltaX"))
      q.processAllAvailable()
      out shouldBe Vector(1L, 2L, 4L, 6L)

      // both state tables hold exactly the survivors
      spark.table(fps).select("doc_id").collect().map(_.getLong(0)).sorted shouldBe
        Array(1L, 2L, 4L, 6L)
      spark.table(bands).select("doc_id").distinct()
        .collect().map(_.getLong(0)).sorted shouldBe Array(1L, 2L, 4L, 6L)
      // 8 bands per doc
      spark.table(bands).count() shouldBe 32L

      // restarting over the same state with a DIFFERENT banding must
      // fail loudly — a silent mismatch would join incompatible band
      // keys and stop detecting near-dups entirely
      q.stop()
      val ckpt2 = java.nio.file.Files.createTempDirectory("graft-sneardup-ckpt2")
      val input2 = MemoryStream[(Long, String)]
      val q2 = StreamingDedup.nearDedupStream(
        input2.toDF().toDF("doc_id", "text"), bands, fps, buckets = 4,
        ckpt2.toString, sink = _ => (), nBands = 4, rowsPerBand = 4)
      try {
        input2.addData((99L, doc("omega")))
        intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q2.processAllAvailable()
        }
        // and the guard fired BEFORE any state mutation
        spark.table(fps).count() shouldBe 4L
      } finally q2.stop()
    } finally {
      q.stop()
      spark.sql(s"DROP TABLE IF EXISTS $bands")
      spark.sql(s"DROP TABLE IF EXISTS $fps")
    }
  }

  // ── chaos gates: mid-batch kill + restart over the checkpoint ────
  // The sink records every delivery under its batch id (the
  // idempotent-sink discipline the batchId parameter exists for) and
  // THROWS after recording the armed batch — the crash lands between
  // externalization and the state fold, the worst spot. The restarted
  // query replays the batch from the checkpoint; exactly-once =
  // multiplicity 1 per pair/chunk over the overwrite-by-batch view,
  // with the re-delivery proven bit-identical to the killed attempt.
  // Run under BOTH state-store providers (foreachBatch keeps no
  // operator state, but the offset/commit-log recovery machinery is
  // what the chaos exercises and the conf must not disturb it).

  private val hdfsProvider =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"

  private def withProvider(name: String)(body: String => Unit): Unit = {
    val prev = spark.conf.getOption(StateStores.ProviderKey)
    val cls = if (name == "rocksdb") StateStores.RocksDB else hdfsProvider
    StateStores.select(spark, cls)
    try body(name)
    finally prev match {
      case Some(v) => spark.conf.set(StateStores.ProviderKey, v)
      case None => spark.conf.unset(StateStores.ProviderKey)
    }
  }

  test("chaos: prefix-join mid-batch kill + restart keeps pair multiplicity 1 " +
      "under HDFS and RocksDB providers, even when the killed attempt folded") {
    import java.nio.charset.StandardCharsets.UTF_8
    import org.apache.spark.sql.functions.{col, expr}
    import spark.implicits._
    def doc(prefix: String) = (0 until 30).map(i => s"$prefix$i").mkString(" ")
    val (a, b) = (doc("alpha"), doc("beta"))
    Seq("hdfs", "rocksdb").foreach(withProvider(_) { prov =>
      val posts = s"cpj_${prov}_posts"; val fpsT = s"cpj_${prov}_fps"
      val dir = Files.createTempDirectory(s"graft-cpj-$prov-src")
      val ckpt = Files.createTempDirectory(s"graft-cpj-$prov-ckpt")
      spark.sql(s"DROP TABLE IF EXISTS $posts")
      spark.sql(s"DROP TABLE IF EXISTS $fpsT")
      def writeDocs(name: String, docs: (Long, String)*): Unit =
        Files.write(dir.resolve(name),
          docs.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
            .mkString("\n").getBytes(UTF_8))
      val byBatch = scala.collection.concurrent.TrieMap
        .empty[Long, Vector[(Long, Long)]]
      @volatile var deliveries = Vector.empty[(Long, Vector[(Long, Long)])]
      @volatile var armed = false
      val sink: (org.apache.spark.sql.DataFrame, Long) => Unit = (ds, bid) => {
        val pairs = ds.collect().toVector
          .map(r => (r.getLong(0), r.getLong(1))).sorted
        deliveries :+= (bid, pairs)
        byBatch(bid) = pairs // overwrite-by-batch: the idempotent sink
        if (armed && bid == 1L) { armed = false; sys.error("chaos kill") }
      }
      def start() = StreamingDedup.prefixJoinStream(
        spark.readStream.schema("doc_id LONG, text STRING")
          .json(dir.toString),
        posts, fpsT, buckets = 4, ckpt.toString, sink)
      try {
        writeDocs("b0.json", (1L, a), (2L, b), (3L, a + " alphaX"))
        val q1 = start()
        try {
          q1.processAllAvailable()
          byBatch(0L) shouldBe Vector((1L, 3L))
          // batch 1 pairs 5 with 1 and 3 cross-batch; the armed sink
          // records the delivery, then dies mid-batch
          writeDocs("b1.json", (5L, a + " alphaY"))
          armed = true
          intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
            q1.processAllAvailable()
          }
        } finally q1.stop()
        byBatch(1L) shouldBe Vector((1L, 5L), (3L, 5L))
        // worst corner: pretend the killed attempt ALSO completed its
        // state folds before dying (crash after append, before the
        // batch commit) — the replay must then meet its own persisted
        // copy and still emit the identical pair set exactly once
        val incB1 = graft.operators.Dedup.fpsOf(
            Seq((5L, a + " alphaY")).toDF("doc_id", "text"))
          .filter(expr("size(fps) > 0")).localCheckpoint(true)
        graft.operators.Bucketing.appendBucketAligned(
          graft.operators.Dedup.fixedOrderPrefix(incB1), posts)
        graft.operators.Bucketing.appendBucketAligned(incB1, fpsT)
        val q2 = start()
        try {
          q2.processAllAvailable() // replays batch 1 over the fold
          // the re-delivery is bit-identical to the killed attempt
          deliveries.filter(_._1 == 1L).map(_._2).distinct.size shouldBe 1
          deliveries.count(_._1 == 1L) shouldBe 2
          // cross-restart pairs still resolve (batch 2)
          writeDocs("b2.json", (6L, b + " betaX"))
          q2.processAllAvailable()
          byBatch(2L) shouldBe Vector((2L, 6L))
        } finally q2.stop()
        // THE gate: multiplicity 1 per pair over the idempotent view
        val all = byBatch.values.flatten.toVector
        all.groupBy(identity).values.foreach(_.size shouldBe 1)
        all.toSet shouldBe Set((1L, 3L), (1L, 5L), (3L, 5L), (2L, 6L))
        // the double fold is benign for pairs, and doc membership is
        // intact (doc 5's rows appear twice — the documented corner)
        spark.table(fpsT).select(col("doc_id")).distinct().collect()
          .map(_.getLong(0)).sorted shouldBe Array(1L, 2L, 3L, 5L, 6L)
      } finally {
        spark.sql(s"DROP TABLE IF EXISTS $posts")
        spark.sql(s"DROP TABLE IF EXISTS $fpsT")
      }
    })
  }

  test("chaos: CDC-dedup mid-batch kill + restart keeps chunk multiplicity 1 " +
      "under HDFS and RocksDB providers") {
    import java.nio.charset.StandardCharsets.UTF_8
    import org.apache.spark.unsafe.types.UTF8String
    def cdcChunks(text: String): Seq[String] = {
      val n = text.length
      val cuts = (8 to n).filter { i =>
        graft.functions.RollingHash.hash(
          UTF8String.fromString(text.substring(i - 8, i)), 31L) % 16 == 0
      }.filter(_ < n)
      val bounds = (0 +: cuts) :+ n
      bounds.sliding(2).map { case Seq(x, y) => text.substring(x, y) }.toSeq
    }
    def fpsOf(text: String): Set[Long] = cdcChunks(text)
      .map(c => graft.functions.RollingHash.hash2(UTF8String.fromString(c)))
      .toSet
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep dark forest before nightfall comes again"
    val other = "entirely different content words making a separate " +
      "document body so its chunk fingerprints are disjoint from the first"
    val shifted = "X" + base
    Seq("hdfs", "rocksdb").foreach(withProvider(_) { prov =>
      val table = s"ccdc_${prov}_state"
      val dir = Files.createTempDirectory(s"graft-ccdc-$prov-src")
      val ckpt = Files.createTempDirectory(s"graft-ccdc-$prov-ckpt")
      spark.sql(s"DROP TABLE IF EXISTS $table")
      def writeDocs(name: String, docs: (Long, String)*): Unit =
        Files.write(dir.resolve(name),
          docs.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
            .mkString("\n").getBytes(UTF_8))
      val byBatch = scala.collection.concurrent.TrieMap
        .empty[Long, Vector[Long]]
      @volatile var deliveries = Vector.empty[(Long, Vector[Long])]
      @volatile var armed = false
      val sink: (org.apache.spark.sql.DataFrame, Long) => Unit = (ds, bid) => {
        val cfps = ds.collect().toVector.map(_.getLong(0)).sorted
        deliveries :+= (bid, cfps)
        byBatch(bid) = cfps
        if (armed && bid == 1L) { armed = false; sys.error("chaos kill") }
      }
      def start() = StreamingDedup.cdcDedupStream(
        spark.readStream.schema("doc_id LONG, text STRING")
          .json(dir.toString),
        table, buckets = 4, ckpt.toString, sink)
      try {
        writeDocs("b0.json", (1L, base), (2L, other))
        val q1 = start()
        try {
          q1.processAllAvailable()
          byBatch(0L).toSet shouldBe (fpsOf(base) ++ fpsOf(other))
          // batch 1: a front insertion re-sends base — only the
          // disturbed prefix chunk(s) are new; the armed sink records
          // the increment, then dies before the state fold
          writeDocs("b1.json", (3L, shifted))
          armed = true
          intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
            q1.processAllAvailable()
          }
        } finally q1.stop()
        val expectedNew = fpsOf(shifted) -- fpsOf(base)
        byBatch(1L).toSet shouldBe expectedNew
        val q2 = start()
        try {
          q2.processAllAvailable() // replay: state unfolded → identical
          deliveries.filter(_._1 == 1L).map(_._2).distinct.size shouldBe 1
          deliveries.count(_._1 == 1L) shouldBe 2
          // a verbatim resend after the restart emits zero new chunks
          writeDocs("b2.json", (4L, other))
          q2.processAllAvailable()
          byBatch(2L) shouldBe Vector.empty
        } finally q2.stop()
        // multiplicity 1 per chunk over the idempotent view, and the
        // state folded each fingerprint exactly once despite the kill
        val all = byBatch.values.flatten.toVector
        all.groupBy(identity).values.foreach(_.size shouldBe 1)
        all.toSet shouldBe (fpsOf(base) ++ fpsOf(other) ++ expectedNew)
        spark.table(table).count() shouldBe
          spark.table(table).distinct().count()
        spark.table(table).collect().map(_.getLong(0)).toSet shouldBe all.toSet
      } finally {
        spark.sql(s"DROP TABLE IF EXISTS $table")
      }
    })
  }

  // ── the containment face's shared fixture: subset duplication that
  //    symmetric Jaccard MISSES (small ⊆ big at J ≈ 0.25) ──
  private def tokensOf(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")
  private val cS1 = tokensOf("s", 12) // 10 shingles
  private val cU = tokensOf("u", 30) // 28 shingles, unrelated to S1
  private val cB1 = tokensOf("p", 15) ++ cS1 ++ tokensOf("q", 15)
  private val cB2 = tokensOf("r", 15) ++ cS1 ++ tokensOf("t", 15)
  private val cS2 = cU.slice(9, 21) // 12 tokens lifted from U's middle
  private val cB3 = tokensOf("v", 15) ++ cS1 ++ tokensOf("w", 15)
  private val cDocs: Map[Long, Seq[String]] = Map(
    1L -> cS1, 2L -> cU, 3L -> cB1, 4L -> cB2, 5L -> cS2, 6L -> cB3)

  /** Independent brute-force recompute of the expected containment
    * pairs: scala shingle sets, (n, doc_id)-canonical orientation. */
  private def containmentExpected(ids: Set[Long]): Set[(Long, Long)] = {
    def sh(t: Seq[String]): Set[String] =
      t.sliding(3).map(_.mkString(" ")).toSet
    val sets = cDocs.toSeq.filter { case (id, _) => ids(id) }
      .map { case (id, t) => id -> sh(t) }
    (for {
      (ia, sa) <- sets
      (ib, sb) <- sets
      if Ordering[(Int, Long)].lt((sa.size, ia), (sb.size, ib))
      if sa.intersect(sb).size * 10 >= sa.size * 8
    } yield (ia, ib)).toSet
  }

  test("streaming containment: subset-duplication pairs emit in-batch, " +
      "cross-batch in BOTH orientations, survive compaction, and the " +
      "cumulative set equals a brute-force batch recompute") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val posts = "sct_posts"; val fps = "sct_fps"
    val ckpt = Files.createTempDirectory("graft-sctain-ckpt")
    spark.sql(s"DROP TABLE IF EXISTS $posts")
    spark.sql(s"DROP TABLE IF EXISTS $fps")
    val input = MemoryStream[(Long, String, String)]
    @volatile var out = Vector.empty[(Long, Long, Long, Long, Long, Double)]
    val q = StreamingDedup.containmentStream(
      input.toDF().toDF("doc_id", "lang", "text"), posts, fps, buckets = 4,
      ckpt.toString,
      sink = (ds, _) => out ++= ds.collect().toVector
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getDouble(5)))
        .sortBy(t => (t._1, t._2)),
      compactEvery = 2L)
    def feed(ids: Long*): Unit = {
      input.addData(ids.map(id => (id, "en", cDocs(id).mkString(" "))): _*)
      q.processAllAvailable()
    }
    try {
      // batch 0: S1 ⊆ B1 IN-BATCH; U unrelated (Jaccard(S1, B1) ≈ .25
      // — the symmetric faces would drop this pair at τ = 1/2)
      feed(1L, 2L, 3L)
      out.map(t => (t._1, t._2)) shouldBe Vector((1L, 3L))
      out.head._6 shouldBe 1.0 // all 10 of S1's shingles appear in B1
      out.head._4 shouldBe 10L
      // batch 1, BOTH cross-batch orientations: new big B2 ⊇ old
      // small S1, and new small S2 ⊆ OLD big U (the asymmetric
      // direction a pure new-vs-state small-side join would miss)
      feed(4L, 5L)
      out.map(t => (t._1, t._2)).toSet shouldBe
        Set((1L, 3L), (1L, 4L), (5L, 2L))
      // batch 2, after compaction: cross-batch match still resolves
      feed(6L)
      val got = out.map(t => (t._1, t._2)).toSet
      got shouldBe containmentExpected(cDocs.keySet)
      // the stream IS the batch answer: brute force over all 6 docs
      got should contain((1L, 6L))
    } finally {
      q.stop()
      spark.sql(s"DROP TABLE IF EXISTS $posts")
      spark.sql(s"DROP TABLE IF EXISTS $fps")
    }
  }

  test("chaos: containment-stream mid-batch kill + restart keeps pair " +
      "multiplicity 1 under HDFS and RocksDB providers, even when the " +
      "killed attempt folded") {
    import java.nio.charset.StandardCharsets.UTF_8
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    Seq("hdfs", "rocksdb").foreach(withProvider(_) { prov =>
      val posts = s"cct_${prov}_posts"; val fpsT = s"cct_${prov}_fps"
      val dir = Files.createTempDirectory(s"graft-cct-$prov-src")
      val ckpt = Files.createTempDirectory(s"graft-cct-$prov-ckpt")
      spark.sql(s"DROP TABLE IF EXISTS $posts")
      spark.sql(s"DROP TABLE IF EXISTS $fpsT")
      def writeDocs(name: String, ids: Long*): Unit =
        Files.write(dir.resolve(name),
          ids.map { id =>
            s"""{"doc_id":$id,"lang":"en","text":"${cDocs(id).mkString(" ")}"}"""
          }.mkString("\n").getBytes(UTF_8))
      val byBatch = scala.collection.concurrent.TrieMap
        .empty[Long, Vector[(Long, Long)]]
      @volatile var deliveries = Vector.empty[(Long, Vector[(Long, Long)])]
      @volatile var armed = false
      val sink: (org.apache.spark.sql.DataFrame, Long) => Unit = (ds, bid) => {
        val pairs = ds.collect().toVector
          .map(r => (r.getLong(0), r.getLong(1))).sorted
        deliveries :+= (bid, pairs)
        byBatch(bid) = pairs // overwrite-by-batch: the idempotent sink
        if (armed && bid == 1L) { armed = false; sys.error("chaos kill") }
      }
      def start() = StreamingDedup.containmentStream(
        spark.readStream.schema("doc_id LONG, lang STRING, text STRING")
          .json(dir.toString),
        posts, fpsT, buckets = 4, ckpt.toString, sink)
      try {
        writeDocs("b0.json", 1L, 2L, 3L)
        val q1 = start()
        try {
          q1.processAllAvailable()
          byBatch(0L) shouldBe Vector((1L, 3L))
          writeDocs("b1.json", 4L, 5L)
          armed = true
          intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
            q1.processAllAvailable()
          }
        } finally q1.stop()
        byBatch(1L) shouldBe Vector((1L, 4L), (5L, 2L))
        // worst corner: pretend the killed attempt ALSO completed its
        // state folds before dying — the replay must meet its own
        // persisted copies and still emit the identical pair set
        val incB1 = graft.operators.Dedup.containmentFpsOf(
            Seq((4L, "en", cDocs(4L).mkString(" ")),
              (5L, "en", cDocs(5L).mkString(" ")))
              .toDF("doc_id", "lang", "text"))
          .localCheckpoint(true)
        graft.operators.Bucketing.appendBucketAligned(
          incB1.select(col("doc_id"), col("lang"), col("n"),
            org.apache.spark.sql.functions.explode(col("fps")).as("fp")),
          posts)
        graft.operators.Bucketing.appendBucketAligned(incB1, fpsT)
        val q2 = start()
        try {
          q2.processAllAvailable() // replays batch 1 over the fold
          deliveries.filter(_._1 == 1L).map(_._2).distinct.size shouldBe 1
          deliveries.count(_._1 == 1L) shouldBe 2
          writeDocs("b2.json", 6L)
          q2.processAllAvailable()
          byBatch(2L) shouldBe Vector((1L, 6L))
        } finally q2.stop()
        // THE gate: multiplicity 1 per pair over the idempotent view,
        // and the set equals the brute-force batch recompute
        val all = byBatch.values.flatten.toVector
        all.groupBy(identity).values.foreach(_.size shouldBe 1)
        all.toSet shouldBe containmentExpected(cDocs.keySet)
        spark.table(fpsT).select(col("doc_id")).distinct().collect()
          .map(_.getLong(0)).sorted shouldBe Array(1L, 2L, 3L, 4L, 5L, 6L)
      } finally {
        spark.sql(s"DROP TABLE IF EXISTS $posts")
        spark.sql(s"DROP TABLE IF EXISTS $fpsT")
      }
    })
  }
}
