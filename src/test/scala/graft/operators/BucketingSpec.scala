package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{Tables, TestSpark}

/** Proves the co-location claim: a join of two tables bucketed on the
  * join key plans with NO shuffle exchange on either side, and returns
  * the same result as the plain (shuffling) join.
  */
class BucketingSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("incremental dedup against bucketed state: no exchange on the state side") {
    val sf = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions.{col, sha2}
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force the real SMJ anti-join (at 100 TB the state is never
    // broadcastable; the fixture must exercise the same plan)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val docs = Tables.documents(spark, sf)
      // accumulated state: hashes of the deterministic 3/4 of the
      // corpus, persisted bucketed+sorted by hash
      Bucketing.writeBucketed(
        docs.filter(col("doc_id") % 4 < 3)
          .select(sha2(col("text"), 256).as("body_sha256")).distinct(),
        "b_hash_state", "body_sha256", 4)
      val increment = docs.filter(col("doc_id") % 4 >= 3)
        .select(col("doc_id"), sha2(col("text"), 256).as("body_sha256"))

      val survivors = Dedup.incrementalAgainstState(spark, increment, "b_hash_state")
      val plan = survivors.queryExecution.executedPlan.toString
      plan should include("SortMergeJoin")
      // exactly ONE exchange in the whole plan — the increment side
      // aligning with the state bucketing; the state scan and the
      // keep-min window reuse that partitioning
      "Exchange hashpartitioning".r.findAllIn(plan).size shouldBe 1
      plan should not include "ShuffleExchange"

      // identical rows to the parquet-direct oracle-checked query
      val expected = graft.SparkEntry.queries("dedup_incremental")(spark, sf)
        .collect().map(_.toString).sorted
      survivors.orderBy(col("doc_id")).collect()
        .map(_.toString).sorted shouldBe expected
      expected.length should be > 0
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_hash_state")
    }
  }

  test("CDC chunk dedup against cfp-bucketed state: no exchange on the state side") {
    val sf = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions.col
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // at 100 TB the accumulated chunk state is never broadcastable;
    // the fixture must exercise the same SMJ anti-join plan
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val table = "b_cfp_state"
    try {
      val docs = Tables.documents(spark, sf).select("doc_id", "text")
      // accumulated state: chunk fps of the deterministic 3/4 of the
      // corpus, persisted bucketed by cfp
      Bucketing.writeBucketed(
        Dedup.cdcChunkFrame(docs.filter(col("doc_id") % 4 < 3))
          .select("cfp").distinct(),
        table, "cfp", 4)
      val increment = Dedup.cdcChunkFrame(docs.filter(col("doc_id") % 4 >= 3))

      val fresh = Dedup.cdcIncrementalAgainstState(spark, increment, table)
      val plan = fresh.queryExecution.executedPlan.toString
      plan should include("SortMergeJoin")
      // exactly ONE exchange — the increment's in-batch collapse
      // aligning with the state bucketing; the state scan and the
      // anti-join reuse that partitioning
      "Exchange hashpartitioning".r.findAllIn(plan).size shouldBe 1
      plan should not include "ShuffleExchange"

      // survivors match a direct recompute: batch fps minus state fps,
      // owner = min doc_id in the batch
      val stateFps = spark.table(table).collect().map(_.getLong(0)).toSet
      val expected = increment.collect()
        .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2)))
        .groupBy(_._3).map { case (cfp, rs) =>
          (cfp, rs.head._2, rs.map(_._1).min) }
        .filterNot { case (cfp, _, _) => stateFps.contains(cfp) }
        .toSeq.sortBy(_._1)
      fresh.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq shouldBe expected
      expected.length should be > 0
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("bucket-aligned fold + zero-exchange compaction keep the state-side no-shuffle property") {
    val sf = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions.{col, sha2}
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val table = "b_compact_state"
    try {
      val docs = Tables.documents(spark, sf)
      def hashes(pred: org.apache.spark.sql.Column) =
        docs.filter(pred).select(sha2(col("text"), 256).as("body_sha256")).distinct()
      // generation 0: state = hashes of half the corpus
      Bucketing.writeBucketed(hashes(col("doc_id") % 4 < 2), table, "body_sha256", 4)
      // fold in the next quarter bucket-aligned — the accumulated state
      // now equals the dedup_incremental oracle's state (doc_id % 4 < 3)
      Bucketing.appendBucketAligned(hashes(col("doc_id") % 4 === 2), table)

      def tableFiles(): Array[java.io.File] = {
        val loc = new java.io.File(new java.net.URI(
          spark.sessionState.catalog.getTableMetadata(
            org.apache.spark.sql.catalyst.TableIdentifier(table)).location.toString))
        loc.listFiles().filter(_.getName.endsWith(".parquet"))
      }
      // one file per bucket per generation
      tableFiles().length shouldBe 8

      val increment = docs.filter(col("doc_id") % 4 >= 3)
        .select(col("doc_id"), sha2(col("text"), 256).as("body_sha256"))
      val expected = graft.SparkEntry.queries("dedup_incremental")(spark, sf)
        .collect().map(_.toString).sorted

      // multi-file buckets still co-locate: exactly one exchange (the
      // increment side) and the oracle-checked survivor set — this also
      // proves the append really landed bucket-tagged (mis-bucketed
      // files would silently produce wrong rows here)
      val before = Dedup.incrementalAgainstState(spark, increment, table)
      "Exchange hashpartitioning".r
        .findAllIn(before.queryExecution.executedPlan.toString).size shouldBe 1
      before.collect().map(_.toString).sorted shouldBe expected

      // compact back to one file per bucket; capture the rewrite's
      // executed plan and prove it is exchange-free (scan→sort→write)
      @volatile var plans = List.empty[String]
      val listener = new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(f: String,
            qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
          plans = qe.executedPlan.toString :: plans
        override def onFailure(f: String,
            qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
      }
      spark.listenerManager.register(listener)
      val writePlan = try {
        Bucketing.compact(spark, table)
        // QueryExecutionListener delivery is async — poll for the write
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        def find() = plans.find(_.contains("Scan parquet"))
        var p = find()
        while (p.isEmpty && System.nanoTime() < deadline) { Thread.sleep(100); p = find() }
        p.getOrElse(fail("compaction write plan not captured"))
      } finally spark.listenerManager.unregister(listener)
      writePlan should not include "Exchange"

      tableFiles().length shouldBe 4

      // the zero-state-shuffle property survives compaction
      val after = Dedup.incrementalAgainstState(spark, increment, table)
      "Exchange hashpartitioning".r
        .findAllIn(after.queryExecution.executedPlan.toString).size shouldBe 1
      after.collect().map(_.toString).sorted shouldBe expected
      expected.length should be > 0
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"DROP TABLE IF EXISTS ${table}_compacting")
    }
  }

  test("near-dup band-key and fps state tables co-locate: one increment-side " +
      "exchange per join, zero on the state scans") {
    val sf = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions.col
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val all = Dedup.fpsOf(Tables.documents(spark, sf)).localCheckpoint(true)
      val stateFps = all.filter(col("doc_id") % 4 < 3)
      Bucketing.writeBucketed(Dedup.bandFrame(stateFps, 8, 2),
        "b_near_bands", Seq("band", "band_key"), 4)
      Bucketing.writeBucketed(stateFps, "b_near_fps", "doc_id", 4)
      val inc = all.filter(col("doc_id") % 4 >= 3).localCheckpoint(true)

      // candidates: increment bands against the bucketed band-key state
      val cand = Dedup.bandFrame(inc, 8, 2)
        .join(spark.table("b_near_bands"), Seq("band", "band_key"))
      val cp = cand.queryExecution.executedPlan.toString
      cp should include("SortMergeJoin")
      // the signature aggregation ran inside bandFrame's checkpoint, so
      // the ONLY hash exchange in this plan is the increment side
      // aligning with the state bucketing — the state scan has none
      "Exchange hashpartitioning".r.findAllIn(cp).size shouldBe 1

      // verify fetch: candidate doc_ids against the doc_id-bucketed fps
      val fetch = inc.select(col("doc_id"))
        .join(spark.table("b_near_fps"), Seq("doc_id"))
      val fp = fetch.queryExecution.executedPlan.toString
      fp should include("SortMergeJoin")
      "Exchange hashpartitioning".r.findAllIn(fp).size shouldBe 1

      // the REAL operator's plan: both state tables appear exactly once
      // as scans, and the total exchange count is pinned — every one of
      // them is on the increment/candidate side, so a regression that
      // re-shuffles a state scan (e.g. alias-propagation of the
      // bucketed partitioning breaking under a refactor or Spark
      // upgrade) shows up as a count increase here, not just in the
      // simplified sub-plans above
      val op = Dedup.nearIncrementalAgainstState(
        spark, inc, "b_near_bands", "b_near_fps")
      val opPlan = op.queryExecution.executedPlan.toString
      "Scan parquet".r.findAllIn(opPlan).size shouldBe 2
      // 14 = the increment-sized machinery (banding self-join, candidate
      // distinct, verify joins, union-distinct, anti-join) — measured
      // with the state sides proven exchange-free by the sub-plan gates
      "Exchange hashpartitioning".r.findAllIn(opPlan).size shouldBe 14

      // and the full incremental operator agrees with the in-query twin:
      // same survivors as dedup_incremental_near (state = doc_id%4<3)
      val survivors = op.collect().map(_.getLong(0)).sorted
      val expected = graft.SparkEntry.queries("dedup_incremental_near")(spark, sf)
        .collect().map(_.getLong(0)).sorted
      survivors shouldBe expected
      expected.length should be > 0
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_near_bands")
      spark.sql("DROP TABLE IF EXISTS b_near_fps")
    }
  }

  test("prefix-join posting state co-locates: batch-side exchange on the " +
      "probe only, zero on the state scans, pairs equal brute force") {
    val sf = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions.{col, expr}
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val all = Dedup.fpsOf(Tables.documents(spark, sf))
        .filter(expr("size(fps) > 0")).localCheckpoint(true)
      val stateFps = all.filter(col("doc_id") % 4 < 3).localCheckpoint(true)
      Bucketing.writeBucketed(Dedup.fixedOrderPrefix(stateFps),
        "b_pfx_posts", "fp", 4)
      Bucketing.writeBucketed(stateFps, "b_pfx_fps", "doc_id", 4)
      val inc = all.filter(col("doc_id") % 4 >= 3).localCheckpoint(true)
      val pref = Dedup.fixedOrderPrefix(inc).localCheckpoint(true)

      // the candidate probe: batch prefixes meet the fp-bucketed state
      // ON its bucketing — the only hash exchange is the batch side
      val cand = pref.as("i")
        .join(spark.table("b_pfx_posts").as("st"), col("i.fp") === col("st.fp"))
      val cp = cand.queryExecution.executedPlan.toString
      cp should include("SortMergeJoin")
      "Exchange hashpartitioning".r.findAllIn(cp).size shouldBe 1

      // the full operator: both state tables scan exactly once; the
      // state sides are proven exchange-free by the probe gate above
      val op = Dedup.prefixIncrementalAgainstState(
        spark, inc, "b_pfx_posts", "b_pfx_fps", incPrefix = Some(pref))
      val opPlan = op.queryExecution.executedPlan.toString
      "Scan parquet".r.findAllIn(opPlan).size shouldBe 2

      // and the pair set equals the brute-force quadratic over every
      // pair touching the increment (cross-batch ∪ in-batch)
      val fpsMap = all.collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
      val ids = fpsMap.keys.toSeq.sorted
      val isInc = (id: Long) => id % 4 >= 3
      val expected = (for {
        i <- ids; j <- ids if i < j && (isInc(i) || isInc(j))
        inter = (fpsMap(i) & fpsMap(j)).size
        if 3L * inter >= fpsMap(i).size + fpsMap(j).size
      } yield (i, j)).toSet
      expected should not be empty
      op.collect().map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe expected

      // at-least-once replay safety: fold the SAME batch into state and
      // re-run — a document now meets its own persisted copy, and the
      // doc-id inequality guard must keep the degenerate (A, A, 1.0)
      // pair out while every real pair still satisfies doc_a < doc_b
      Bucketing.writeBucketed(Dedup.fixedOrderPrefix(all),
        "b_pfx_posts_rp", "fp", 4)
      Bucketing.writeBucketed(all, "b_pfx_fps_rp", "doc_id", 4)
      val replay = Dedup.prefixIncrementalAgainstState(
          spark, inc, "b_pfx_posts_rp", "b_pfx_fps_rp",
          incPrefix = Some(pref))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      replay.foreach { case (a, b) => a should be < b }
      replay.toSet shouldBe expected
      // MULTIPLICITY, not just set equality: replay finds each pair in
      // both state orientations plus the in-batch branch — the output
      // distinct must collapse them to exactly one row per pair, or an
      // additive downstream fold triple-counts on every replay
      replay.length shouldBe expected.size
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_pfx_posts")
      spark.sql("DROP TABLE IF EXISTS b_pfx_fps")
      spark.sql("DROP TABLE IF EXISTS b_pfx_posts_rp")
      spark.sql("DROP TABLE IF EXISTS b_pfx_fps_rp")
    }
  }

  test("recoverCompaction finishes an interrupted drop-then-rename swap") {
    val sf = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions.{col, sha2}
    val table = "b_recover"
    try {
      Bucketing.writeBucketed(
        Tables.documents(spark, sf)
          .select(sha2(col("text"), 256).as("body_sha256")).distinct(),
        table, "body_sha256", 4)
      val expected = spark.table(table).count()
      expected should be > 0L
      // simulate a crash inside compact's swap window: the original is
      // gone, the complete data sits under the _compacting name
      spark.sql(s"ALTER TABLE $table RENAME TO ${table}_compacting")
      spark.catalog.tableExists(table) shouldBe false

      Bucketing.recoverCompaction(spark, table) shouldBe true
      spark.catalog.tableExists(table) shouldBe true
      spark.table(table).count() shouldBe expected
      // the recovered table still has its bucket spec — the property
      // every downstream co-located plan depends on
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table))
        .bucketSpec.map(_.numBuckets) shouldBe Some(4)
      // idempotent once recovered
      Bucketing.recoverCompaction(spark, table) shouldBe false
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"DROP TABLE IF EXISTS ${table}_compacting")
    }
  }

  test("compact preserves user table properties across the swap and crash recovery") {
    val sf = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions.{col, sha2}
    import org.apache.spark.sql.catalyst.TableIdentifier
    val table = "b_props"
    def props(): Map[String, String] =
      spark.sessionState.catalog.getTableMetadata(TableIdentifier(table))
        .properties
    try {
      Bucketing.writeBucketed(
        Tables.documents(spark, sf)
          .select(sha2(col("text"), 256).as("body_sha256")).distinct(),
        table, "body_sha256", 4)
      val expected = spark.table(table).count()
      spark.sql(
        s"ALTER TABLE $table SET TBLPROPERTIES ('graft.near.banding'='8x2')")

      // the normal path: the pin must ride through the CTAS+rename swap
      Bucketing.compact(spark, table)
      props().get("graft.near.banding") shouldBe Some("8x2")
      spark.table(table).count() shouldBe expected

      // the crash path the pin must also survive: compact dropped the
      // original but died before the rename — recoverCompaction renames
      // the _compacting table into place, and because compact copies
      // properties BEFORE the drop, the recovered table still carries
      // the pin (a property-less recovery would let a restart with
      // different banding be silently adopted)
      spark.sql(s"ALTER TABLE $table RENAME TO ${table}_compacting")
      Bucketing.recoverCompaction(spark, table) shouldBe true
      props().get("graft.near.banding") shouldBe Some("8x2")
      spark.table(table).count() shouldBe expected
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"DROP TABLE IF EXISTS ${table}_compacting")
    }
  }

  test("PQ ADC search over codes bucketed by vec_id: zero shuffle exchanges") {
    val sf = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions.col
    try {
      val (codes, books) = Similarity.pqPersistedModel(spark, sf)
      Bucketing.writeBucketed(Similarity.pqCodesLong(codes), "b_pq_codes", "vec_id", 4)
      val lut = Similarity.pqQueryLut(spark, sf, books)

      // bucketed codes: the (query_id, vec_id) aggregation inherits the
      // scan's vec_id partitioning (a subset of the grouping key), so
      // the WHOLE distance computation is exchange-free — at 10^9
      // vectors this shuffle is the search cost
      val bucketed = Similarity.pqAdcDistances(spark.table("b_pq_codes"), lut)
      val bp = bucketed.queryExecution.executedPlan.toString
      bp should include("BroadcastHashJoin")
      "Exchange hashpartitioning".r.findAllIn(bp).size shouldBe 0
      bp should not include "ShuffleExchange"

      // the plain parquet artifact pays exactly that one exchange
      val plain = Similarity.pqAdcDistances(Similarity.pqCodesLong(codes), lut)
      "Exchange hashpartitioning".r
        .findAllIn(plain.queryExecution.executedPlan.toString).size shouldBe 1

      // identical distances either way
      val key = (r: org.apache.spark.sql.Row) => r.toString
      bucketed.orderBy(col("query_id"), col("vec_id")).collect().map(key) shouldBe
        plain.orderBy(col("query_id"), col("vec_id")).collect().map(key)
      bucketed.count() should be > 0L
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_pq_codes")
    }
  }

  test("bucketed fact-fact join eliminates both shuffle exchanges") {
    val sf = "/root/testdata/sf0.001"
    // force a real sort-merge join (no broadcast shortcut at this SF)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(Tables.orders(spark, sf), "b_orders", "o_orderkey", 4)
      Bucketing.writeBucketed(
        Tables.lineitem(spark, sf).withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", "o_orderkey", 4)

      val joined = Bucketing.coLocatedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      plan should include("SortMergeJoin")
      plan should not include "ShuffleExchange"
      plan should not include "Exchange hashpartitioning"

      // same answer as the plain join (which does shuffle)
      val plain = Tables.orders(spark, sf).join(
        Tables.lineitem(spark, sf).withColumnRenamed("l_orderkey", "o_orderkey"),
        "o_orderkey")
      val plainPlan = plain.queryExecution.executedPlan.toString
      plainPlan should include("Exchange")
      joined.count() shouldBe plain.count()
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
