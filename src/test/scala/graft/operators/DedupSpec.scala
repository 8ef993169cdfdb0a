package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.functions.VectorFunctions

/** Scale-path equality and recall gates for the dedup operators: every
  * banded/blocked production plan must reproduce its quadratic oracle
  * face exactly, and the ANN shortcut must achieve 100% recall at
  * duplicate-grade cosine on planted near-duplicates.
  */
class DedupSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def rowsOf(name: String): Seq[Seq[Any]] =
    graft.SparkEntry.queries(name)(spark, sf)
      .collect().toSeq.map(_.toSeq)

  test("local union-find and distributed label propagation emit identical components") {
    import spark.implicits._
    // a graph with a chain (0-1-2-3), a triangle (10,11,12), a
    // 2-cycle-ish pair, and a star — shapes that exercise pointer
    // jumping and min-root selection
    val pairs = Seq(
      (0L, 1L), (1L, 2L), (2L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L),
      (30L, 31L), (30L, 32L), (30L, 33L), (31L, 33L))
      .toDF("doc1", "doc2").localCheckpoint(true)
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val local = sorted(Dedup.componentLabels(spark, pairs))
    val dist = sorted(Dedup.componentLabels(spark, pairs, localEdgeThreshold = 0L))
    local should not be empty
    local shouldBe dist
    // min-id canonicalization: every label is its component's min
    local.filter(_._1 <= 3L).map(_._2).distinct shouldBe Seq(0L)
    local.filter(v => v._1 >= 30L).map(_._2).distinct shouldBe Seq(30L)
  }

  test("fuzzy edit-distance dedup: planted revision passes, divergent " +
      "candidate is verify-rejected, window-disjoint docs never pair") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    // one substituted token: a candidate (39 shared windows) that the
    // levenshtein verify keeps (2 edited chars over ~290)
    val rev = base.replace("tok20 ", "tokXX ")
    // shares EXACTLY the first 8-token window with base, then
    // diverges: a candidate the verify must reject
    val div = ((1 to 8).map(i => s"tok$i") ++
      (1 to 60).map(i => s"zz$i")).mkString(" ")
    // no shared window: must never reach the verify
    val other = (1 to 40).map(i => s"other$i").mkString(" ")
    val docs = Seq((1L, base), (2L, rev), (3L, div), (4L, other))
      .toDF("doc_id", "text")
    val out = Dedup.fuzzyEditPairs(docs, 50).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    out.map(t => (t._1, t._2)) shouldBe Seq((1L, 2L))
    // the kept pair's distance is exactly the planted edit
    out.head._3 shouldBe 2L
    // the rejected candidate was REJECTED by the verify, not missed by
    // the candidate stage: at permille=1000 (accept everything) the
    // (1,3) and (2,3) pairs surface
    val all = Dedup.fuzzyEditPairs(docs, 1000).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    all should contain allOf ((1L, 3L), (2L, 3L))
    all.flatMap(t => Seq(t._1, t._2)) should not contain 4L
  }

  test("banded simhash pairs equal the quadratic oracle face") {
    val banded = rowsOf("dedup_simhash_pairs_banded")
    val quad = rowsOf("dedup_simhash_pairs")
    banded should not be empty
    banded shouldBe quad
  }

  test("block-partitioned embedding dedup equals the all-pairs oracle face") {
    val blocked = rowsOf("dedup_embedding_blocked")
    val exact = rowsOf("dedup_embedding_cosine")
    blocked should not be empty
    blocked shouldBe exact
  }

  test("ANN embedding dedup: 100% recall on planted near-duplicates") {
    import spark.implicits._
    val dim = 64
    // plant one near-duplicate per vector: dup = emb + 0.08 * noise,
    // noise from the same deterministic avalanche stream as the LSH
    // planes (keyed far away at 9000+vec_id) — cosine lands ~0.98
    val base = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", VectorFunctions.toDoubleArray($"embedding").as("emb"))
      .as[(Long, Array[Double])]
      .collect()
    val planted = base.map { case (id, emb) =>
      val dup = Array.tabulate(dim)(k =>
        emb(k) + 0.08 * VectorFunctions.planeComponent(9000 + id.toInt, k, dim))
      (id + 100000L, dup)
    }
    val all = (base ++ planted).toSeq.toDF("vec_id", "emb")

    val found = Dedup.embeddingAnnPairs(all, nBands = 16, bitsPerBand = 4,
        dim = dim, threshold = 0.9)
      .select($"vec1", $"vec2").as[(Long, Long)].collect().toSet

    // every planted (i, i+100000) pair has cos >= 0.9 by construction
    val expected = base.map { case (id, _) => (id, id + 100000L) }.toSet
    val missed = expected -- found
    withClue(s"missed ${missed.size} of ${expected.size} planted pairs: ") {
      missed shouldBe empty
    }
  }

  test("semantic dedup prunes exactly the in-cluster exact-cosine duplicates") {
    import spark.implicits._
    val sem = rowsOf("dedup_semantic") // (vec_id, centroid_id, leader, best_cos)
    sem should not be empty
    // independent recompute: the exact pair list comes from the
    // separately-oracled all-pairs query; a vector must be pruned iff
    // it is the larger id of an exact >=0.35 pair whose two vectors
    // landed in the same k-means cell
    val exact = rowsOf("dedup_embedding_cosine")
      .map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long])).toSet
    val cell = Similarity.ivfAssignedFor(spark, sf)
      .select($"vec_id", $"centroid_id").as[(Long, Int)].collect().toMap
    val expectedPruned = exact.collect {
      case (a, b) if cell(a) == cell(b) => b
    }
    sem.map(_(0).asInstanceOf[Long]).toSet shouldBe expectedPruned
    // every reported leader really is a smaller-id exact partner
    for (r <- sem) {
      val (v, leader) = (r(0).asInstanceOf[Long], r(2).asInstanceOf[Long])
      withClue(s"leader $leader of $v: ") { exact should contain((leader, v)) }
    }
  }

  test("prototype pruning drops exactly the top-quartile most-prototypical of each cluster") {
    // independent recompute of the keep/drop frontier from the query's
    // own per-vector scores: within every cluster the dropped set must
    // be exactly the ceil(25%) highest centroid-cosines (ties by
    // vec_id), never more, never a less-prototypical vector
    val rows = rowsOf("dedup_prototypes")
      .map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Int],
        r(2).asInstanceOf[Double], r(5).asInstanceOf[Boolean]))
    rows should not be empty
    rows.groupBy(_._2).foreach { case (cell, members) =>
      val dropTarget = math.ceil(0.25 * members.length).toLong
      val dropped = members.filterNot(_._4)
      withClue(s"cell $cell (${members.length} members): ") {
        dropped.length.toLong shouldBe dropTarget
        val byProto = members.sortBy { case (v, _, cos, _) => (-cos, v) }
        byProto.take(dropped.length).map(_._1).toSet shouldBe
          dropped.map(_._1).toSet
      }
    }
    // both sides of the frontier are populated on the fixture
    rows.count(_._4) should be > 0
    rows.count(!_._4) should be > 0
  }

  test("MinHash-LSH pairs recall 100% of true >=0.9-Jaccard pairs") {
    // the COVERAGE.md gate: banded MinHash (16 perms, 4 bands of 4) has
    // per-band collision prob j^4, so at duplicate-grade Jaccard >= 0.9
    // miss prob is (1-0.9^4)^4 ~ 1.4% per pair theoretical worst case —
    // this asserts the fixture's actual near-dups are all found
    val jacc = rowsOf("dedup_ngram_jaccard")
      .filter(_(2).asInstanceOf[Double] >= 0.9)
      .map(r => (r(0), r(1))).toSet
    val mh = rowsOf("dedup_minhash_pairs").map(r => (r(0), r(1))).toSet
    jacc should not be empty
    (jacc -- mh) shouldBe empty
  }

  test("incremental dedup: survivors are new content, first-of-hash, nothing missed") {
    import org.apache.spark.sql.functions.{col, sha2}
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), sha2(col("text"), 256).as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val stateHashes = docs.filter(_._1 % 4 < 3).map(_._2).toSet
    val batch = docs.filter(_._1 % 4 >= 3)
    val survivors = rowsOf("dedup_incremental")
      .map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[String]))
    survivors should not be empty
    // precision: no survivor's content exists in state, and each hash
    // survives exactly once
    survivors.foreach { case (_, h) => stateHashes should not contain h }
    survivors.map(_._2).distinct.size shouldBe survivors.size
    // recall: every batch doc is either a survivor, shadowed by state,
    // or shadowed by an earlier batch doc with the same hash
    val kept = survivors.toSet
    batch.foreach { case (id, h) =>
      val shadowed = stateHashes.contains(h) ||
        batch.exists { case (id2, h2) => h2 == h && id2 < id }
      kept.contains((id, h)) shouldBe !shadowed
    }
  }

  test("planted hot bucket: skew-bounded band join equals the plain self-join") {
    import spark.implicits._
    // one pathological bucket (200 rows share a band key — the
    // constant-document collapse), plus normal buckets of 1-3 rows and
    // ids co-bucketed under several keys (distinct-pair dedupe path)
    val rows =
      (0L until 200L).map(i => (i, 0L, "HOT")) ++
      (200L until 230L).map(i => (i, 1L, s"k${i % 10}")) ++
      // ids 0 and 1 also co-bucket under (1, k0): the (0,1) pair is
      // produced by two buckets and must dedupe to one row
      Seq((0L, 1L, "k0"), (1L, 1L, "k0"))
    val df = rows.toDF("doc_id", "band", "band_key").localCheckpoint(true)
    def pairsAt(cap: Long): Set[(Long, Long)] =
      Dedup.boundedBucketPairs(df, "doc_id", Seq("band", "band_key"), cap)
        .as[(Long, Long)].collect().toSet
    // cap 16 forces G = ceil(200/16) = 13 groups on the hot bucket;
    // cap 4096 takes the plain-join path — identical pair sets, and
    // both match a driver-side brute force
    val grouped = pairsAt(16L)
    val plain = pairsAt(4096L)
    val brute = rows.groupBy(r => (r._2, r._3)).values.flatMap { bucket =>
      val ids = bucket.map(_._1)
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }.toSet
    grouped.size shouldBe brute.size
    grouped shouldBe brute
    plain shouldBe brute
    // ordering contract: id1 < id2 on every row of the grouped path
    grouped.foreach { case (a, b) => a should be < b }
    // carry contract: payload columns ride side-consistently through
    // the id reorder on BOTH paths (doc_id*7 is checkable per side)
    val withPayload = df.withColumn("payload", $"doc_id" * 7L)
    Seq(16L, 4096L).foreach { cap =>
      val carried = Dedup.boundedBucketPairs(
          withPayload, "doc_id", Seq("band", "band_key"), cap,
          carry = Seq("payload"))
        .as[(Long, Long, Long, Long)].collect()
      carried.map(r => (r._1, r._2)).toSet shouldBe brute
      carried.foreach { case (id1, id2, p1, p2) =>
        p1 shouldBe id1 * 7L
        p2 shouldBe id2 * 7L
      }
    }
  }

  test("grouped skew path preserves the real banded-pair query end to end") {
    // maxBucket = 1 forces EVERY band bucket through the block-pair
    // scheduling (the hot-bucket path) on the actual fixture corpus —
    // the output must be byte-identical to the default plain-join plan
    def sorted(mb: Long) =
      Dedup.bandedSimhashPairs(spark, sf, maxBucket = mb)
        .orderBy(org.apache.spark.sql.functions.col("doc1"),
          org.apache.spark.sql.functions.col("doc2"))
        .collect().toSeq.map(_.toSeq)
    val grouped = sorted(1L)
    val plain = sorted(4096L)
    grouped should not be empty
    grouped shouldBe plain
  }

  test("ANN embedding dedup output is a subset of the exact pairs with high recall") {
    val exact = rowsOf("dedup_embedding_cosine").map(r => (r(0), r(1))).toSet
    val ann = rowsOf("dedup_embedding_ann_pairs").map(r => (r(0), r(1))).toSet
    ann should not be empty
    // verification step guarantees precision 1.0
    (ann -- exact) shouldBe empty
    // weak-threshold recall is documented best-effort; assert the floor
    val recall = (ann & exact).size.toDouble / exact.size
    recall should be >= 0.85
  }

  // ── CDC chunking: direct recompute + the shift-robustness property ──

  /** Single-threaded replica of the CDC mechanism (W=8, div 16). */
  private def cdcChunks(text: String): Seq[String] = {
    import org.apache.spark.unsafe.types.UTF8String
    val n = text.length
    val cuts = (8 to n).filter { i =>
      graft.functions.RollingHash.hash(
        UTF8String.fromString(text.substring(i - 8, i)), 31L) % 16 == 0
    }.filter(_ < n)
    val bounds = (0 +: cuts) :+ n
    bounds.sliding(2).map { case Seq(a, b) => text.substring(a, b) }.toSeq
  }

  test("dedup_cdc_chunks matches a direct single-threaded chunking recompute") {
    import org.apache.spark.unsafe.types.UTF8String
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val perDoc = docs.map { case (id, t) => id -> cdcChunks(t) }
    val fpDocs = perDoc.flatMap { case (id, cs) =>
      cs.map(c => graft.functions.RollingHash.hash2(UTF8String.fromString(c)) -> id)
    }.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val expected = perDoc.map { case (id, cs) =>
      val shared = cs.filter(c =>
        fpDocs(graft.functions.RollingHash.hash2(UTF8String.fromString(c))) >= 2)
      (id, cs.length.toLong, shared.length.toLong,
        shared.map(_.length.toLong).sum, cs.map(_.length.toLong).sum)
    }.sortBy(_._1).toSeq
    val got = rowsOf("dedup_cdc_chunks")
      .map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long],
        r(2).asInstanceOf[Long], r(3).asInstanceOf[Long], r(4).asInstanceOf[Long]))
    got.sortBy(_._1) shouldBe expected
    // non-vacuous: the fixture must actually share chunks somewhere
    expected.map(_._3).sum should be > 0L
  }

  test("CDC boundaries are content-defined: an insertion disturbs only its chunk") {
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep dark forest before nightfall comes again"
    val shifted = "X" + base // every fixed-offset block would change
    val a = cdcChunks(base)
    val b = cdcChunks(shifted)
    a.size should be > 3 // the probe must be long enough to chunk
    // all base chunks except those touching the insertion point
    // reappear verbatim in the shifted doc
    val bSet = b.toSet
    val surviving = a.count(bSet.contains)
    surviving should be >= a.size - 2
    // and concatenation invariants hold (chunking loses nothing)
    a.mkString shouldBe base
    b.mkString shouldBe shifted
  }

  /** (doc_id -> distinct shingle fp set) collected for brute-force
    * verification of the candidate-generation operators. */
  private def fpSets(sfDir: String): Map[Long, Set[Long]] =
    Dedup.fpsOf(graft.Tables.documents(spark, sfDir))
      .filter(org.apache.spark.sql.functions.size(col("fps")) > 0)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap

  test("prefix-filter join is LOSSLESS: equals the full quadratic Jaccard join at tau=1/2") {
    val fps = fpSets(sf)
    val ids = fps.keys.toSeq.sorted
    val expected = (for {
      i <- ids; j <- ids if i < j
      inter = (fps(i) & fps(j)).size
      if 3L * inter >= fps(i).size + fps(j).size // J >= 1/2
    } yield (i, j)).toSet
    val got = rowsOf("dedup_prefix_filter_join")
      .map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long])).toSet
    got shouldBe expected
    // non-vacuous at this SF: the fixture contains near-duplicates
    expected should not be empty
  }

  test("FS EM refit equals a direct recompute from the scored pairs and " +
      "re-fitted weights separate matched from unmatched agreement") {
    val scored = Dedup.fsScoredPairs(spark, sf).collect()
      .map(r => (r.getAs[Boolean]("g_lang"), r.getAs[Boolean]("g_first"),
        r.getAs[Boolean]("g_last"), r.getAs[Boolean]("g_len"),
        r.getAs[Long]("score_micro")))
    val nm = scored.count(_._5 > 3000000L).toLong
    val nu = scored.length - nm
    def w(am: Long, au: Long): (Long, Long) = {
      def q(x: Double) = BigDecimal(math.log(x))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .*(BigDecimal(1000000)).toLongExact
      (q((am + 1.0) * (nu + 2.0) / ((nm + 2.0) * (au + 1.0))),
        q((nm + 1.0 - am) * (nu + 2.0) / ((nm + 2.0) * (nu + 1.0 - au))))
    }
    val got = graft.SparkEntry.queries("dedup_fs_em")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val sel = Map[String, ((Boolean, Boolean, Boolean, Boolean, Long)) => Boolean](
      "lang" -> (_._1), "first" -> (_._2), "last" -> (_._3), "len" -> (_._4))
    sel.foreach { case (f, g) =>
      val am = scored.count(p => p._5 > 3000000L && g(p)).toLong
      val au = scored.count(p => p._5 <= 3000000L && g(p)).toLong
      val (wa, wd) = w(am, au)
      withClue(s"field $f: ") {
        got(f) shouldBe (nm, nu, am, au, wa, wd)
      }
    }
    nm should be > 0L
    nu should be > 0L
    // the refit is informative: at least one field's agreement weight
    // is positive (matched pairs agree more often than unmatched)
    got.values.map(_._5).max should be > 0L
  }

  test("PPJoin positional filter strictly prunes candidates at zero recall cost") {
    val docs = Dedup.fpsOf(graft.Tables.documents(spark, sf))
      .filter(expr("size(fps) > 0"))
      .withColumn("n", expr("cast(size(fps) as long)"))
      .localCheckpoint(true)
    def cands(positional: Boolean): Set[(Long, Long)] =
      Dedup.prefixFilterCandidates(spark, docs, positional)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val base = cands(positional = false)
    val pruned = cands(positional = true)
    // the positional bound must actually fire on this corpus…
    pruned.size should be < base.size
    pruned.subsetOf(base) shouldBe true
    // …and remain LOSSLESS: every true pair survives the pruning
    val fps = fpSets(sf)
    val ids = fps.keys.toSeq.sorted
    val truth = (for {
      i <- ids; j <- ids if i < j
      inter = (fps(i) & fps(j)).size
      if 3L * inter >= fps(i).size + fps(j).size
    } yield (i, j)).toSet
    truth should not be empty
    truth.subsetOf(pruned) shouldBe true
  }

  test("sorted-neighborhood pairs equal the rank-window candidate set verified at 0.05") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val ranked = docs.sortBy { case (id, lang, n) => (lang, n, id) }
      .map(_._1).zipWithIndex
    val fps = fpSets(sf)
    val expected = (for {
      (a, ra) <- ranked; (b, rb) <- ranked
      if rb - ra >= 1 && rb - ra <= 10
      fa <- fps.get(a); fb <- fps.get(b)
      inter = (fa & fb).size
      if inter * 20L >= fa.size + fb.size - inter // J >= 0.05
    } yield (a, b, (rb - ra).toLong)).toSet
    val got = rowsOf("dedup_sorted_neighborhood")
      .map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long],
        r(2).asInstanceOf[Long])).toSet
    got shouldBe expected
  }

  test("dedup_lsh_s_curve: endpoints, monotonicity, more bands dominate, " +
      "and values match the closed form") {
    val got = rowsOf("dedup_lsh_s_curve").map(r =>
      (r(0).asInstanceOf[Long], r(1).asInstanceOf[Double],
        r(2).asInstanceOf[Double], r(3).asInstanceOf[Double]))
    got.size shouldBe 21
    got.head._3 shouldBe 0.0; got.head._4 shouldBe 0.0
    got.last._3 shouldBe 1.0; got.last._4 shouldBe 1.0
    got.sliding(2).foreach { case Seq(a, b) =>
      b._3 should be >= a._3; b._4 should be >= a._4
    }
    got.foreach { case (_, s, p16, p4) =>
      p16 should be >= p4 // more bands, more collisions, pointwise
      val expect16 = BigDecimal.decimal(
        1.0 - math.pow(1.0 - math.pow(s, 4), 16))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      p16 shouldBe expect16 +- 1e-8 // closed form, pow-computed
    }
  }

  test("dedup_golden_record survivorship equals a direct per-cluster " +
      "recompute over the clustering query's own labels") {
    val labels = rowsOf("dedup_clusters")
      .map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long]))
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "lang", "source", "n_chars").collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getLong(3)))).toMap
    def majority(vs: Seq[String]): String =
      vs.groupBy(identity).toSeq
        .map { case (v, g) => (-g.size, v) }.min._2
    val expected = labels.groupBy(_._2).filter(_._2.size >= 2)
      .map { case (cl, g) =>
        val ms = g.map(_._1).sorted
        val fields = ms.map(docs)
        (cl, ms.size.toLong,
          majority(fields.map(_._1)), majority(fields.map(_._2)),
          fields.map(_._3).max,
          ms.map(id => (-docs(id)._3, id)).min(
            Ordering.Tuple2[Long, Long])._2)
      }.toSeq.sortBy(_._1)
    val got = rowsOf("dedup_golden_record")
      .map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long],
        r(2).asInstanceOf[String], r(3).asInstanceOf[String],
        r(4).asInstanceOf[Long], r(5).asInstanceOf[Long]))
    got shouldBe expected
    expected should not be empty
    // the vote is non-vacuous: some cluster mixes sources, so the
    // majority rule (not a constant) decided the golden value
    val mixed = labels.groupBy(_._2).filter(_._2.size >= 2).exists {
      case (_, g) => g.map(m => docs(m._1)._2).distinct.size > 1
    }
    mixed shouldBe true
  }

  test("large-star/small-star components equal union-find on graphs " +
      "where diameter hurts label propagation") {
    import spark.implicits._
    // a 100-node PATH (diameter 99 — the worst case the star scheme's
    // O(log²) convergence exists for), a star, a triangle with a tail,
    // and isolated-pairs — ids interleaved so min-roots aren't just
    // first-seen
    val path = (0 until 99).map(i => (200L + i, 201L + i))
    val star = (1 to 5).map(i => (100L, 100L + i))
    val triTail = Seq((50L, 51L), (51L, 52L), (50L, 52L), (52L, 53L))
    val pairsSeq = (path ++ star ++ triTail ++ Seq((7L, 9L))).reverse
    val pairs = pairsSeq.toDF("doc1", "doc2")
    val gotStar = Dedup.starComponentLabels(spark, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gotUf = Dedup.componentLabels(spark, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    gotStar shouldBe gotUf
    // ground truth: every path node labels 200, the star labels 100,
    // the tailed triangle labels 50, the pair labels 7
    (200L to 299L).foreach(n => gotStar(n) shouldBe 200L)
    (100L to 105L).foreach(n => gotStar(n) shouldBe 100L)
    (50L to 53L).foreach(n => gotStar(n) shouldBe 50L)
    gotStar(9L) shouldBe 7L
  }

  test("dedup_fs_linkage equals a full Fellegi-Sunter recompute and the " +
      "match set is non-trivial") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "lang", "source", "n_chars", "text").collect()
      .map { r =>
        val toks = r.getString(4).split(" ", -1)
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
          toks.head, toks.last)
      }
    val n = docs.length.toLong
    val uDen = n * (n - 1)
    def uNum[T](f: ((Long, String, String, Long, String, String)) => T): Long =
      docs.groupBy(f).values.map(g => g.size.toLong * (g.size - 1)).sum
    def w(m: Double, u: Long): Long =
      (BigDecimal.decimal(math.log(m * uDen.toDouble / u.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP) * 1000000).toLongExact
    val (ul, uf, ut, un) = (uNum(_._2), uNum(_._5), uNum(_._6), uNum(_._4))
    val weights = Map(
      ("lang", true) -> w(0.95, ul), ("lang", false) -> w(0.05, uDen - ul),
      ("ft", true) -> w(0.90, uf), ("ft", false) -> w(0.10, uDen - uf),
      ("lt", true) -> w(0.90, ut), ("lt", false) -> w(0.10, uDen - ut),
      ("len", true) -> w(0.85, un), ("len", false) -> w(0.15, uDen - un))
    val expected = (for {
      a <- docs; b <- docs
      if a._4 / 25 == b._4 / 25 && a._3 < b._3
    } yield {
      val (gl, gf, gt, gn) =
        (a._2 == b._2, a._5 == b._5, a._6 == b._6, a._4 == b._4)
      (a._1, b._1, gl, gf, gt, gn,
        weights(("lang", gl)) + weights(("ft", gf)) +
          weights(("lt", gt)) + weights(("len", gn)))
    }).filter(_._7 > 3000000L).sortBy(t => (t._1, t._2)).toSeq
    val got = graft.SparkEntry.queries("dedup_fs_linkage")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5),
        r.getLong(6))).toSeq
    got shouldBe expected
    got should not be empty
    // the scorer tolerates disagreement: some match has a false flag
    got.exists(t => !(t._3 && t._4 && t._5 && t._6)) shouldBe true
    // and full agreement scores strictly higher than any mixed match
    val full = got.filter(t => t._3 && t._4 && t._5 && t._6).map(_._7)
    val mixed = got.filterNot(t => t._3 && t._4 && t._5 && t._6).map(_._7)
    if (full.nonEmpty && mixed.nonEmpty) full.min should be > mixed.max
  }

  test("containment catches a whole-document quote that symmetric " +
      "Jaccard structurally misses, oriented small-into-big") {
    import spark.implicits._
    // doc 2 is doc 1's text quoted whole inside 3x more material:
    // containment(2 in 1... actually small=2's shingles ⊆ big=1)
    val short = "alpha beta gamma delta epsilon zeta eta theta"
    val long = s"one two three four five six seven eight nine ten $short " +
      "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen"
    val dir = java.nio.file.Files.createTempDirectory("graft-contain").toString
    Seq((1L, long, "en", "web", long.length.toLong),
        (2L, short, "en", "web", short.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("dedup_containment")(spark, dir)
      .collect()
    got.length shouldBe 1
    val r = got(0)
    (r.getLong(0), r.getLong(1)) shouldBe ((2L, 1L)) // small ⊆ big
    r.getLong(2) shouldBe r.getLong(3) // inter == n_small: fully contained
    r.getDouble(5) shouldBe 1.0
    // the symmetric detector at ITS working threshold scores this pair
    // far below duplicate grade: jaccard = n_small / n_big << 0.8
    val jac = r.getLong(2).toDouble /
      (r.getLong(3) + r.getLong(4) - r.getLong(2))
    jac should be < 0.4
  }
}
