package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** ANN index-quality gates computed from the PUBLIC query outputs (no
  * access to Similarity internals): recall@5 of each approximate path
  * against the exact brute-force top-5, on the sf0.001 fixture.
  *
  * The load-bearing assertion is the multiprobe gain: `sim_ann_ivf_probe`
  * (3 nearest cells) must strictly beat `sim_ann_ivf` (assignment cell
  * only) — the recall ceiling the single-cell search exhibits is the
  * reason the probe path exists.
  */
class SimilaritySpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** (query_id, vec_id) pairs of the top-5 rows of a ranked query. */
  private def top5(name: String): Set[(Long, Long)] =
    graft.SparkEntry.queries(name)(spark, sf)
      .select("query_id", "rnk", "vec_id").collect()
      .filter(_.getLong(1) <= 5)
      .map(r => (r.getLong(0), r.getLong(2))).toSet

  private lazy val exact = top5("sim_topk_bruteforce")

  private def recall(name: String): Double = {
    val found = top5(name)
    exact.count(found.contains).toDouble / exact.size
  }

  test("IVF multiprobe strictly beats single-cell recall and clears its floor") {
    val cell = recall("sim_ann_ivf")
    val probe = recall("sim_ann_ivf_probe")
    withClue(s"cell=$cell probe=$probe: ") {
      probe should be > cell
      // the oracle-asserted floors of sim_ann_recall, re-checked here
      // against an independently computed recall
      cell should be >= 0.25
      probe should be >= 0.50
    }
  }

  test("LSH multiprobe recall clears its floor") {
    recall("sim_ann_lsh") should be >= 0.18
  }

  test("filtered ANN: in-scan predicate clears its recall floor vs the " +
      "FILTERED brute-force top-5, where post-filtering provably misses") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // ground truth: brute-force top-5 restricted to the predicate
    // (label % 7 = 3, ~10% selective) — computed independently here,
    // no Similarity internals
    val e = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("emb"),
        $"label")
    val q = e.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"emb".as("qemb"))
    val dot = expr("aggregate(zip_with(qemb, emb, (a, b) -> a * b), " +
      "0D, (acc, x) -> acc + x)")
    val nrm = (c: String) => expr(s"sqrt(aggregate($c, 0D, " +
      s"(acc, x) -> acc + x * x))")
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")
    val truth = q.crossJoin(e.filter($"label" % 7 === 3))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("cos", dot / (nrm("qemb") * nrm("emb")))
      .withColumn("rnk", row_number().over(w)).filter($"rnk" <= 5)
      .select($"query_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the naive baseline: UNFILTERED top-5 then post-filter — at 10%
    // selectivity this keeps ~0.5 rows/query, so it MISSES results
    // the filtered index scan returns; that miss is the reason the
    // predicate belongs inside the scan
    val postFiltered = graft.SparkEntry.queries("sim_topk_bruteforce")(spark, sf)
      .select($"query_id", $"vec_id")
      .join(e.filter($"label" % 7 === 3).select($"vec_id"), Seq("vec_id"))
      .collect().map(r => (r.getLong(1), r.getLong(0))).toSet
    val got = graft.SparkEntry.queries("sim_ann_filtered")(spark, sf)
      .select($"query_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every returned row satisfies the predicate (by construction of
    // truth/got joins) and recall clears the probe-budget floor
    val rec = truth.count(got.contains).toDouble / truth.size
    info(s"filtered recall@5 = $rec; post-filter keeps " +
      s"${postFiltered.size} of ${truth.size} truth rows")
    withClue(s"recall=$rec: ") { rec should be >= 0.50 }
    // the post-filter baseline returns STRICTLY fewer rows than the
    // in-scan filter — the under-return the operator exists to fix
    postFiltered.size should be < got.size
    got.size should be > truth.size / 2
  }

  test("filtered IVF+PQ: the in-scan predicate + widened probes recover " +
      "the EXHAUSTIVE filtered ADC answer (the loss this operator " +
      "controls), where post-filtering the unfiltered top-5 provably " +
      "under-returns") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // ground truth for the PROBE loss: exhaustive filtered ADC — same
    // artifact, same codes, same LUT, ALL cells scanned. Exact-L2
    // truth would gate the QUANTIZER (the repo's sim_ivfpq_recall
    // already prices that: raw 16-bit codes on this near-uniform
    // fixture sit near 0.14 recall) — this operator owns the probe
    // plan and the predicate placement, so that is what it is held to.
    val (cells, _) = Similarity.ivfpqPersistedModel(spark, sf)
    val (_, books) = Similarity.pqPersistedModel(spark, sf)
    val lut = Similarity.pqQueryLutWide(spark, sf, books)
    val w = Window.partitionBy($"query_id").orderBy($"adist".asc, $"vec_id")
    val truth = cells.filter($"label" % 7 === 3)
      .crossJoin(broadcast(lut))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("adist",
        graft.functions.VectorExprs.pqAdcSum($"codes", $"lut"))
      .withColumn("rnk", row_number().over(w)).filter($"rnk" <= 5)
      .select($"query_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the naive baseline: the UNFILTERED IVFADC top-5, post-filtered
    val e = graft.Tables.embeddings(spark, sf).select($"vec_id", $"label")
    val postFiltered = graft.SparkEntry.queries("sim_ann_ivfpq")(spark, sf)
      .select($"query_id", $"vec_id")
      .join(e.filter($"label" % 7 === 3).select($"vec_id"), Seq("vec_id"))
      .collect().map(r => (r.getLong(1), r.getLong(0))).toSet
    val got = graft.SparkEntry.queries("sim_ann_ivfpq_filtered")(spark, sf)
      .select($"query_id", $"vec_id", $"label").collect()
      .map { r =>
        // every returned row satisfies the stored-attribute predicate
        r.getLong(2) % 7 shouldBe 3
        (r.getLong(0), r.getLong(1))
      }.toSet
    val rec = truth.count(got.contains).toDouble / truth.size
    info(s"filtered IVFADC recall@5 vs exhaustive filtered ADC = $rec " +
      s"(${got.size} returned); post-filter keeps ${postFiltered.size} " +
      s"of ${truth.size} truth rows")
    // 6-of-8 cells probed => the probe loss is bounded; measured 0.84
    // (sf0.001) on the deterministic fixture (0.48 at the unfiltered
    // 3-cell budget — the widening is what holds recall under the
    // predicate)
    withClue(s"recall=$rec: ") { rec should be >= 0.70 }
    // the full k comes back (the probed cells hold >= k passers) while
    // the post-filter baseline under-returns — the miss the in-scan
    // predicate exists to fix
    got.size shouldBe truth.size
    postFiltered.size should be < got.size
  }

  test("graph beam search clears the IVF-probe3 floor at a matched " +
      "probe budget and beats every cheaper ANN path here") {
    // measured 0.60 (sf0.001) / 0.64 (sf0.01) at ~171-185 scanned
    // candidates per query — the same budget as probe3's 3-of-8-cells
    // scan (~187/query); the floor is probe3's own 0.50, so the
    // navigable-graph path is held to the strongest baseline in the
    // suite (deterministic fixture: these are exact computations, no
    // drift). The beam's ranked output must also be internally
    // consistent: per query exactly 5 rows, ranked by (cos desc, id)
    val g = recall("sim_ann_graph")
    withClue(s"graph=$g: ") { g should be >= 0.50 }
    g should be >= recall("sim_ann_ivf")
    g should be >= recall("sim_ann_lsh")
    val rows = graft.SparkEntry.queries("sim_ann_graph")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (_, rs) =>
      rs.map(_._2).sorted.toSeq shouldBe (1L to 5L)
      // scores non-increasing with rank, ties broken by vec_id
      rs.sortBy(_._2).sliding(2).foreach { case Array(a, b) =>
        assert(a._4 > b._4 || (a._4 == b._4 && a._3 < b._3))
      case _ => ()
      }
    }
  }

  test("binary-quantization rerank clears its recall floor and beats " +
      "the prefilter's random baseline by an order of magnitude") {
    // measured 0.80 at sf0.001 / 0.72 at sf0.01 with C=50 of 500
    // candidates; the floor sits at 0.60 — far above the ~0.10 a
    // random 50-candidate prefilter would deliver — so a broken sign
    // plane or hamming ranking fails loudly while float-free slack
    // absorbs fixture regeneration
    recall("sim_binary_rerank") should be >= 0.60
  }

  test("prefix-dimension rerank clears its recall floor") {
    // measured 0.68 (sf0.001) / 0.76 (sf0.01) with a 32-dim prefix at
    // C=50; the floor sits at 0.56 — far above the ~0.10 random
    // prefilter. On this untrained fixture the prefix carries signal
    // ∝ dims (16 dims measured 0.44-0.64), which is exactly the case
    // for a trained-MRL deployment note, not a higher floor.
    recall("sim_prefix_rerank") should be >= 0.56
  }

  test("aggregator and window top-k forms are row-identical") {
    val agg = graft.SparkEntry.queries("sim_topk_bruteforce")(spark, sf).collect()
    val win = graft.SparkEntry.queries("sim_topk_window")(spark, sf).collect()
    agg.map(_.toString).toSeq shouldBe win.map(_.toString).toSeq
  }

  test("aggregator and window kNN forms are row-identical") {
    val agg = graft.SparkEntry.queries("sim_knn_classify")(spark, sf).collect()
    val win = graft.SparkEntry.queries("sim_knn_window")(spark, sf).collect()
    agg.map(_.toString).toSeq shouldBe win.map(_.toString).toSeq
  }

  test("IVF+PQ: the inverted-file layout prunes non-probed cells and answers from them") {
    import org.apache.spark.sql.functions.col
    val (cells, cents) = Similarity.ivfpqPersistedModel(spark, sf)

    // re-derive the probe plan in plain Scala from the persisted pieces
    val centroids = cents.collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
    val queries = graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 5).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val probesOf: Map[Long, Seq[Int]] = queries.map { case (q, emb) =>
      q -> centroids.toSeq.map { case (c, ce) => (l2(emb, ce), c) }
        .sortBy { case (dist, c) => (dist, c) }.take(3).map(_._2)
    }.toMap
    val probedCells = probesOf.values.flatten.toSet

    // the physical layout IS the inverted file: restricting to probed
    // cells is pure partition pruning — the executed scan opens only
    // those cells' files (and that must be a strict subset)
    val byCell = cells.inputFiles.groupBy { f =>
      "centroid_id=(\\d+)".r.findFirstMatchIn(f).map(_.group(1).toInt)
        .getOrElse(fail(s"unpartitioned cells file: $f"))
    }
    byCell.keySet.size should be > probedCells.size // something to prune
    val pruned = cells.filter(col("centroid_id").isin(probedCells.toSeq: _*))
    pruned.collect()
    val finalPlan = pruned.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scan = finalPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .getOrElse(fail("no file scan in the pruned cells plan"))
    val probedFiles = byCell.filter(kv => probedCells(kv._1)).values.map(_.length).sum
    scan.metrics("numFiles").value shouldBe probedFiles.toLong
    probedFiles should be < cells.inputFiles.length

    // the full query's plan carries the cell restriction as a
    // partition filter (metadata pruning), not a data filter
    val df = graft.SparkEntry.queries("sim_ann_ivfpq")(spark, sf)
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    formatted should include regex "PartitionFilters.*centroid_id"

    // and every answered neighbor lives in a cell its query probed
    val cellOf = cells.select("vec_id", "centroid_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = df.collect()
    rows.length shouldBe 25 // 5 queries x top-5
    rows.foreach { r =>
      val (q, rnk, v) = (r.getLong(0), r.getLong(1), r.getLong(2))
      withClue(s"query $q rank $rnk -> vec $v: ") {
        probesOf(q) should contain(cellOf(v))
      }
    }
  }

  test("IVF+PQ append: every appended row is the argmin cell and argmin codeword " +
      "against the frozen artifact") {
    import org.apache.spark.sql.functions.col
    def l2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val (_, centsDf) = Similarity.ivfpqPersistedModel(spark, sf)
    val (_, booksDf) = Similarity.pqPersistedModel(spark, sf)
    val cents = centsDf.collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toIndexedSeq).toMap
    val books = booksDf.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toIndexedSeq)
      .toMap
    val emb = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toIndexedSeq)
      .toMap
    def newVec(id: Long): IndexedSeq[Double] = {
      val a = emb(id - 1000000L); val b = emb(id - 1000000L + 1)
      a.zip(b).map { case (x, y) =>
        BigDecimal((x + y) / 2).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble }
    }
    val got = graft.SparkEntry.queries("sim_ivfpq_append")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    got.length shouldBe 10 * 8
    got.map(_._1).distinct.length shouldBe 10
    got.foreach { case (id, cell, sub, code) =>
      val v = newVec(id)
      val bestCell = cents.minBy { case (cid, ce) => (l2(v, ce), cid) }._1
      withClue(s"vec $id cell: ") { cell shouldBe bestCell }
      val sv = v.slice(sub * 8, sub * 8 + 8)
      val bestCode = books.collect { case ((s2, c2), ce) if s2 == sub => (c2, ce) }
        .minBy { case (c2, ce) => (l2(sv, ce), c2) }._1
      withClue(s"vec $id sub $sub code: ") { code shouldBe bestCode }
    }
  }

  test("retrain signal: a planted distribution shift trips rebuild_now; " +
      "the unshifted midpoint append does not") {
    import org.apache.spark.sql.functions._
    def signalOf(batch: org.apache.spark.sql.DataFrame) =
      Similarity.retrainSignal(spark, sf, batch).collect()
    val unshifted = signalOf(Similarity.midpointBatch(spark, sf))
    unshifted.length shouldBe 8
    // the calm case: same distribution, no flag of either kind
    all(unshifted.map(_.getAs[Boolean]("rebuild_now"))) shouldBe false
    all(unshifted.map(_.getAs[Boolean]("energy_flag"))) shouldBe false
    // the batch really was assigned (the signal is not vacuous)
    unshifted.map(_.getAs[Long]("n_new")).sum shouldBe 10L
    // planted shift: +1.0 on every component pushes each arriving
    // vector ~Dim further from every frozen centroid — the energy
    // flag must fire somewhere and flip the global verdict
    val shifted = signalOf(Similarity.midpointBatch(spark, sf)
      .select(col("vec_id"),
        transform(col("emb"), v => v + lit(1.0)).as("emb")))
    all(shifted.map(_.getAs[Boolean]("rebuild_now"))) shouldBe true
    shifted.map(_.getAs[Boolean]("energy_flag")).count(identity) should be >= 1
    // base-side columns are batch-invariant
    shifted.map(r => (r.getAs[Int]("centroid_id"), r.getAs[Long]("n_base"),
        r.getAs[Long]("base_d2u"))).toSeq shouldBe
      unshifted.map(r => (r.getAs[Int]("centroid_id"), r.getAs[Long]("n_base"),
        r.getAs[Long]("base_d2u"))).toSeq
  }

  test("sim_kmeanspar_init equals a sequential recompute of the " +
      "derandomized Bahmani rounds; the oversampling really fires") {
    val embs = graft.Tables.embeddings(spark, sf)
      .selectExpr("vec_id",
        "transform(embedding, x -> cast(x as double)) as emb")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val seedId = embs.keys.toSeq
      .minBy(id => (((id % 1000003) * 2654435761L) % 1000000007L, id))
    var cents = Vector(seedId -> 0L)
    for (r <- 1 to 3) {
      val d2u = embs.map { case (id, v) =>
        id -> math.floor(
          cents.map(c => l2(v, embs(c._1))).min * 1000000).toLong
      }
      val phi = d2u.values.sum
      val sampled = embs.keys.filter { id =>
        val h = ((id % 1000003 + r) * 2654435761L) % 1000000007L
        BigInt(h) * phi < BigInt(d2u(id)) * 16 * 1000000007L
      }.toSeq.sorted
      cents = cents ++ sampled.map(_ -> r.toLong)
    }
    val byCid = cents.toMap
    val weights = embs.keys.toSeq
      .groupBy { id =>
        cents.map { case (cid, _) => (l2(embs(id), embs(cid)), cid) }.min._2
      }
      .map { case (cid, ids) => cid -> ids.size.toLong }
    val expected = weights.toSeq.sorted
      .map { case (cid, w) => (cid, byCid(cid), w) }
    val got = graft.SparkEntry.queries("sim_kmeanspar_init")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldBe expected
    // the oversampling genuinely fired: beyond the single round-0 seed,
    // at least two rounds contributed centers, and every point is
    // accounted for exactly once in the weights
    got.count(_._2 == 0L) shouldBe 1
    got.map(_._2).distinct.size should be >= 3
    got.map(_._3).sum shouldBe embs.size.toLong
    got.size should be > 8 // more centers than k — the coreset property
  }

  test("sim_centroid_drift matches a direct two-cohort recompute and " +
      "same-distribution cohorts sit near cosine 1") {
    val embs = graft.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "label",
        "transform(embedding, x -> cast(x as double)) as emb")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getSeq[Double](2).toArray))
    def mean(vs: Seq[Array[Double]], pos: Int): Double = {
      val s0 = vs.map(v => BigDecimal.decimal(v(pos))
        .setScale(7, BigDecimal.RoundingMode.HALF_UP)).sum
      s0.toDouble / vs.length
    }
    def q12(x: Double): BigDecimal =
      BigDecimal.decimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val expected = embs.groupBy(_._2).map { case (lbl, g) =>
      val ref = g.filter(_._1 % 2 == 0).map(_._3).toSeq
      val cur = g.filter(_._1 % 2 == 1).map(_._3).toSeq
      val (d0, r2, c2) = (0 until 64).foldLeft(
        (BigDecimal(0), BigDecimal(0), BigDecimal(0))) {
        case ((d, r, c), p) =>
          val mr = mean(ref, p); val mc = mean(cur, p)
          (d + q12(mr * mc), r + q12(mr * mr), c + q12(mc * mc))
      }
      val cos = BigDecimal.decimal(d0.toDouble /
        (math.sqrt(r2.toDouble) * math.sqrt(c2.toDouble)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      (lbl, ref.length.toLong, cur.length.toLong, cos)
    }.toSeq.sortBy(_._1)
    val got = graft.SparkEntry.queries("sim_centroid_drift")(spark, sf)
      .collect().map(r => (r.getInt(0).toLong, r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    got shouldBe expected
    // on the zero-mean fixture the centroids are noise means, so the
    // honest baseline cosine is LOW — the gate pins validity ([-1,1],
    // populated cohorts) and that the measurement discriminates
    // across labels rather than asserting closeness the data doesn't
    // have
    got.foreach { case (l, nr, nc, cos) =>
      withClue(s"label $l:") {
        nr should be > 0L; nc should be > 0L
        cos should (be >= -1.0 and be <= 1.0)
      }
    }
    got.map(_._4).distinct.size should be > 1
  }

  test("sim_jl_project preserves pairwise distances within JL distortion " +
      "bounds and matches a direct matrix recompute") {
    val proj = graft.SparkEntry.queries("sim_jl_project")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toArray).toMap
    val orig = graft.Tables.embeddings(spark, sf)
      .selectExpr("vec_id",
        "transform(embedding, x -> cast(x as double)) as emb")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    proj.keySet shouldBe orig.keySet
    proj.values.foreach(_.length shouldBe 16)
    // direct recompute of one vector through the literal matrix
    val scale = math.sqrt(12.0 / 16)
    val id0 = orig.keys.min
    val expect0 = (0 until 16).map { j =>
      val dotv = (0 until 64).map(i =>
        orig(id0)(i) * graft.functions.VectorFunctions
          .planeComponent(4096 + j, i, 64)).sum
      BigDecimal.decimal(dotv * scale)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    proj(id0).toSeq shouldBe expect0
    // JL distortion over all pairs of the first 30 vectors: the
    // projected/original squared-distance ratio concentrates near 1
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ids = orig.keys.toSeq.sorted.take(30)
    val ratios = for {
      i <- ids.indices; j <- i + 1 until ids.length
    } yield d2(proj(ids(i)), proj(ids(j))) / d2(orig(ids(i)), orig(ids(j)))
    all(ratios) should (be > 0.15 and be < 2.5)
    val sorted = ratios.sorted
    val median = sorted(sorted.length / 2)
    median should (be > 0.7 and be < 1.3)
    ratios.count(r => r > 0.4 && r < 2.2).toDouble / ratios.size should
      be > 0.9
  }

  test("sim_kcenter_sample replays a sequential farthest-point traversal " +
      "and separations are non-increasing (the Gonzalez invariant)") {
    val rows = graft.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) as emb")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def r9(x: Double): Double = BigDecimal.decimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def l2(a: Array[Double], b: Array[Double]): Double =
      r9(a.indices.foldLeft(0.0)((s, i) =>
        s + (a(i) - b(i)) * (a(i) - b(i))))
    val byId = rows.toMap
    var picked = Vector((1L, 0L, 0.0))
    (2 to 6).foreach { r =>
      val cand = rows.filterNot(c => picked.exists(_._2 == c._1))
      val best = cand.map { case (id, em) =>
        (id, picked.map(p => l2(em, byId(p._2))).min)
      }.minBy { case (id, mind) => (-mind, id) }
      picked :+= ((r.toLong, best._1, best._2))
    }
    val got = graft.SparkEntry.queries("sim_kcenter_sample")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    got shouldBe picked
    // Gonzalez invariant: each pick is no farther out than the last
    got.drop(1).map(_._3).sliding(2).foreach {
      case Seq(a, b) => b should be <= a
      case _ => ()
    }
    // the traversal genuinely spreads: all six picks distinct, and
    // separations are strictly positive
    got.map(_._2).distinct.size shouldBe 6
    got.drop(1).foreach(_._3 should be > 0.0)
  }

  test("sim_mmr_rerank replays a sequential greedy MMR recompute and " +
      "genuinely diversifies away from the plain top-5") {
    val rows = graft.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) as emb")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def r9(x: Double): Double = BigDecimal.decimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos9(a: Array[Double], b: Array[Double]): Double = {
      def dot(x: Array[Double], y: Array[Double]) =
        x.indices.foldLeft(0.0)((s, i) => s + x(i) * y(i))
      r9(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
    }
    val byId = rows.toMap
    val expected = (0L until 5L).flatMap { qid =>
      val qe = byId(qid)
      val pool = rows.filter(_._1 != qid)
        .map { case (id, em) => (id, cos9(qe, em)) }
        .sortBy { case (id, rel) => (-rel, id) }.take(20)
      var picked = Vector.empty[(Long, Long, Double, Double, Double)]
      var rem = pool
      (1 to 5).foreach { pn =>
        val scored = rem.map { case (id, rel) =>
          val maxsim = if (picked.isEmpty) 0.0
            else picked.map(p => cos9(byId(id), byId(p._2))).max
          val score = if (pn == 1) r9(0.7 * rel)
            else r9(0.7 * rel - 0.3 * maxsim)
          (id, rel, maxsim, score)
        }
        val best = scored.minBy { case (id, _, _, sc) => (-sc, id) }
        picked :+= ((pn.toLong, best._1, best._2, best._3, best._4))
        rem = rem.filter(_._1 != best._1)
      }
      picked.map(p => (qid, p._1, p._2, p._3, p._4, p._5))
    }
    val got = graft.SparkEntry.queries("sim_mmr_rerank")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    got shouldBe expected
    // the diversifier works: some pick is NOT in the plain top-5
    val plain = (0L until 5L).flatMap { qid =>
      val qe = byId(qid)
      rows.filter(_._1 != qid).map { case (id, em) => (qid, id, cos9(qe, em)) }
        .sortBy { case (_, id, rel) => (-rel, id) }.take(5)
        .map(t => (t._1, t._2))
    }.toSet
    got.map(t => (t._1, t._3)).exists(!plain.contains(_)) shouldBe true
    // pick 1 is always the relevance leader (maxsim 0), and the
    // redundancy penalty genuinely engages (cosines can be negative on
    // this corpus, so the gate is on the max penalty, not each one)
    got.filter(_._2 == 1L).foreach(_._5 shouldBe 0.0)
    got.filter(_._2 > 1L).map(_._5).max should be > 0.0
  }

  test("sim_mips_topk equals a direct dot-product recompute, the " +
      "augmented-cosine route agrees, and MIPS order genuinely differs " +
      "from cosine order") {
    val rows = graft.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) as emb")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    def norm(a: Array[Double]): Double = math.sqrt(dot(a, a))
    val got = graft.SparkEntry.queries("sim_mips_topk")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getBoolean(6)))
    // the query's deterministic popularity weight on the item side
    val items = rows.map { case (id, emb) =>
      val w = 1.0 + (id % 7).toDouble * 0.1
      (id, emb.map(_ * w))
    }
    var diverges = false
    (0L until 5L).foreach { qid =>
      val qemb = rows.find(_._1 == qid).get._2
      val scored = items.filter(_._1 != qid)
        .map { case (id, emb) => (id, dot(qemb, emb)) }
      val byDot = scored.sortBy { case (id, dp) => (-dp, id) }
        .take(10).map(_._1).toSeq
      val byCos = scored
        .map { case (id, dp) =>
          (id, dp / (norm(qemb) * norm(items.find(_._1 == id).get._2))) }
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSeq
      val mine = got.filter(_._1 == qid).sortBy(_._2)
      mine.map(_._3).toSeq shouldBe byDot
      // the augmentation route lands on the same ids at every rank
      mine.foreach { t => withClue(s"q=$qid rnk=${t._2}: ") {
        t._6 shouldBe true; t._5 shouldBe t._3 } }
      // dot_sim is the rounded dot product of that pair
      mine.foreach { t =>
        val dp = scored.find(_._1 == t._3).get._2
        t._4 shouldBe BigDecimal.decimal(dp)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      if (byDot != byCos) diverges = true
    }
    // MIPS is a different problem than cosine search: at least one
    // query's dot-product top-10 differs from its cosine top-10
    diverges shouldBe true
  }

  test("hierarchical entry selection: on a 10x clustered fixture, " +
      "graph_hier recall >= flat recall at a matched probe budget") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // 5000 vectors (10x the sf fixture) in 8 well-separated clusters —
    // the regime hierarchical entries exist for: fixed global entries
    // land in arbitrary clusters and the beam pays a random-walk
    // prefix; cell-local entries start in the query's region.
    val dim = 64
    def mix(x: Long): Long = {
      var z = x + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def unit(seed: Long): Double = // deterministic in [-1, 1]
      (mix(seed) >>> 11).toDouble / (1L << 52).toDouble * 2.0 - 1.0
    val n = 5000
    val vecs: Map[Long, Array[Double]] = (0L until n.toLong).map { id =>
      val g = (id % 8).toInt
      id -> Array.tabulate(dim)(i =>
        unit(g * 1000L + i) + 0.15 * unit(id * 100000L + i))
    }.toMap
    val e = vecs.toSeq.sortBy(_._1)
      .map { case (id, a) => (id, (id % 8).toString, a.toSeq) }
      .toDF("vec_id", "label", "emb")
      .localCheckpoint(true)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < dim) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val exact10x: Set[(Long, Long)] = (0L until 5L).flatMap { q =>
      vecs.keys.filter(_ != q).toSeq
        .map(v => (v, cos(vecs(q), vecs(v))))
        .sortBy { case (v, c) => (-c, v) }.take(5)
        .map { case (v, _) => (q, v) }
    }.toSet
    def evalPath(res: (org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame)): (Double, Long) = {
      val found = res._1.filter(col("rnk") <= 5)
        .select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact10x.count(found.contains).toDouble / exact10x.size,
        res._2.count())
    }
    val (rFlat, scanFlat) = evalPath(Similarity.graphBeamSearch(spark, e))
    val (rHier, scanHier) = evalPath(Similarity.graphBeamSearchHier(spark, e))
    info(s"recall@5 flat=$rFlat ($scanFlat scanned), " +
      s"hier=$rHier ($scanHier scanned)")
    withClue(s"flat=$rFlat($scanFlat scanned) hier=$rHier($scanHier): ") {
      // matched budget: same entries/beam/rounds — scanned candidate
      // counts within 10% (the 8 centroid distances are metadata)
      scanHier.toDouble should be <= scanFlat * 1.1
      rHier should be >= rFlat
      rHier should be >= 0.50 // the sim_ann_recall gate, held at 10x
    }
  }

  test("range search on a clustered fixture: brute-force-equal results " +
      "while the triangle inequality prunes most cells") {
    import spark.implicits._
    // 8 well-separated clusters: a radius that captures same-cluster
    // neighbors keeps ~1 cell per query ball — the regime the
    // metric-tree bound exists for
    val dim = 64
    def mix(x: Long): Long = {
      var z = x + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def unit(seed: Long): Double =
      (mix(seed) >>> 11).toDouble / (1L << 52).toDouble * 2.0 - 1.0
    val n = 2000
    val vecs: Map[Long, Array[Double]] = (0L until n.toLong).map { id =>
      val g = (id % 8).toInt
      id -> Array.tabulate(dim)(i =>
        unit(g * 1000L + i) + 0.15 * unit(id * 100000L + i))
    }.toMap
    val e = vecs.toSeq.sortBy(_._1)
      .map { case (id, a) => (id, (id % 8).toString, a.toSeq) }
      .toDF("vec_id", "label", "emb")
      .localCheckpoint(true)
    val r2 = 2.0
    // sequential brute force with the query's exact rounding (round-9
    // HALF_UP over the same left-to-right double sum)
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val d = a(i) - b(i); s += d * d; i += 1 }
      BigDecimal(s).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expect = (0L until 5L).flatMap { q =>
      vecs.keys.filter(_ != q).toSeq
        .map(v => (q, v, d2(vecs(q), vecs(v))))
        .filter(_._3 <= r2)
    }.sortBy(t => (t._1, t._2))
    expect should not be empty
    @volatile var probes: Array[(Long, Long)] = Array.empty
    val got = Similarity.rangeSearch(
        Similarity.ivfModel(spark, e), r2,
        onProbes = df => probes = df.collect()
          .map(r => (r.getLong(0), r.getInt(1).toLong)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    got shouldBe expect
    // the pruning is real: across 5 queries x 8 cells, most cells are
    // skipped (clusters are far apart), yet the answer above is the
    // full brute-force set — pruning admitted no loss
    probes.length should be < 20
    probes.length should be >= 5 // every query keeps at least its own cell
  }

  test("range JOIN on a clustered fixture: brute-force-equal cross pairs " +
      "while the two-ball bound prunes most cell pairs") {
    import spark.implicits._
    val dim = 64
    def mix(x: Long): Long = {
      var z = x + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def unit(seed: Long): Double =
      (mix(seed) >>> 11).toDouble / (1L << 52).toDouble * 2.0 - 1.0
    val n = 2000
    // cluster by id/2 so every cluster holds BOTH parities — the
    // range-search fixture's id%8 clusters are single-parity and would
    // make the even↔odd cross-pair set vacuously empty
    val vecs: Map[Long, Array[Double]] = (0L until n.toLong).map { id =>
      val g = ((id / 2) % 8).toInt
      id -> Array.tabulate(dim)(i =>
        unit(g * 1000L + i) + 0.15 * unit(id * 100000L + i))
    }.toMap
    val e = vecs.toSeq.sortBy(_._1)
      .map { case (id, a) => (id, ((id / 2) % 8).toString, a.toSeq) }
      .toDF("vec_id", "label", "emb")
      .localCheckpoint(true)
    val r2 = 2.0
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val d = a(i) - b(i); s += d * d; i += 1 }
      BigDecimal(s).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expect = (for {
      a <- vecs.keys.toSeq if a % 2 == 0
      b <- vecs.keys.toSeq if b % 2 == 1
      dd = d2(vecs(a), vecs(b)) if dd <= r2
    } yield (a, b, dd)).sortBy(t => (t._1, t._2))
    expect should not be empty
    @volatile var cellPairs = 0
    val got = Similarity.rangeJoin(
        Similarity.ivfModel(spark, e), r2,
        onCellPairs = df => cellPairs = df.collect().length)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    got shouldBe expect
    // 8x8 = 64 cell pairs exist; well-separated clusters keep only the
    // same-cluster diagonal (plus a margin) — most pairs prune, yet the
    // answer above is the full brute-force cross-pair set
    cellPairs should be < 25
    cellPairs should be >= 1
  }

  test("persisted NSW-edge and IVF-model artifacts are bit-identical to " +
      "fresh builds and are REUSED, not rebuilt") {
    import spark.implicits._
    val e = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"label",
        $"embedding".cast("array<double>").as("emb"))
      .localCheckpoint(true)
    // bit-identity: the artifact IS a fresh build's output (the first
    // call may legitimately build on a clean machine)
    val freshEdges = Similarity.graphEdges(spark, e).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val persistedEdges = Similarity.graphEdgesFor(spark, sf, e)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    persistedEdges shouldBe freshEdges
    val (fa, fc) = Similarity.ivfModel(spark, e)
    val (pa, pc) = Similarity.ivfModelFor(spark, sf)
    def aset(df: org.apache.spark.sql.DataFrame) = df
      .select($"vec_id", $"centroid_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    aset(pa) shouldBe aset(fa)
    def cset(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getInt(0),
        r.getSeq[Double](1).toVector)).toSet
    cset(pc) shouldBe cset(fc)
    // reuse: a second call touches no artifact file
    val root = new java.io.File(
      s"${sys.props("java.io.tmpdir")}/graft_artifacts")
    def mtimes(): Map[String, Long] = root.listFiles().toSeq
      .filter(f => f.getName.startsWith("nsw_") || f.getName.startsWith("ivf_"))
      .flatMap(d => Option(d.listFiles()).toSeq.flatten :+ d)
      .map(f => f.getAbsolutePath -> f.lastModified()).toMap
    val before = mtimes()
    var rebuilt = false
    Similarity.graphEdgesFor(spark, sf, { rebuilt = true; e }).count()
    rebuilt shouldBe false // the eFresh thunk must stay unevaluated
    Similarity.ivfModelFor(spark, sf)._1.count()
    mtimes() shouldBe before
  }

  test("spark.graft.artifactsRoot relocates the whole artifact tier: " +
      "build lands under the custom root and reads back identical") {
    import spark.implicits._
    val custom = java.nio.file.Files
      .createTempDirectory("graft_custom_root").toString
    val e = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"label",
        $"embedding".cast("array<double>").as("emb"))
      .localCheckpoint(true)
    val defaultEdges = Similarity.graphEdgesFor(spark, sf, e)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.conf.set("spark.graft.artifactsRoot", custom)
    try {
      val customEdges = Similarity.graphEdgesFor(spark, sf, e)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      customEdges shouldBe defaultEdges // deterministic build, new home
      val installed = new java.io.File(custom).listFiles().toSeq
      installed.count(_.getName.startsWith("nsw_")) shouldBe 1
      // the IVF model honors the same root
      Similarity.ivfModelFor(spark, sf)._1.count()
      new java.io.File(custom).listFiles()
        .count(_.getName.startsWith("ivf_")) shouldBe 1
    } finally {
      spark.conf.unset("spark.graft.artifactsRoot")
      org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(custom))
      ()
    }
  }

  test("filtered graph ANN: predicate inside the beam walk clears its " +
      "recall floor vs FILTERED brute force, where post-filtering the " +
      "unfiltered walk provably under-returns") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // ground truth: brute-force top-5 restricted to the predicate
    // (label % 7 = 3, ~14% selective), computed independently
    val e = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("emb"),
        $"label")
    val q = e.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"emb".as("qemb"))
    val dot = expr("aggregate(zip_with(qemb, emb, (a, b) -> a * b), " +
      "0D, (acc, x) -> acc + x)")
    val nrm = (c: String) => expr(s"sqrt(aggregate($c, 0D, " +
      s"(acc, x) -> acc + x * x))")
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")
    val truth = q.crossJoin(e.filter($"label" % 7 === 3))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("cos", dot / (nrm("qemb") * nrm("emb")))
      .withColumn("rnk", row_number().over(w)).filter($"rnk" <= 5)
      .select($"query_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the naive baseline: the UNFILTERED hier walk's top-5, then
    // post-filter — at ~14% selectivity this keeps under one row per
    // query, the under-return the in-walk predicate exists to fix
    val postFiltered = graft.SparkEntry.queries("sim_ann_graph_hier")(spark, sf)
      .select($"query_id", $"vec_id")
      .join(e.filter($"label" % 7 === 3).select($"vec_id"), Seq("vec_id"))
      .collect().map(r => (r.getLong(1), r.getLong(0))).toSet
    val got = graft.SparkEntry.queries("sim_ann_graph_filtered")(spark, sf)
      .select($"query_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rec = truth.count(got.contains).toDouble / truth.size
    info(s"filtered-walk recall@5 = $rec (${got.size} returned); " +
      s"post-filter keeps ${postFiltered.size} of ${truth.size} truth rows")
    withClue(s"recall=$rec: ") { rec should be >= 0.50 }
    // the post-filter baseline returns STRICTLY fewer rows than the
    // filtered walk — the under-return the operator exists to fix
    postFiltered.size should be < got.size
    got.size should be > truth.size / 2
  }

  test("filtered range search on a clustered fixture: equals filtered " +
      "brute force while passer-only radii prune MORE cells than the " +
      "unfiltered scan") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dim = 64
    def mix(x: Long): Long = {
      var z = x + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def unit(seed: Long): Double =
      (mix(seed) >>> 11).toDouble / (1L << 52).toDouble * 2.0 - 1.0
    val n = 2000
    val vecs: Map[Long, Array[Double]] = (0L until n.toLong).map { id =>
      val g = (id % 8).toInt
      id -> Array.tabulate(dim)(i =>
        unit(g * 1000L + i) + 0.15 * unit(id * 100000L + i))
    }.toMap
    val e = vecs.toSeq.sortBy(_._1)
      .map { case (id, a) => (id, (id % 8).toString, a.toSeq) }
      .toDF("vec_id", "label", "emb")
      .localCheckpoint(true)
    val r2 = 2.0
    // predicate: only cluster "2" passes — 7 of 8 cells have NO
    // passers, so their radii rows vanish and queries outside cluster
    // 2 probe NOTHING (vs their own cell in the unfiltered scan)
    val pred = col("label") === "2"
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val d = a(i) - b(i); s += d * d; i += 1 }
      BigDecimal(s).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expect = (0L until 5L).flatMap { q =>
      vecs.keys.filter(v => v != q && v % 8 == 2).toSeq
        .map(v => (q, v, d2(vecs(q), vecs(v))))
        .filter(_._3 <= r2)
    }.sortBy(t => (t._1, t._2))
    expect should not be empty // query 2's same-cluster passers
    val model = Similarity.ivfModel(spark, e)
    @volatile var probesF: Array[(Long, Long)] = Array.empty
    val got = Similarity.rangeSearch(model, r2,
        onProbes = df => probesF = df.collect()
          .map(r => (r.getLong(0), r.getInt(1).toLong)),
        candPred = Some(pred))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    got shouldBe expect
    @volatile var probesU: Array[(Long, Long)] = Array.empty
    Similarity.rangeSearch(model, r2,
      onProbes = df => probesU = df.collect()
        .map(r => (r.getLong(0), r.getInt(1).toLong))).count()
    // the filtered probe set is a strict subset of the unfiltered one:
    // filtering never ADDS probes, and the empty-passer cells' probes
    // disappear (each query keeps its own cell unfiltered, so ≥ 5
    // probes there vs ~1 here)
    probesF.toSet.subsetOf(probesU.toSet) shouldBe true
    probesF.length should be < probesU.length
    info(s"probes: filtered ${probesF.length} vs unfiltered ${probesU.length}")
  }

  test("the filtered-search strategy trio is coherent on the fixture: " +
      "the chooser says 'pre' at ~12% selectivity, the in-scan " +
      "executor fills k for every query, and the post-filter executor " +
      "measurably under-returns — the cost model's verdict matches " +
      "what the two executors actually deliver") {
    import spark.implicits._
    val strat = graft.SparkEntry.queries("sim_filtered_strategy")(spark, sf)
      .select($"query_id", $"strategy").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    strat.keySet shouldBe (0L until 5L).toSet
    strat.values.foreach(_ shouldBe "pre")
    val preRows = graft.SparkEntry
      .queries("sim_ann_ivfpq_filtered")(spark, sf).count()
    val postRows = graft.SparkEntry
      .queries("sim_ann_ivfpq_postfilter")(spark, sf).count()
    preRows shouldBe 25L // 5 queries x k — the widened scan fills k
    withClue(s"post-filter returned $postRows of $preRows: ") {
      postRows should be < preRows
    }
  }

  test("adaptive probe budgets rescue the far-cell predicate the static " +
      "2x constant provably under-returns on: static scan finds ZERO " +
      "candidates, planner-driven scan equals the exhaustive filtered " +
      "ADC answer exactly") {
    // The failure mode the planner's scaladoc names (ACORN / the
    // big-ann filtered track): a predicate whose passers concentrate
    // in cells FAR from the query. Crafted fixture: 8 well-separated
    // clusters along one axis, queries (vec_id < 5) in cluster 0 —
    // then, from the BUILT index's own probe ranking, every passer
    // label is planted in the single farthest-ranked cell. The static
    // budget (6 of 8 cells, the 2x dial) scans only near cells and
    // returns nothing; the planner needs cum_pass >= k, so its budget
    // stretches to the far cell and the scan recovers the full
    // exhaustive filtered ADC top-5.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val dim = 64
    val perCluster = 30
    val fixDir = new java.io.File(
      System.getProperty("java.io.tmpdir"), "graft_farcell_fix")
    val d = fixDir.getAbsolutePath
    def writeFixture(passers: Set[Long]): Unit =
      (0 until 8).flatMap { c =>
        (0 until perCluster).map { i =>
          val vecId = (c * perCluster + i).toLong
          val emb = Array.tabulate(dim) { j =>
            val base = if (j == 0) c * 6.0f else 0.0f
            base + (((vecId * 31 + j) % 7).toFloat - 3f) * 0.05f
          }
          (vecId, emb.toSeq, if (passers.contains(vecId)) 1 else 0)
        }
      }.toDF("vec_id", "embedding", "label")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    // phase 1: unlabeled fixture -> build the index, read ITS probe
    // ranking, pick the farthest-ranked cell as the passer home
    writeFixture(Set.empty)
    val (cells0, cents0) = Similarity.ivfpqPersistedModel(spark, d)
    val ranking0 = Similarity.probeRanking(spark, d, cents0)
    val farCell = ranking0.filter(_._1 == 0L).maxBy(_._3)._2
    // adversarial by construction for EVERY query: the far cell sits
    // beyond the static budget in each query's own ranking
    ranking0.filter(_._2 == farCell).foreach { case (_, _, pr) =>
      pr should be > 6 // IvfNProbeFiltered
    }
    val passers = cells0.filter($"centroid_id" === farCell)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    passers.size should be >= 5
    // phase 2: same embeddings, passer labels planted — the rebuild is
    // deterministic on emb, so cells/centroids are bit-identical and
    // only the stored attribute changes
    writeFixture(passers)
    val pred = col("label") === 1
    val static = Similarity.ivfpqSearchWithBudgets(spark, d, pred,
      Map.empty) // empty map -> every query at the static floor
    static.count() shouldBe 0L
    val budgets = Similarity.adaptiveProbeBudgets(spark, d, pred)
    budgets.keySet shouldBe (0L until 5L).toSet
    budgets.values.foreach(_ should be > 6)
    val got = Similarity.ivfpqSearchWithBudgets(spark, d, pred, budgets)
      .select($"query_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exhaustive filtered ADC over ALL cells — the truth this operator
    // is held to (probe plan + predicate placement; the quantizer is
    // priced elsewhere)
    val (cells, _) = Similarity.ivfpqPersistedModel(spark, d)
    val (_, books) = Similarity.pqPersistedModel(spark, d)
    val lut = Similarity.pqQueryLutWide(spark, d, books)
    val w = Window.partitionBy($"query_id").orderBy($"adist".asc, $"vec_id")
    val truth = cells.filter(pred)
      .crossJoin(broadcast(lut))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("adist",
        graft.functions.VectorExprs.pqAdcSum($"codes", $"lut"))
      .withColumn("rnk", row_number().over(w)).filter($"rnk" <= 5)
      .select($"query_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    withClue(s"budgets=$budgets got=${got.size} truth=${truth.size}: ") {
      got shouldBe truth
    }
    info(s"far cell $farCell holds ${passers.size} passers; " +
      s"budgets=${budgets.toSeq.sortBy(_._1)}; static returned 0, " +
      s"adaptive matched exhaustive filtered ADC exactly (${got.size})")
  }

  test("the post-append serving view (sim_ann_ivfpq_extended) surfaces " +
      "appended vectors - at least one answer row is an appended id - " +
      "and searching the base cells alone under the same static budget " +
      "reproduces sim_ann_ivfpq_filtered row for row") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val got = graft.SparkEntry.queries("sim_ann_ivfpq_extended")(spark, sf)
      .collect()
    got.nonEmpty shouldBe true
    // non-vacuity: an appended near-duplicate passes the label
    // convention (vec_id % 7) and outranks base candidates somewhere -
    // the serving view genuinely reads the extension, not just the base
    got.exists(_.getLong(2) >= 1000000L) shouldBe true
    // every appended answer row carries the maintenance label convention
    got.filter(_.getLong(2) >= 1000000L)
      .foreach(r => r.getLong(3) shouldBe r.getLong(2) % 7)
    // base-only run of the same search core under the same static
    // budget == the static filtered face: the extension is the ONLY
    // difference between the two read paths
    val (cells, cents) = Similarity.ivfpqPersistedModel(spark, sf)
    val (_, books) = Similarity.pqPersistedModel(spark, sf)
    val baseOnly = Similarity.ivfpqSearchOnRanking(spark,
        cells.select($"vec_id", $"codes", $"label", $"centroid_id"),
        Similarity.pqQueryLutWideFor(spark,
          graft.Tables.embeddings(spark, sf).filter($"vec_id" < 5)
            .select($"vec_id",
              graft.functions.VectorFunctions.toDoubleArray($"embedding")
                .as("emb")),
          books),
        Similarity.probeRankingFor(spark, cents,
          graft.Tables.embeddings(spark, sf).filter($"vec_id" < 5)
            .select($"vec_id".as("query_id"),
              graft.functions.VectorFunctions.toDoubleArray($"embedding")
                .as("qemb"))),
        col("label") % 7 === 3, Map.empty)
      .select($"query_id", $"rnk", $"vec_id", $"label", $"adist")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        java.lang.Double.doubleToRawLongBits(r.getDouble(4)))).toSet
    val staticFace = graft.SparkEntry
      .queries("sim_ann_ivfpq_filtered")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        java.lang.Double.doubleToRawLongBits(r.getDouble(4)))).toSet
    baseOnly shouldBe staticFace
  }
}
