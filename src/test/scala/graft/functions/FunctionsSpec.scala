package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.functions.RollingHash.rolling_hash

class FunctionsSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("RollingHash matches the reference fold, interpreted and codegen'd") {
    import spark.implicits._
    def expected(s: String, prime: Long): Long =
      s.foldLeft(0L)((h, c) => (h * prime + c) % RollingHash.Mod)
    val inputs = Seq("", "a", "abc", "hello world", "Hebban olla vogala\r\n\t:)")
    val df = inputs.toDF("s")
      .select($"s", rolling_hash($"s").as("h31"), rolling_hash($"s", 131).as("h131"))
    df.collect().foreach { r =>
      r.getLong(1) shouldBe expected(r.getString(0), 31L)
      r.getLong(2) shouldBe expected(r.getString(0), 131L)
    }
    // 'abc' = ((97*31)+98)*31+99 = 96354 — the value the DuckDB oracle computes
    expected("abc", 31L) shouldBe 96354L
    // fused double-prime fingerprint == the two-expression formulation,
    // ASCII fast path and non-ASCII fallback alike
    val df2 = (inputs :+ "非ascii 文本 ±5°").toDF("s").select($"s",
      RollingHash.rolling_hash2($"s").as("h2"),
      (rolling_hash($"s", 31) + rolling_hash($"s", 131) * RollingHash.Mod).as("ref2"))
    df2.collect().foreach(r => r.getLong(1) shouldBe r.getLong(2))
    // null-safe
    Seq[Option[String]](None).toDF("s").select(rolling_hash($"s")).collect()
      .head.isNullAt(0) shouldBe true
  }

  test("SimHash60 equals the explode+60-vote-aggregate formulation") {
    import spark.implicits._
    // fixture docs (the real consumer) plus adversarial token arrays:
    // empty array (must be NULL — explode drops the doc), null element
    // (votes -1 on every bit, like the aggregate's otherwise(-1)),
    // single token, ties (vote 0 → bit clear)
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", graft.functions.TextTokens.tokens.as("tokens"))
    val viaExpr = docs
      .select($"doc_id", SimHash.simhash60($"tokens").as("simhash"))
      .filter($"simhash".isNotNull)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaAgg = {
      val votes = (0 until 60).map(b =>
        sum(when(expr(s"(fp >> $b) & 1") === 1, 1).otherwise(-1)).as(s"v$b"))
      docs.select($"doc_id", explode($"tokens").as("t"))
        .withColumn("fp", RollingHash.rolling_hash2($"t"))
        .groupBy($"doc_id").agg(votes.head, votes.tail: _*)
        .withColumn("simhash",
          (0 until 60).map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(0L))
            .reduce(_ + _))
        .select($"doc_id", $"simhash")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    viaExpr.nonEmpty shouldBe true
    viaExpr shouldBe viaAgg

    // edge cases the fixture can't produce
    val edge = Seq(
      (1L, Seq.empty[String]),          // -> null sketch
      (2L, Seq("onetoken")),
      (3L, Seq("a", "b"))               // mixed votes, possible ties
    ).toDF("doc_id", "tokens")
    val got = edge.select($"doc_id", SimHash.simhash60($"tokens").as("s"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    got(1L) shouldBe None
    // one token: sketch == the positive bits of its fingerprint
    val fp = RollingHash.hash2(org.apache.spark.unsafe.types.UTF8String.fromString("onetoken"))
    got(2L) shouldBe Some(fp & ((1L << 60) - 1))
    // null element votes -1 everywhere: with one real token the tie on
    // that token's set bits (+1-1=0) clears EVERY bit
    val withNull = Seq((4L, Seq(Some("onetoken"), None))).toDF("doc_id", "tokens")
    withNull.select(SimHash.simhash60($"tokens")).collect().head.getLong(0) shouldBe 0L
  }

  test("cosine/dot/norm agree with plain-Scala math") {
    import spark.implicits._
    val a = Array(1.0, 2.0, 3.0)
    val b = Array(-1.0, 0.5, 2.0)
    val df = Seq((a, b)).toDF("a", "b")
      .select(
        VectorFunctions.dot($"a", $"b").as("dot"),
        VectorFunctions.norm($"a").as("na"),
        VectorFunctions.cosine($"a", $"b").as("cos"))
    val r = df.collect().head
    r.getDouble(0) shouldBe (1.0 * -1.0 + 2.0 * 0.5 + 3.0 * 2.0)
    r.getDouble(1) shouldBe math.sqrt(14.0)
    val expCos = 6.0 / (math.sqrt(14.0) * math.sqrt(1 + 0.25 + 4.0))
    r.getDouble(2) shouldBe expCos +- 1e-12
  }

  test("LSH bucket is deterministic and within range") {
    import spark.implicits._
    val vecs = (0 until 20).map(i => Tuple1((0 until 8).map(j => (i * j % 7 - 3).toDouble).toArray))
    val df = vecs.toDF("emb")
      .select(VectorFunctions.lshBucket($"emb", nPlanes = 4, dim = 8).as("bucket"))
    val b1 = df.collect().map(_.getLong(0)).toSeq
    val b2 = df.collect().map(_.getLong(0)).toSeq
    b1 shouldBe b2
    all(b1) should (be >= 0L and be < 16L)
  }

  test("ANN (LSH + IVF) results are true cosine values and respect ranking") {
    val sf = "/root/testdata/sf0.001"
    val brute = graft.SparkEntry.queries("sim_topk_bruteforce")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val bruteTop = brute.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for (name <- Seq("sim_ann_lsh", "sim_ann_ivf")) {
      val ann = graft.SparkEntry.queries(name)(spark, sf).collect()
      ann.nonEmpty shouldBe true
      val cosByQuery = ann.groupBy(_.getAs[Long]("query_id"))
      cosByQuery.foreach { case (_, rows) =>
        val sims = rows.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Double]("cos_sim"))
        sims.sorted.reverse shouldBe sims // ranked descending
      }
      // sanity: ANN hits overlap the exact top-10 for at least one query
      val hits = ann.count(r =>
        bruteTop.getOrElse(r.getAs[Long]("query_id"), Set.empty)
          .contains(r.getAs[Long]("vec_id")))
      hits should be > 0
    }
  }

  test("Bloom filter: zero false negatives, bounded false positives") {
    import spark.implicits._
    // the sketch must reach might_contain as a constant (the same
    // driver-materialized shape Spark's runtime filters use)
    val bf = (0L until 1000L).toDF("k")
      .agg(Bloom.bloomFilterAgg($"k", 1000L, 16000L).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val res = (0L until 2000L).toDF("k")
      .select($"k", Bloom.mightContain(lit(bf), $"k").as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1))
    // the Bloom guarantee: every inserted key passes
    res.filter(_._1 < 1000L).foreach { case (k, hit) =>
      withClue(s"k=$k") { hit shouldBe true }
    }
    // ~16 bits/key → expected FPR well under 1%; allow 5% slack
    val fps = res.count { case (k, hit) => k >= 1000L && hit }
    fps should be < 50
  }

  test("multimodal decode: batch shape over real BMP payloads") {
    import spark.implicits._
    import graft.operators.Bmp
    val payloads = Seq(
      (1L, Bmp.encode(3, 2, i => (i, 2 * i, 3 * i))), // stride padding case
      (2L, Bmp.fromText(2L, "abcd")))
      .toDS()
    val out = graft.operators.Multimodal.decodePartitions(payloads)
      .collect().sortBy(_.doc_id)
    out.map(m => (m.width, m.height)) shouldBe Seq((3, 2), (8, 7))
    out.map(_.bpp) shouldBe Seq(24, 24)
    // file size = 54-byte header + height * 4-padded rows
    out.map(_.byte_len) shouldBe Seq(54L + 2 * 12, 54L + 7 * 24)
  }

  test("PqAdcSum matches the decimal reference fold and nulls every bad shape") {
    import spark.implicits._
    // random-ish but deterministic fixtures across sub/k geometries
    val cases = for {
      (nSub, k) <- Seq((1, 1), (4, 3), (8, 4), (8, 256))
      seed <- 1 to 3
    } yield {
      val lut = Array.tabulate(nSub * k)(i =>
        ((i.toLong * 2654435761L + seed * 97L) % 1000000007L))
      val codes = Array.tabulate(nSub)(s =>
        ((s * 31 + seed * 7) % k) + 1) // 1-based, always in range
      (codes.toSeq, lut.toSeq)
    }
    def reference(codes: Seq[Int], lut: Seq[Long]): Double = {
      val k = lut.length / codes.length
      val sum = codes.zipWithIndex
        .map { case (c, s) => lut(s * k + c - 1) }.sum
      java.math.BigDecimal.valueOf(sum, 9).doubleValue()
    }
    val df = cases.toDF("codes", "lut")
      .select($"codes", $"lut",
        graft.functions.VectorExprs.pqAdcSum($"codes", $"lut").as("d"))
    df.collect().zip(cases).foreach { case (r, (codes, lut)) =>
      r.getDouble(2) shouldBe reference(codes, lut)
    }
    // the value is exactly what SUM(DECIMAL(27,9)) cast to double gives
    val (c0, l0) = cases.head
    reference(c0, l0) shouldBe
      new java.math.BigDecimal(java.math.BigInteger.valueOf(
        l0(c0.head - 1)), 9).doubleValue()

    // bad shapes → null, never a silent partial sum: empty codes, LUT
    // length not a multiple, out-of-range (0-based or >k) codes
    val bad = Seq(
      (Seq.empty[Int], Seq(1L, 2L)),
      (Seq(1, 2), Seq(1L, 2L, 3L)),
      (Seq(0, 1), Seq(1L, 2L, 3L, 4L)),
      (Seq(3, 1), Seq(1L, 2L, 3L, 4L)))
    bad.toDF("codes", "lut")
      .select(graft.functions.VectorExprs.pqAdcSum($"codes", $"lut"))
      .collect().foreach(_.isNullAt(0) shouldBe true)
  }

  test("SpanCut equals the HOF filter/exists formulation it replaced, " +
      "including OVERLAPPING spans (union coverage)") {
    import spark.implicits._
    val cases: Seq[(Seq[String], Seq[(Long, Long)])] = Seq(
      // overlapping pair: [1,4) ∪ [3,6) covers {1..5} — a per-span
      // disjointness assumption would double-drop or mis-splice here
      (Seq("a", "b", "c", "d", "e", "f", "g", "h"), Seq((1L, 4L), (3L, 6L))),
      (Seq("a", "b", "c"), Seq.empty),                  // no spans: keep all
      (Seq("a", "b", "c"), Seq((0L, 3L))),              // cut everything
      (Seq("a", "b", "c", "d"), Seq((0L, 1L), (3L, 9L))), // hi past end
      (Seq("a", "b", "c", "d", "e"), Seq((1L, 2L), (1L, 4L))), // same lo
      (Seq.empty, Seq.empty),                           // empty doc
      (Seq("x"), Seq((5L, 7L))),                        // span beyond doc
      (Seq("a", null, "c"), Seq((2L, 3L))))             // null token kept
    val df = cases.zipWithIndex
      .map { case ((t, sp), i) => (i.toLong, t, sp) }
      .toDF("id", "tokens", "sp")
      .select($"id", $"tokens", expr(
        "transform(sp, x -> struct(x._1 as s_lo, x._2 as s_hi))").as("spans"))
      .localCheckpoint(true)
    val got = df
      .select($"id", SpanCut.span_cut($"tokens", $"spans").as("sc"))
      .select($"id", $"sc.n_kept", $"sc.clean_text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
      .sortBy(_._1)
    val hof = df
      .select($"id", expr(
        """transform(
             filter(transform(tokens, (t, i) -> struct(t as t, i as i)),
                    x -> not exists(spans, sp -> x.i >= sp.s_lo
                                             and x.i <  sp.s_hi)),
             x -> x.t)""").as("kept"))
      .select($"id",
        org.apache.spark.sql.functions.size($"kept").cast("long"),
        concat_ws(" ", $"kept"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
      .sortBy(_._1)
    got shouldBe hof
    // the overlap case, pinned by value: {1..5} cut from 8 tokens
    got(0) shouldBe (0L, 3L, "a g h")
    // null token: counted kept (size semantics), skipped in the join
    got(7) shouldBe (7L, 2L, "a")
  }
}
