package graft.operators

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{Tables, TestSpark}

/** Semantic gates for the scoring/selection pack: the oracles prove
  * engine parity; these prove intent against independent direct
  * recomputes, and exercise the sketch-pipeline paths (eviction) the
  * tiny fixture vocabulary cannot reach.
  */
class ScoringSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def toks(t: String): Array[String] =
    t.trim.toLowerCase.split("[ \\t\\n\\r\\f]+").filter(_.nonEmpty)

  private def bucket(term: String): Int =
    (graft.functions.RollingHash.hash(UTF8String.fromString(term), 31L) % 32L).toInt

  private lazy val docs: Array[(Long, String, String)] =
    Tables.documents(spark, sf).select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  test("llm_heavy_hitters equals the exact frequency filter (direct recompute)") {
    val all = docs.flatMap { case (_, _, t) => toks(t) }
    val n = all.length.toLong
    val expected = all.groupBy(identity).view
      .mapValues(_.length.toLong)
      .filter { case (_, c) => c * 65 > n }
      .toMap
    val got = graft.SparkEntry.queries("llm_heavy_hitters")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    got shouldBe expected
    expected should not be empty // the gate must gate something
  }

  test("MG candidates + exact recount stays exact under real eviction (cap < vocabulary)") {
    // 200-term alphabet vs cap=4: the sketch constantly evicts, yet the
    // two-pass pipeline must still produce exactly the true heavy set
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val stream = (1 to 300).map(_ => "hot") ++
      (1 to 200).map(_ => "warm") ++
      (0 until 200).flatMap(i => Seq.fill(2)(s"cold$i"))
    val df = stream.toDF("term").repartition(7) // force partial summaries
    val cap = 4
    val mg = udaf(new graft.functions.MisraGriesAggregator(cap))
    val sketch = df.agg(mg($"term").as("mg"), count(lit(1)).as("n_total"))
    val cands = sketch.select(explode($"mg.terms").as("term"), $"n_total")
    val got = df.join(broadcast(cands), Seq("term"))
      .groupBy($"term", $"n_total").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" * (cap + 1) > $"n_total")
      .select($"term", $"cnt")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = stream.length.toLong
    val expected = stream.groupBy(identity).view.mapValues(_.length.toLong)
      .filter { case (_, c) => c * (cap + 1) > n }.toMap
    got shouldBe expected
    expected.keySet shouldBe Set("hot", "warm")
  }

  test("llm_dsir_weights matches a direct recompute of the smoothed bucket log-ratios") {
    val B = 32
    val tokenBuckets = docs.map { case (id, lang, t) =>
      (id, lang, toks(t).map(bucket)) }
    val cr = new Array[Long](B)
    val ct = new Array[Long](B)
    tokenBuckets.foreach { case (_, lang, bs) =>
      bs.foreach { b => cr(b) += 1; if (lang == "en") ct(b) += 1 }
    }
    val nt = ct.sum.toDouble
    val nr = cr.sum.toDouble
    val lr: Array[BigDecimal] = Array.tabulate(B) { b =>
      BigDecimal(math.log(((ct(b) + 1.0) * (nr + B)) / ((cr(b) + 1.0) * (nt + B))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    val expected = tokenBuckets.map { case (id, lang, bs) =>
      id -> ((lang, bs.length.toLong, bs.map(lr).sum))
    }.toMap

    val got = graft.SparkEntry.queries("llm_dsir_weights")(spark, sf).collect()
    got.length shouldBe expected.size
    got.foreach { r =>
      val (lang, n, lw) = expected(r.getLong(0))
      withClue(s"doc ${r.getLong(0)}:") {
        r.getString(1) shouldBe lang
        r.getLong(2) shouldBe n
        r.getDouble(3) shouldBe lw.toDouble
        r.getBoolean(4) shouldBe (lw > 0)
      }
    }
    // the reweighting must separate the target slice: mean log-weight
    // of 'en' docs strictly above the non-'en' mean
    val (en, rest) = got.partition(_.getString(1) == "en")
    val mean = (xs: Array[org.apache.spark.sql.Row]) =>
      xs.map(_.getDouble(3)).sum / xs.length
    mean(en) should be > mean(rest)
  }

  test("llm_hash_classifier matches a direct recompute over the literal weights") {
    val w = Scoring.weightsMicro
    val expected = docs.map { case (id, lang, t) =>
      val ts = toks(t)
      id -> ((lang, ts.length.toLong, ts.map(x => w(bucket(x))).sum))
    }.toMap
    val got = graft.SparkEntry.queries("llm_hash_classifier")(spark, sf).collect()
    got.length shouldBe expected.size
    got.foreach { r =>
      val (lang, n, logit) = expected(r.getLong(0))
      withClue(s"doc ${r.getLong(0)}:") {
        r.getString(1) shouldBe lang
        r.getLong(2) shouldBe n
        r.getLong(3) shouldBe logit
        r.getBoolean(4) shouldBe (logit > 0)
      }
    }
    // weights must be two-sided, or the classifier degenerates
    w.exists(_ > 0) shouldBe true
    w.exists(_ < 0) shouldBe true
  }

  test("llm_bottomk_sample takes each language's k hash-smallest docs in order") {
    val k = 10
    val expected = docs.groupBy(_._2).view.mapValues { ds =>
      ds.map { case (id, _, _) => (id, ((id % 1000003L) * 2654435761L) % 1000000007L) }
        .sortBy { case (id, h) => (h, id) }.take(k).toList
    }.toMap
    val got = graft.SparkEntry.queries("llm_bottomk_sample")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byLang = got.groupBy(_._1)
    byLang.keySet shouldBe expected.keySet
    byLang.foreach { case (lang, rows) =>
      withClue(s"lang $lang:") {
        rows.sortBy(_._2).toList.map(t => (t._3, t._4)) shouldBe expected(lang)
        rows.map(_._2).toList.sorted shouldBe (1 to rows.length).map(_.toLong).toList
        rows.length shouldBe math.min(k, docs.count(_._2 == lang))
      }
    }
  }

  test("llm_weighted_sample takes each language's k smallest hash/weight priorities " +
      "and is genuinely length-biased") {
    val k = 10
    val withW = docs.map { case (id, lang, t) => (id, lang, toks(t).length.toLong) }
      .filter(_._3 >= 1)
    val expected = withW.groupBy(_._2).view.mapValues { ds =>
      ds.map { case (id, _, w) =>
        (id, (((id % 1000003L) * 2654435761L) % 1000000007L) * 1000000L / w, w)
      }.sortBy { case (id, pri, _) => (pri, id) }.take(k).toList
    }.toMap
    val got = graft.SparkEntry.queries("llm_weighted_sample")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byLang = got.groupBy(_._1)
    byLang.keySet shouldBe expected.keySet
    byLang.foreach { case (lang, rows) =>
      withClue(s"lang $lang:") {
        rows.sortBy(_._2).toList.map(t => (t._3, t._4)) shouldBe
          expected(lang).map { case (id, pri, _) => (id, pri) }
      }
    }
    // the weighting must matter: sampled docs skew longer than the corpus
    val sampledW = expected.values.flatten.map(_._3)
    val meanSampled = sampledW.sum.toDouble / sampledW.size
    val meanAll = withW.map(_._3).sum.toDouble / withW.size
    meanSampled should be > meanAll
    // and the sample differs from the UNWEIGHTED bottom-k (else the
    // weights were a no-op)
    val uw = graft.SparkEntry.queries("llm_bottomk_sample")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2))).toSet
    got.map(r => (r._1, r._3)).toSet should not equal uw
  }

  // ── Count-Min: the sketch guarantees, checked over EVERY term ──

  private def cmRow(fp: Long, a: Long, b: Long): Int =
    (((a * fp + b) % 1000000007L) % 64L).toInt

  /** Direct single-threaded Count-Min recompute over the fixture. */
  private def cmDirect(all: Seq[String]): (Map[(Int, Int), Long], Map[String, Long]) = {
    val hashes = Scoring.CmHashes
    val fps = all.map(t => graft.functions.RollingHash.hash(UTF8String.fromString(t), 31L))
    val counters = fps.flatMap { fp =>
      hashes.zipWithIndex.map { case ((a, b), r) => (r, cmRow(fp, a, b)) }
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val exact = all.groupBy(identity).view.mapValues(_.length.toLong).toMap
    (counters, exact)
  }

  test("count-min estimate is never below the true count, for EVERY term") {
    val all = docs.flatMap { case (_, _, t) => toks(t) }.toSeq
    val (counters, exact) = cmDirect(all)
    val hashes = Scoring.CmHashes
    exact.foreach { case (term, trueCnt) =>
      val fp = graft.functions.RollingHash.hash(UTF8String.fromString(term), 31L)
      val est = hashes.zipWithIndex.map { case ((a, b), r) =>
        counters((r, cmRow(fp, a, b)))
      }.min
      withClue(s"term '$term':") { est should be >= trueCnt }
    }
    // the gate must gate a COLLIDING sketch, not a trivially-injective
    // one: some row must map two distinct terms to the same counter
    // (birthday-certain for this vocabulary at W=64), i.e. per row the
    // occupied columns number fewer than the distinct fingerprints
    val fps = exact.keySet.map(t =>
      graft.functions.RollingHash.hash(UTF8String.fromString(t), 31L))
    val someRowCollides = hashes.zipWithIndex.exists { case ((a, b), _) =>
      fps.map(fp => cmRow(fp, a, b)).size < fps.size
    }
    someRowCollides shouldBe true
  }

  test("distributed counters equal the direct recompute and merge by addition") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val all = docs.flatMap { case (_, _, t) => toks(t) }.toSeq
    val (expected, _) = cmDirect(all)
    def countersOf(df: org.apache.spark.sql.DataFrame) =
      Scoring.cmCounters(df.withColumn("fp", graft.functions.RollingHash.rolling_hash($"term")))
        .collect().map(r => (r.getInt(0), r.getLong(1).toInt) -> r.getLong(2)).toMap
    val whole = countersOf(all.toDF("term").repartition(7))
    whole shouldBe expected
    // mergeability: sketch(half1) + sketch(half2) == sketch(whole)
    val (h1, h2) = all.splitAt(all.length / 2)
    val merged = (countersOf(h1.toDF("term")).toSeq ++ countersOf(h2.toDF("term")).toSeq)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    merged shouldBe whole
  }

  test("agg_cm_heavy_change: per-side estimates bound the true per-half " +
      "counts for EVERY probed term, and every output column replays " +
      "from an independent sketch recompute") {
    import org.apache.spark.sql.functions.{col, explode, sum, when}
    val got = graft.SparkEntry.queries("agg_cm_heavy_change")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    got.length shouldBe 20
    // exact per-half counts through the SAME tokenizer
    val exact = graft.Tables.documents(spark, sf)
      .select((col("doc_id") % 2).as("half"),
        explode(graft.functions.TextTokens.tokens).as("term"))
      .groupBy("term")
      .agg(sum(when(col("half") === 0L, 1L).otherwise(0L)).as("ca"),
        sum(when(col("half") === 1L, 1L).otherwise(0L)).as("cb"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // both halves' counters rebuilt locally from the exact counts
    val hashes = Scoring.CmHashes
    def fpOf(t: String): Long =
      graft.functions.RollingHash.hash(UTF8String.fromString(t), 31L)
    def colOf(fp: Long, a: Long, b: Long): Long =
      ((a * fp + b) % Scoring.CmMod) % Scoring.CmW
    def countersOfHalf(side: ((Long, Long)) => Long): Map[(Int, Long), Long] =
      exact.toSeq.flatMap { case (t, cc) =>
        hashes.zipWithIndex.map { case ((a, b), r) =>
          (r, colOf(fpOf(t), a, b)) -> side(cc)
        }
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val ctrA = countersOfHalf(_._1)
    val ctrB = countersOfHalf(_._2)
    got.foreach { case (term, dTrue, dEst, err) =>
      val (ca, cb) = exact(term)
      val estA = hashes.zipWithIndex.map { case ((a, b), r) =>
        ctrA.getOrElse((r, colOf(fpOf(term), a, b)), 0L) }.min
      val estB = hashes.zipWithIndex.map { case ((a, b), r) =>
        ctrB.getOrElse((r, colOf(fpOf(term), a, b)), 0L) }.min
      withClue(s"term '$term':") {
        dTrue shouldBe ca - cb
        dEst shouldBe estA - estB
        err shouldBe dEst - dTrue
        estA should be >= ca // each side keeps CM's one-sided bound
        estB should be >= cb
      }
    }
    // the probe set is exactly the exact top-20 by (|delta| desc, term)
    val top = exact.toSeq
      .map { case (t, (ca, cb)) => (t, ca - cb) }
      .sortBy { case (t, dl) => (-math.abs(dl), t) }
      .take(20).map(_._1)
    got.map(_._1).toSeq shouldBe top
  }

  test("llm_feature_hashing equals a direct fingerprint-routed recompute " +
      "and signs genuinely cancel") {
    import org.apache.spark.unsafe.types.UTF8String
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.flatMap { case (id, text) =>
      text.trim.toLowerCase.split("[ \\t\\n\\r\\f]+").filter(_.nonEmpty)
        .map { w =>
          val fp = graft.functions.RollingHash.hash(
            UTF8String.fromString(w), 31L)
          ((id, fp % 16L), if ((fp / 16L) % 2L == 0L) 1L else -1L)
        }
    }.groupBy(_._1).map { case ((id, dim), xs) =>
      (id, dim, xs.map(_._2).sum)
    }.toSeq.sortBy(r => (r._1, r._2))
    val got = graft.SparkEntry.queries("llm_feature_hashing")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldBe expected
    // the sign bit is live: positive, negative, and cancelled-to-zero
    // dimensions all occur on the fixture
    got.exists(_._3 > 0L) shouldBe true
    got.exists(_._3 < 0L) shouldBe true
    got.exists(_._3 == 0L) shouldBe true
  }
}
