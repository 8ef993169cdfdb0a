package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{Tables, TestSpark}

/** Semantic gates for text-analysis operators whose oracle proves
  * engine parity but not the intent — here, that `llm_vocab_coverage`
  * really builds the frequency-ranked vocabulary and counts OOV
  * occurrences per document.
  */
class TextAnalysisSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("vocab coverage matches a direct recompute of the top-K vocab and OOV rates") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def toks(t: String): Array[String] =
      t.trim.toLowerCase.split("[ \\t\\n\\r\\f]+").filter(_.nonEmpty)
    val tf = docs.flatMap { case (_, t) => toks(t) }
      .groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    val vocab = tf.toSeq.sortBy { case (w, n) => (-n, w) }.take(10).map(_._1).toSet
    val expected = docs.map { case (id, t) =>
      val ts = toks(t)
      id -> ((ts.length.toLong, ts.count(w => !vocab.contains(w)).toLong))
    }.toMap

    val got = graft.SparkEntry.queries("llm_vocab_coverage")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    got.length shouldBe expected.size
    got.foreach { case (id, n, oov, rate) =>
      val (en, eoov) = expected(id)
      withClue(s"doc $id:") {
        (n, oov) shouldBe ((en, eoov))
        rate shouldBe BigDecimal(eoov.toDouble / en)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
    // the vocab is a strict subset of the fixture vocabulary, so OOV
    // must actually occur — the gate is non-vacuous
    got.map(_._3).sum should be > 0L
  }

  test("llm_textrank matches a direct fixed-point power-iteration recompute") {
    val docs = Tables.documents(spark, sf).select("text").collect().map(_.getString(0))
    def toks(t: String): Array[String] =
      t.trim.toLowerCase.split("[ \\t\\n\\r\\f]+").filter(_.nonEmpty)
    // undirected adjacency edges with weights, self-loops dropped
    val directed = docs.flatMap { t =>
      val ts = toks(t)
      ts.zip(ts.drop(1)).filter { case (a, b) => a != b }
    }
    val edges = (directed ++ directed.map(_.swap))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val wsum = edges.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2).sum).toMap
    val nodes = edges.keys.map(_._1).toSet
    val n = nodes.size
    var r: Map[String, Long] = nodes.map(_ -> math.floor(1.0e9 / n).toLong).toMap
    val teleport = math.floor(0.15e9 / n).toLong
    for (_ <- 1 to 5) {
      val cs = edges.toSeq.map { case ((u, v), w) =>
        v -> math.floor(0.85 * r(u) * w / wsum(u)).toLong
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      r = cs.map { case (v, c) => v -> (teleport + c) }
    }
    val expected = r.toSeq.sortBy { case (t, rn) => (-rn, t) }.take(25)
    val got = graft.SparkEntry.queries("llm_textrank")(spark, sf).collect()
      .map(row => (row.getString(0), row.getLong(1))).toSeq
    got shouldBe expected
    // ranks must differentiate (a constant vector would mean the graph
    // degenerated and the power iteration did nothing)
    got.map(_._2).distinct.size should be > 5
  }

  test("dup spans reconstruct a planted cross-doc duplicate exactly") {
    import spark.implicits._
    // doc 1: 20 unique tokens, the shared 30-token run, 10 unique; the
    // run starts at token 20. doc 2: 5 unique tokens, the same run at
    // token 5, 15 unique. doc 3: fully unique. All filler tokens are
    // doc-distinct, so no 8-token window outside the run can repeat.
    val shared = (0 until 30).map(i => s"s$i").mkString(" ")
    val d1 = ((0 until 20).map(i => s"a$i") :+ shared) ++
      (0 until 10).map(i => s"z$i")
    val d2 = ((0 until 5).map(i => s"b$i") :+ shared) ++
      (0 until 15).map(i => s"y$i")
    val d3 = (0 until 60).map(i => s"c$i")
    val docs = Seq(
      (1L, d1.mkString(" ")), (2L, d2.mkString(" ")), (3L, d3.mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextAnalysis.dupSpans(docs, 12).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // maximal spans are EXACTLY the planted runs: right start, right
    // length, no bleed into the unique filler on either side
    got shouldBe Seq((1L, 20L, 30L), (2L, 5L, 30L))
  }

  test("dup-span removal cuts the planted duplicate from the non-canonical " +
      "doc only; unique content and the canonical copy survive byte-exact") {
    import spark.implicits._
    val shared = (0 until 30).map(i => s"s$i").mkString(" ")
    val d1 = ((0 until 20).map(i => s"a$i") :+ shared) ++
      (0 until 10).map(i => s"z$i")
    val d2 = ((0 until 5).map(i => s"b$i") :+ shared) ++
      (0 until 15).map(i => s"y$i")
    val d3 = (0 until 60).map(i => s"c$i")
    val docs = Seq(
      (1L, d1.mkString(" ")), (2L, d2.mkString(" ")), (3L, d3.mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextAnalysis.dupSpansApply(docs, 12).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    // doc 1 is the canonical (min doc_id) owner: untouched
    got(0) shouldBe (1L, 60L, 60L, d1.mkString(" "))
    // doc 2 loses EXACTLY the 30-token run; its unique prefix/suffix
    // splice back together byte-exact
    val d2clean = ((0 until 5).map(i => s"b$i") ++
      (0 until 15).map(i => s"y$i")).mkString(" ")
    got(1) shouldBe (2L, 50L, 20L, d2clean)
    got(1)._4 should not include "s0"
    // doc 3 shares nothing: untouched
    got(2) shouldBe (3L, 60L, 60L, d3.mkString(" "))
  }

  test("BM25 top-k matches an independent integer-arithmetic recompute") {
    // reimplements the llm_bm25_topk score chain with BigInt/BigDecimal
    // (no Spark expressions), so a broken floor/div/quantization in the
    // Column pipeline cannot hide behind an oracle that repeats it
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def toks(t: String): Array[String] =
      t.trim.toLowerCase.split("[ \\t\\n\\r\\f]+").filter(_.nonEmpty)
    val terms = Seq("spark", "hash", "window", "merge", "dup")
    val dl = docs.map { case (id, t) => id -> toks(t).length.toLong }
      .filter(_._2 >= 1).toMap
    val n = dl.size.toLong
    val sumdl = dl.values.sum
    val avgU = (sumdl / n) * 1000000L + ((sumdl % n) * 1000000L) / n
    val tf: Map[(Long, String), Long] = docs
      .flatMap { case (id, t) => toks(t).filter(terms.contains).map(id -> _) }
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val dfreq: Map[String, Long] =
      tf.keys.toSeq.groupBy(_._2).map { case (t, v) => t -> v.size.toLong }
    def idfD6(df: Long): BigDecimal = BigDecimal.valueOf(
      math.log((2.0 * n + 2.0) / (2.0 * df + 1.0)))
      .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
    val scores: Map[Long, Long] = tf.toSeq
      .map { case ((id, t), f) =>
        val rU = BigInt(dl(id)) * 1000000 / avgU
        val den = BigInt(10000000) * f + 3000000 + 9 * rU
        val ratioU = BigInt(22000000) * f * 1000000 / den
        id -> idfD6(dfreq(t)) * BigDecimal(ratioU)
      }
      .groupBy(_._1)
      .map { case (id, xs) =>
        id -> xs.map(_._2).sum.setScale(0,
          scala.math.BigDecimal.RoundingMode.FLOOR).toLongExact
      }
    val expected = scores.toSeq.sortBy { case (id, s) => (-s, id) }.take(10)
      .zipWithIndex.map { case ((id, s), i) => (i + 1L, id, s) }
    val got = graft.SparkEntry.queries("llm_bm25_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldBe expected
    // both score halves are live: the rare high-idf term dominates the
    // head of the list, and scores strictly decrease somewhere (tf /
    // length normalization differentiating docs)
    val dupDocs = docs.filter(d => toks(d._2).contains("dup")).map(_._1).toSet
    dupDocs should not be empty
    got.take(dupDocs.size min 3).foreach(r => dupDocs should contain(r._2))
  }

  /** Independent fixed-point recompute of `llm_char_entropy`'s score:
    * H_micro = (round6(ln N)·N − Σ c·round6(ln c)) · 10^6 div N, all
    * exact BigDecimal/Long — mirrors the Spark/DuckDB spelling without
    * either engine's expression machinery. */
  private def entropyU(text: String): Long = {
    def d6(x: Double): BigDecimal = BigDecimal.valueOf(math.log(x))
      .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
    val bgs = text.sliding(2).toSeq
    val n = bgs.size.toLong
    val s = bgs.groupBy(identity).values
      .map(g => BigDecimal(g.size) * d6(g.size.toDouble)).sum
    ((d6(n.toDouble) * BigDecimal(n) - s) * BigDecimal(1000000))
      .setScale(0, scala.math.BigDecimal.RoundingMode.FLOOR)
      .toLongExact / n
  }

  test("char-bigram entropy matches an independent fixed-point recompute " +
      "and discriminates repetition from diversity") {
    // formula truths: repetition scores low, diversity high, constant=0
    entropyU("aaaaaaaaaa") shouldBe 0L
    entropyU("abcdefghij") should be > entropyU("ababababab")
    entropyU("ababababab") should be > entropyU("aaaaaaaaaa")

    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._2.length >= 2)
    val expected = docs.map { case (id, t) =>
      (id, t.length.toLong - 1, t.sliding(2).toSet.size.toLong, entropyU(t))
    }.sortBy(_._1).toSeq
    val got = graft.SparkEntry.queries("llm_char_entropy")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    got shouldBe expected
  }

  test("hybrid RRF fuses exactly the BM25 top-k ranks and integer RRF arithmetic") {
    val bm = graft.SparkEntry.queries("llm_bm25_topk")(spark, sf)
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap // doc -> rnk
    val rows = graft.SparkEntry.queries("llm_hybrid_rrf")(spark, sf)
      .collect().map { r =>
        (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          r.getLong(3))
      }
    // the lexical side of the fusion IS the BM25 query's ranking
    rows.flatMap(r => r._2.map(r._1 -> _)).toMap shouldBe bm
    // both sides contribute a full top-k
    rows.count(_._2.isDefined) shouldBe bm.size
    rows.count(_._3.isDefined) shouldBe bm.size
    // the fused score is the exact integer RRF of the two ranks
    rows.foreach { case (_, lex, vec, rrf) =>
      val exp = lex.map(r => 1000000000000L / (60 + r)).getOrElse(0L) +
        vec.map(r => 1000000000000L / (60 + r)).getOrElse(0L)
      rrf shouldBe exp
    }
    // output is sorted by fused score desc (doc asc on ties)
    rows.map(_._4).toSeq shouldBe rows.map(_._4).sortBy(-_).toSeq
  }

  test("llm_vocab_curve matches a direct cumulative-share recompute and " +
      "the curve is monotone to saturation") {
    val docs = Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0))
    def toks(t: String): Array[String] =
      t.trim.toLowerCase.split("[ \\t\\n\\r\\f]+").filter(_.nonEmpty)
    val tf = docs.flatMap(toks).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val ranked = tf.toSeq.sortBy { case (w, f) => (-f, w) }.map(_._2)
    val total = ranked.sum
    val vocab = ranked.length.toLong
    val expected = Seq(1L, 2L, 4L, 8L, 16L, 32L).map { k =>
      val covered = ranked.take(k.toInt).sum
      (k, covered, total, vocab, math.min(k, vocab))
    }
    val got = graft.SparkEntry.queries("llm_vocab_curve")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    got shouldBe expected
    // coverage grows with K and saturates at the full token count
    got.map(_._2).sliding(2).foreach {
      case Seq(a, b) => b should be >= a
      case _ =>
    }
    got.last._2 shouldBe total
  }

  test("llm_term_burstiness equals a direct dispersion recompute") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def toks(t: String): Array[String] =
      t.trim.toLowerCase.split("[ \\t\\n\\r\\f]+").filter(_.nonEmpty)
    val n = BigInt(docs.length)
    val perTermDoc = docs.flatMap { case (id, t) =>
      toks(t).groupBy(identity).map { case (w, g) => (w, id, g.length.toLong) }
    }
    val expected = perTermDoc.groupBy(_._1).map { case (w, g) =>
      val k = g.map(e => BigInt(e._3)).sum
      val k2 = g.map(e => BigInt(e._3) * e._3).sum
      (w, k.toLong, g.length.toLong,
        (n * k2 - k * k).toLong, ((n - 1) * k).toLong)
    }.toSeq.sortBy { case (w, k, _, _, _) => (-k, w) }.take(20)
    val got = graft.SparkEntry.queries("llm_term_burstiness")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    got shouldBe expected
    // dispersion is a valid index: nonnegative numerators, positive
    // denominators, and at least one term is burstier than Poisson
    got.foreach { case (w, _, _, num, den) =>
      withClue(s"$w:") { num should be >= 0L; den should be > 0L }
    }
    got.exists(t => t._4 > t._5) shouldBe true
  }

  test("llm_zipf_fit equals a direct micro-unit OLS recompute") {
    val docs = Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0))
    def toks(t: String): Array[String] =
      t.trim.toLowerCase.split("[ \\t\\n\\r\\f]+").filter(_.nonEmpty)
    val tf = docs.flatMap(toks).groupBy(identity).view
      .mapValues(_.length.toLong).toMap.filter(_._2 >= 2)
    val ranked = tf.toSeq.sortBy { case (w, f) => (-f, w) }.zipWithIndex
    def mu(v: Double): BigInt = BigInt(
      (BigDecimal.decimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        * 1000000).toLongExact)
    val pts = ranked.map { case ((_, f), i) =>
      (mu(math.log((i + 1).toDouble)), mu(math.log(f.toDouble)))
    }
    val n = BigInt(pts.length)
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sx2 = pts.map(p => p._1 * p._1).sum
    val sy2 = pts.map(p => p._2 * p._2).sum
    val slope = BigDecimal.decimal(
      (n * sxy - sx * sy).toDouble / (n * sx2 - sx * sx).toDouble)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r2 = BigDecimal.decimal(
      ((n * sxy - sx * sy).toDouble * (n * sxy - sx * sy).toDouble) /
        ((n * sx2 - sx * sx).toDouble * (n * sy2 - sy * sy).toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = graft.SparkEntry.queries("llm_zipf_fit")(spark, sf)
      .collect().head
    got.getLong(0) shouldBe pts.length.toLong
    got.getDouble(1) shouldBe slope
    got.getDouble(2) shouldBe r2
    // frequency falls with rank, and R² is a valid coefficient — on
    // this 31-word synthetic vocabulary the fit correctly reports
    // NON-Zipfian structure (low R²), which is the diagnostic working
    got.getDouble(1) should be < 0.0
    got.getDouble(2) should (be >= 0.0 and be <= 1.0)
  }

  test("llm_pmi_collocations equals a direct PMI recompute") {
    val docs = Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0))
    def toks(t: String): Array[String] =
      t.trim.toLowerCase.split("[ \\t\\n\\r\\f]+").filter(_.nonEmpty)
    val seqs = docs.map(toks).filter(_.length >= 2)
    val uni = seqs.flatten.groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val t1 = seqs.map(_.length.toLong).sum
    val bi = seqs.flatMap(ts => ts.sliding(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val t2 = bi.values.sum
    val expected = bi.toSeq.filter(_._2 >= 5).map { case ((a, b), c2) =>
      val pmi = BigDecimal.decimal(
        math.log((c2 * t1 * t1).toDouble / (t2 * uni(a) * uni(b)).toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (a, b, c2, pmi)
    }.sortBy { case (a, b, _, pmi) => (-pmi, a, b) }.take(20)
    val got = graft.SparkEntry.queries("llm_pmi_collocations")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    got shouldBe expected
    expected should not be empty
    // collocations beat independence: the head has strictly positive PMI
    got.head._4 should be > 0.0
  }

  test("llm_perplexity_buckets: per-language terciles balance to within " +
      "one doc, score envelopes are ordered, and the census covers the " +
      "whole corpus") {
    val got = graft.SparkEntry.queries("llm_perplexity_buckets")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val byLang = got.groupBy(_._1)
    val langDocs = Tables.documents(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    byLang.keySet shouldBe langDocs.keySet
    byLang.foreach { case (lang, rows) =>
      withClue(s"$lang:") {
        // the NTILE balance contract: tercile sizes differ by <= 1 and
        // sum to the language's doc count
        rows.map(_._3).sum shouldBe langDocs(lang)
        (rows.map(_._3).max - rows.map(_._3).min) should be <= 1L
        rows.map(_._2).sorted.toSeq shouldBe (1L to rows.length).toSeq
        // head/middle/tail really partition the score axis: each
        // bucket's max never exceeds the next bucket's min
        val ordered = rows.sortBy(_._2)
        ordered.foreach { case (_, _, _, lo, hi) => hi should be >= lo }
        ordered.sliding(2).foreach {
          case Array((_, _, _, _, hi1), (_, _, _, lo2, _)) =>
            hi1 should be <= lo2
          case _ =>
        }
      }
    }
  }

  /** Sequential brute-force maxrep: for every position the longest
    * substring starting there that occurs at >= 2 positions corpus-wide
    * — independent of BOTH the suffix-array mechanism and the DuckDB
    * oracle's SQL spelling. */
  private def bruteMaxRep(docs: Seq[(Long, Array[String])]): Map[(Long, Int), Int] = {
    val grams = scala.collection.mutable.Map.empty[String, Int]
    for ((_, ts) <- docs; p <- ts.indices; l <- 1 to (ts.length - p)) {
      val g = ts.slice(p, p + l).mkString(" ")
      grams(g) = grams.getOrElse(g, 0) + 1
    }
    (for ((id, ts) <- docs; p <- ts.indices) yield {
      val best = (1 to (ts.length - p)).reverse
        .find(l => grams(ts.slice(p, p + l).mkString(" ")) >= 2)
        .getOrElse(0)
      (id, p) -> best
    }).toMap
  }

  private def tok(t: String): Array[String] =
    t.trim.toLowerCase.split("[ \\t\\n\\r\\f]+").filter(_.nonEmpty)

  test("suffix-array dedup finds a planted 6-token duplicate the " +
      "8-token fingerprint path provably misses") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta quick brown fox jumps"),
      (2L, "one two three alpha beta gamma delta epsilon zeta lazy dog"))
      .toDF("doc_id", "text")
    // the fingerprint path: NO shared 8-gram exists, so nothing at all
    TextAnalysis.dupSpans(docs, 6).count() shouldBe 0L
    // the suffix array: the 6-token repeat is found exactly
    val got = TextAnalysis.suffixDups(docs, 6).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    got(1L) shouldBe ((10L, 1L, 6L)) // only the span start reaches 6
    got(2L) shouldBe ((11L, 1L, 6L))
  }

  test("suffix-array dedup sees INTRA-document repeats the cross-doc " +
      "fingerprint aggregation ignores") {
    import spark.implicits._
    val docs = Seq(
      (7L, "p q r s t u v w END p q r s t u v w"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.suffixDups(docs, 6).collect()(0)
    // 8-token run repeats inside one doc: maxrep 8 at the first 'p'
    (r.getLong(1), r.getLong(3)) shouldBe ((17L, 8L))
    // both copies count: positions p,q,r of EACH occurrence start
    // repeats of length >= 6
    r.getLong(2) shouldBe 6L
  }

  test("suffix-array dedup agrees with a sequential brute force on the " +
      "whole sf0.001 corpus, per document") {
    import spark.implicits._
    val raw = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val docs = raw.map { case (id, t) => (id, tok(t)) }.toSeq
      .filter(_._2.nonEmpty)
    val brute = bruteMaxRep(docs)
    val expect = docs.map { case (id, ts) =>
      val reps = ts.indices.map(p => brute((id, p)))
      id -> ((ts.length.toLong,
        reps.count(_ >= 6).toLong, reps.max.toLong))
    }.toMap
    val got = TextAnalysis.suffixDups(
        graft.Tables.documents(spark, sf).select($"doc_id", $"text"), 6)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    got.keySet shouldBe expect.keySet
    for (id <- expect.keySet)
      withClue(s"doc $id") { got(id) shouldBe expect(id) }
  }

  private def evalGate(id: Long): Boolean =
    ((id % 1000003L) * 2654435761L) % 1000000L >= 900000L

  test("suffix-array contamination scores ONLY eval<->train shares: a " +
      "planted 7-token cross-split run is found at full length, an " +
      "eval-eval duplicate contributes nothing") {
    import spark.implicits._
    val evalIds = (1L to 200L).filter(evalGate)
    val trainIds = (1L to 200L).filterNot(evalGate)
    val (e1, e2, t1) = (evalIds(0), evalIds(1), trainIds(0))
    val docs = Seq(
      // e1 shares a 7-token run with TRAIN doc t1 (vocab otherwise
      // disjoint), and a 6-token run with fellow EVAL doc e2
      (e1, "k1 k2 r1 r2 r3 r4 r5 r6 r7 k3 s1 s2 s3 s4 s5 s6"),
      (t1, "m1 m2 m3 r1 r2 r3 r4 r5 r6 r7 m4"),
      (e2, "z1 s1 s2 s3 s4 s5 s6 z2 z3"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.suffixContamination(docs, 6).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    got.keySet shouldBe Set(e1, e2) // the report is eval-docs-only
    // positions r1, r2 start >=6-token train runs (7 then 6 long)
    got(e1) shouldBe ((16L, 2L, 7L))
    // e2's only repeat partner is e1 — another EVAL doc: clean
    got(e2) shouldBe ((9L, 0L, 0L))
  }

  test("suffix-array contamination agrees with a sequential brute force " +
      "on the whole sf0.001 corpus, per eval document") {
    import spark.implicits._
    val raw = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val docs = raw.map { case (id, t) => (id, tok(t)) }.filter(_._2.nonEmpty)
    val trainGrams = scala.collection.mutable.Set.empty[String]
    for ((id, ts) <- docs if !evalGate(id); p <- ts.indices;
         l <- 1 to (ts.length - p))
      trainGrams += ts.slice(p, p + l).mkString(" ")
    val expect = docs.filter(d => evalGate(d._1)).map { case (id, ts) =>
      val best = ts.indices.map { p =>
        (1 to (ts.length - p)).reverse
          .find(l => trainGrams(ts.slice(p, p + l).mkString(" ")))
          .getOrElse(0)
      }
      id -> ((ts.length.toLong, best.count(_ >= 6).toLong, best.max.toLong))
    }.toMap
    // non-degenerate: the fixture really contains >=6-token
    // cross-split runs (272 contaminated positions at sf0.001)
    expect.values.map(_._2).sum should be > 0L
    val got = TextAnalysis.suffixContamination(
        graft.Tables.documents(spark, sf).select($"doc_id", $"text"), 6)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    got.keySet shouldBe expect.keySet
    for (id <- expect.keySet)
      withClue(s"doc $id") { got(id) shouldBe expect(id) }
  }

  private def collectDups(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .sortBy(_._1).toSeq

  test("suffix-array APPEND equals a full rebuild on a fixture exercising " +
      "every merge path") {
    import spark.implicits._
    // base: internal repeats, shared phrases, a short doc
    val base = Seq(
      (1L, "alpha beta gamma delta epsilon zeta quick brown fox jumps"),
      (2L, "one two three alpha beta gamma delta epsilon zeta lazy dog"),
      (3L, "p q r s t u v w END p q r s t u v w"),
      (4L, "solo")).toDF("doc_id", "text")
    // shard: repeats base text verbatim (raises doc 1/2's maxrep),
    // novel vocabulary, shard-internal repeats, a shard-shard shared
    // phrase, and a doc LONGER than any base doc (extra doubling
    // levels past the frozen index's natural depth)
    val shard = Seq(
      (11L, "zz alpha beta gamma delta epsilon zeta quick brown fox yy"),
      (12L, "nova mira lyra vega nova mira lyra vega nova mira lyra vega"),
      (13L, "argo ceti deneb phact argo ceti deneb phact tail one two three"),
      (14L, ("w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16 " +
        "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16 coda")),
      (15L, "solo")).toDF("doc_id", "text")
    val rebuild = collectDups(
      TextAnalysis.suffixDups(base.unionByName(shard), 3))
    val append = collectDups(
      TextAnalysis.suffixDupsAppend(base, shard, 3))
    append shouldBe rebuild
  }

  test("suffix-array APPEND equals a full rebuild on the sf0.001 corpus " +
      "split 7:1") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf).select($"doc_id", $"text")
    val rebuild = collectDups(TextAnalysis.suffixDups(docs, 6))
    val append = collectDups(TextAnalysis.suffixDupsAppend(
      docs.filter($"doc_id" % 8 =!= 0), docs.filter($"doc_id" % 8 === 0), 6))
    append shouldBe rebuild
  }

  test("suffix-array APPEND ranks only the shard: ranked-row totals are " +
      "IDENTICAL under a 4x larger base") {
    import spark.implicits._
    val base1 = Seq(
      (1L, "alpha beta gamma delta epsilon zeta quick brown fox jumps"),
      (2L, "one two three alpha beta gamma delta epsilon zeta lazy dog"))
      .toDF("doc_id", "text")
    // 6 extra docs over a DISJOINT alphabet: they cannot change which
    // shard windows are novel, so if only the shard is ranked the
    // totals cannot move; a rebuild's ranked rows grow with the base
    val extra = (20L to 25L).map(i =>
      (i, (0 until 12).map(j => s"x${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val shard = Seq(
      (11L, "zz alpha beta gamma delta epsilon zeta quick brown fox yy"),
      (12L, "nova mira lyra vega nova mira lyra vega nova mira lyra vega"))
      .toDF("doc_id", "text")
    var c1 = 0L
    var c4 = 0L
    val r1 = collectDups(
      TextAnalysis.suffixDupsAppend(base1, shard, 3, onRank = c1 += _))
    val r4 = collectDups(TextAnalysis.suffixDupsAppend(
      base1.unionByName(extra), shard, 3, onRank = c4 += _))
    r1 shouldBe collectDups(
      TextAnalysis.suffixDups(base1.unionByName(shard), 3))
    r4 shouldBe collectDups(TextAnalysis.suffixDups(
      base1.unionByName(extra).unionByName(shard), 3))
    withClue(s"ranked rows: 1x base $c1, 4x base $c4") { c4 shouldBe c1 }
    c1 should be > 0L
  }

  test("perceptronTrain converges on planted separable data (updates hit " +
      "zero, pocket = converged epoch) and matches a sequential replay") {
    import spark.implicits._
    // positives at x1 >= 1, negatives exactly at x1 = 0: the batch
    // rule has a zero-update fixpoint here (w = (-neg, sum k) after
    // two epochs) — unlike the ONLINE perceptron, the full-batch
    // variant carries no Novikoff guarantee even when separable, so
    // the spec plants a set where its fixpoint provably exists
    val rnd = new scala.util.Random(5)
    val rows = (0 until 100).flatMap { _ =>
      val k = 1L + rnd.nextInt(5)
      Seq((1L, 1L, k, 0L, 0L, 0L), (-1L, 1L, 0L, 0L, 0L, 0L))
    }
    val got = TextAnalysis.perceptronTrain(
        rows.toDF("y", "x0", "x1", "x2", "x3", "x4"), epochs = 6)
      .collect()
    // sequential replay of the identical exact rule
    var w = Array.fill(5)(0L)
    val replay = (1 to 6).map { r =>
      val xs = rows.map(t =>
        (t._1, Array(t._2, t._3, t._4, t._5, t._6)))
      def m(ws: Array[Long], t: (Long, Array[Long])) =
        t._1 * ws.zip(t._2).map { case (a, b) => a * b }.sum
      val mis = xs.filter(m(w, _) <= 0L)
      w = Array.tabulate(5)(i => w(i) + mis.map(t => t._1 * t._2(i)).sum)
      val nc = xs.count(m(w, _) > 0L)
      (r.toLong, w.toSeq, mis.size.toLong, nc.toLong)
    }
    got.map(r => (r.getLong(0),
      Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)), r.getLong(6), r.getLong(7))).toSeq shouldBe replay
    // converged: the last epochs update nothing and classify all
    got.last.getLong(6) shouldBe 0L
    got.last.getDouble(9) shouldBe 1.0
    // the pocket is the FIRST perfect epoch
    val firstPerfect = got.find(_.getLong(7) == rows.size.toLong)
      .get.getLong(0)
    got.filter(_.getBoolean(10)).map(_.getLong(0)).toSeq shouldBe
      Seq(firstPerfect)
    // cycling case: marker features are non-separable, the pocket row
    // still singles out exactly one epoch
    val fx = graft.SparkEntry.queries("llm_perceptron_learn")(spark, sf)
      .collect()
    fx.count(_.getBoolean(10)) shouldBe 1
  }

  test("llm_calibration_ece and llm_rater_kappa match a from-the-text " +
      "Scala recompute of the marker probabilities") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf)
      .select($"lang", $"text").as[(String, String)].collect()
    def cnt(t: String, kw: String): Long = {
      val pat = s" $kw "
      (t.length - t.replace(pat, "").length).toLong / pat.length
    }
    val feats = docs.map { case (lang, t) =>
      val (ce, cd, cf, cs) =
        (cnt(t, "the"), cnt(t, "der"), cnt(t, "le"), cnt(t, "el"))
      (lang, ce, cd, cf, cs,
        1000000L * (ce + 1) / (ce + cd + cf + cs + 4))
    }
    // ECE bins
    val bins = feats.groupBy { f => math.min(9L, f._6 / 100000L) }
      .map { case (b, fs) =>
        val n = fs.length.toLong
        val sp = fs.map(_._6).sum
        val pos = fs.count(_._1 == "en").toLong
        (b, n, sp, pos, math.abs(1000000L * pos - sp))
      }.toSeq.sortBy(_._1)
    val gotE = graft.SparkEntry.queries("llm_calibration_ece")(spark, sf)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(6))).toSeq
    gotE shouldBe bins
    // kappa from the same features
    val pairs = feats.map(f =>
      (f._2 > Seq(f._3, f._4, f._5).max, f._6 >= 500000L))
    val (n00, n01, n10, n11) = (
      pairs.count(p => !p._1 && !p._2).toLong,
      pairs.count(p => !p._1 && p._2).toLong,
      pairs.count(p => p._1 && !p._2).toLong,
      pairs.count(p => p._1 && p._2).toLong)
    val n = (n00 + n01 + n10 + n11).toDouble
    val po = (n00 + n11) / n
    val pe = ((n10 + n11) * (n01 + n11) + (n00 + n01) * (n00 + n10)) /
      (n * n)
    val gotK = graft.SparkEntry.queries("llm_rater_kappa")(spark, sf)
      .collect().head
    (gotK.getLong(0), gotK.getLong(1), gotK.getLong(2), gotK.getLong(3)) shouldBe
      ((n00, n01, n10, n11))
    gotK.getDouble(6) shouldBe ((po - pe) / (1.0 - pe)) +- 1e-12
    // kappa is a real correction: below raw agreement, above zero here
    gotK.getDouble(6) should be < gotK.getDouble(4)
  }
}
