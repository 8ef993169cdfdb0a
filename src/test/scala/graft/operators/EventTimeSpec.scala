package graft.operators

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{Tables, TestSpark}

/** Semantic gate for `evt_pattern_match`: the query's regex scan must
  * agree with an explicit hand-rolled automaton implementing the
  * leftmost-greedy non-overlapping semantics of `v[cv]*p` — an
  * implementation independent of BOTH regex engines (Java in Spark,
  * RE2 in DuckDB), so an engine-semantics surprise (overlap handling,
  * backtracking on the run boundary) fails here even if the two
  * engines happen to agree with each other.
  */
class EventTimeSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Leftmost non-overlapping matches of v[cv]*p: at a 'v', the greedy
    * [cv]* run ends at the first non-[cv] char, which must be 'p'
    * (backtracking cannot help — every interior char is c/v, never p);
    * on failure the scan advances one char, on success it resumes
    * after the match. Returns match lengths in order. */
  private def scanMatches(s: String): Seq[Int] = {
    val out = Seq.newBuilder[Int]
    var i = 0
    while (i < s.length) {
      if (s(i) == 'v') {
        var j = i + 1
        while (j < s.length && (s(j) == 'c' || s(j) == 'v')) j += 1
        if (j < s.length && s(j) == 'p') {
          out += (j - i + 1)
          i = j + 1
        } else i += 1
      } else i += 1
    }
    out.result()
  }

  test("pattern matcher agrees with an explicit automaton on every user " +
      "and on adversarial planted sequences") {
    // automaton unit truths first: overlap, backtracking, exclusion
    scanMatches("vcvp") shouldBe Seq(4)        // greedy run through c,v
    scanMatches("vcvevp") shouldBe Seq(2)      // error breaks the run
    scanMatches("vpvp") shouldBe Seq(2, 2)     // non-overlapping restart
    scanMatches("vvp") shouldBe Seq(3)         // v inside the run consumed
    scanMatches("pcv") shouldBe Seq()          // no purchase => no match
    scanMatches("vcsp") shouldBe Seq()         // signup breaks the run

    val events = Tables.events(spark, sf)
      .selectExpr("user_id", "ts div 1000 as tus", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val codes = Map("view" -> 'v', "click" -> 'c', "purchase" -> 'p',
      "signup" -> 's', "error" -> 'e')
    val seqs = events.groupBy(_._1).map { case (u, es) =>
      u -> es.sortBy(e => (e._2, e._3)).map(e => codes(e._4)).mkString
    }
    val expected = seqs.map { case (u, s) =>
      val m = scanMatches(s)
      (u, s.length.toLong, m.size.toLong,
        (if (m.isEmpty) 0 else m.max).toLong, m.sum.toLong)
    }.toSeq.sortBy(_._1)
    val got = graft.SparkEntry.queries("evt_pattern_match")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    got shouldBe expected
    // non-vacuity: the fixture actually exercises matching
    got.map(_._3).sum should be > 0L
  }

  test("attribution matches a direct recompute; credit conserves exactly") {
    val look = 48L * 3600L * 1000000L
    val evs = Tables.events(spark, sf)
      .selectExpr("event_id", "user_id", "ts div 1000 as tus", "event_type",
        "cast(cast(value as decimal(12,2)) * 100 as bigint) as cents")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4)))
      .filter(e => Set("view", "click", "purchase")(e._4))
    val byUser = evs.groupBy(_._2)
    val expected = evs.filter(_._4 == "purchase").map { p =>
      val touches = byUser(p._2).filter(t =>
        t._4 != "purchase" && t._3 >= p._3 - look && t._3 <= p._3 - 1)
      val nv = touches.count(_._4 == "view").toLong
      val nc = touches.count(_._4 == "click").toLong
      val total = p._5 * 10000L
      val vc = if (nv + nc == 0) 0L else total * nv / (nv + nc)
      val cc = if (nv + nc == 0) 0L else total - vc
      val lv = touches.filter(_._4 == "view").map(_._3)
        .reduceOption(_ max _).getOrElse(-1L)
      val lc = touches.filter(_._4 == "click").map(_._3)
        .reduceOption(_ max _).getOrElse(-1L)
      val lt = if (nv + nc == 0) "none" else if (lc >= lv) "click" else "view"
      (p._1, p._2, nv, nc, total, vc, cc, lt)
    }.sortBy(_._1).toSeq
    val got = graft.SparkEntry.queries("evt_attribution")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getString(7))).toSeq
    got shouldBe expected
    // every touched purchase conserves credit to the micro-dollar
    got.filter(r => r._3 + r._4 > 0)
      .foreach(r => r._6 + r._7 shouldBe r._5)
    // all three last-touch classes occur on the fixture
    got.map(_._8).distinct.toSet shouldBe Set("view", "click", "none")
  }

  test("RFM bins are quintiles over the per-user frame with exact accounting") {
    val got = graft.SparkEntry.queries("evt_rfm")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7)))
    val users = got.length
    // every bin column is a quintile partition: sizes within 1
    Seq(1, 2, 3).foreach { bi =>
      val sizes = got.groupBy(_.productElement(bi)).values.map(_.size)
      sizes.size shouldBe 5
      (sizes.max - sizes.min) should be <= 1
      sizes.sum shouldBe users
    }
    // segment code composes the three bins
    got.foreach(r => r._5 shouldBe r._2 * 100 + r._3 * 10 + r._4)
  }

  test("evt_resample equals a per-user scalar interpolation recompute") {
    val DayUs = 86400000000L
    val pts = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "ts div 1000 as tus",
        "cast(cast(value as decimal(18,2)) * 100 as long) as y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(p => (p._1, p._2)).map { case ((u, t), g) =>
        (u, t, g.map(_._3).max) }.toSeq
    val expected = pts.groupBy(_._1).flatMap { case (u, g) =>
      val sorted = g.map(p => (p._2, p._3)).sortBy(_._1)
      val (d0, d1) = (sorted.head._1 / DayUs, sorted.last._1 / DayUs)
      (d0 to d1).flatMap { day =>
        val t = day * DayUs
        val prev = sorted.filter(_._1 <= t).lastOption
        val next = sorted.find(_._1 > t)
        // a data point exactly AT the grid instant brackets from the
        // left (prev), and the right bracket must be strictly later
        (prev, next) match {
          case (Some((t1, y1)), Some((t2, y2))) =>
            Some((u, day, (y1 * (t2 - t) + y2 * (t - t1)) / (t2 - t1)))
          case _ => None
        }
      }
    }.toSeq.sortBy(r => (r._1, r._2))
    val got = graft.SparkEntry.queries("evt_resample")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldBe expected
    expected should not be empty
  }

  test("evt_ewma matches a sequential per-user fold, heads renormalize") {
    // independent recompute: per user, sort by (tus, event_id), then a
    // direct sliding sum of the last <=8 centi-unit values with binary
    // weights 128,64,...,1 — the sequential form of the truncated
    // recurrence the window query parallelizes
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "ts div 1000 as tus",
        "cast(cast(value as decimal(18,2)) * 100 as long) as y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = ev.groupBy(_._1).flatMap { case (u, g) =>
      val sorted = g.sortBy(p => (p._3, p._2)).toIndexedSeq
      sorted.indices.map { t =>
        val taps = (0 to math.min(t, 7)).map { i =>
          (sorted(t - i)._4, 1L << (7 - i))
        }
        (u, sorted(t)._2,
          taps.map { case (y, w) => y * w }.sum, taps.map(_._2).sum)
      }
    }.toSeq.sortBy(r => (r._1, r._2))
    val got = graft.SparkEntry.queries("evt_ewma")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    got shouldBe expected
    expected should not be empty
    // series heads renormalize: the k-th event of a user (time order)
    // carries den = 2^8 - 2^(7-min(k,7)) and saturates at 255 from the
    // 8th on — so per user the DEN MULTISET is fully determined by the
    // series length (order-free check; `got` is sorted by event_id,
    // not time)
    got.groupBy(_._1).values.foreach { rows =>
      val expectDens = rows.indices.map(k => 256L - (1L << (7 - math.min(k, 7))))
      rows.map(_._4).sorted shouldBe expectDens.sorted
    }
  }

  test("evt_holt matches a sequential two-stage fold and genuinely " +
      "de-lags a ramp where plain EWMA trails it") {
    // independent recompute: per user, time-sorted, stage-one kernel
    // 2^(7-i) over <=8 taps and the two-stage (convolved) kernel
    // (k+1 | 15-k) * 2^(14-k) over <=15 taps, then Brown's identities
    // in exact integers — the sequential form of the window query
    val w1 = (0 to 7).map(k => 1L << (7 - k))
    val w2 = (0 to 14).map(k => (if (k <= 7) k + 1L else 15L - k) << (14 - k))
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "ts div 1000 as tus",
        "cast(cast(value as decimal(18,2)) * 100 as long) as y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = ev.groupBy(_._1).flatMap { case (u, g) =>
      val sorted = g.sortBy(p => (p._3, p._2)).toIndexedSeq
      sorted.indices.map { t =>
        def conv(w: IndexedSeq[Long]) = {
          val taps = (0 to math.min(t, w.length - 1))
            .map(i => (sorted(t - i)._4, w(i)))
          (taps.map { case (y, c) => y * c }.sum, taps.map(_._2).sum)
        }
        val (s1n, s1d) = conv(w1)
        val (s2n, s2d) = conv(w2)
        (u, sorted(t)._2, 2L * s1n * s2d - s2n * s1d,
          s1n * s2d - s2n * s1d, 3L * s1n * s2d - 2L * s2n * s1d,
          s1d * s2d)
      }
    }.toSeq.sortBy(r => (r._1, r._2))
    val got = graft.SparkEntry.queries("evt_holt")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    got shouldBe expected
    expected should not be empty
    // the POINT of the second stage: on a pure ramp y = c*t the Brown
    // level equals y exactly once both kernels are saturated, while
    // single EWMA lags by a constant — check the algebra on a
    // synthetic saturated ramp through the same tap tables
    val ramp = (0 until 20).map(_ * 10L)
    val t = 19
    def conv(w: IndexedSeq[Long]) = {
      val taps = w.indices.map(i => (ramp(t - i), w(i)))
      (taps.map { case (y, c) => y * c }.sum, taps.map(_._2).sum)
    }
    val (s1n, s1d) = conv(w1)
    val (s2n, s2d) = conv(w2)
    // level = 2*s1 - s2 == y_t exactly; s1 alone sits below y_t
    (2L * s1n * s2d - s2n * s1d) shouldBe ramp(t) * (s1d * s2d)
    s1n should be < ramp(t) * s1d
  }

  test("evt_rolling_median matches a sequential trailing-5 recompute; " +
      "heads shrink honestly and both parities of the 2x encoding occur") {
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "ts div 1000 as tus",
        "cast(cast(value as decimal(18,2)) * 100 as long) as y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = ev.groupBy(_._1).flatMap { case (u, g) =>
      val sorted = g.sortBy(p => (p._3, p._2)).toIndexedSeq
      sorted.indices.map { t =>
        val win = (math.max(0, t - 4) to t).map(sorted(_)._4).sorted
        val n = win.length
        (u, sorted(t)._2, n.toLong,
          win((n + 1) / 2 - 1) + win(n / 2 + 1 - 1))
      }
    }.toSeq.sortBy(r => (r._1, r._2))
    val got = graft.SparkEntry.queries("evt_rolling_median")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    got shouldBe expected
    expected should not be empty
    // heads: window sizes 1..5 all occur; even sizes exercise the
    // two-middle-values sum, odd sizes the doubled middle
    expected.map(_._3).distinct.sorted shouldBe Seq(1L, 2L, 3L, 4L, 5L)
  }

  test("evt_drawdown matches a sequential per-user running-peak fold") {
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "ts div 1000 as tus",
        "cast(cast(value as decimal(18,2)) * 100 as long) as y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = ev.groupBy(_._1).map { case (u, g) =>
      val ys = g.sortBy(p => (p._3, p._2)).map(_._4)
      var peak = Long.MinValue
      var maxDd = Long.MinValue
      var under = 0L
      ys.foreach { y =>
        peak = math.max(peak, y)
        maxDd = math.max(maxDd, peak - y)
        if (y < peak) under += 1
      }
      (u, ys.length.toLong, peak, maxDd, under)
    }.toSeq.sortBy(_._1)
    val got = graft.SparkEntry.queries("evt_drawdown")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    got shouldBe expected
    expected should not be empty
    // non-degenerate: somebody actually went underwater
    expected.map(_._5).sum should be > 0L
  }

  test("evt_interval_union matches a sequential merge-intervals recompute " +
      "and genuinely deduplicates overlap a plain duration SUM would " +
      "double-count") {
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "ts div 1000 as t0",
        "cast(cast(value as decimal(18,2)) * 100 as long) as y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = ev.groupBy(_._1).map { case (u, g) =>
      val ivs = g.map { case (_, t0, y) =>
        (t0, t0 + (math.abs(y) % 3000L + 600L) * 1000000L)
      }.sortBy(_._1)
      // classic merge-intervals fold (touching intervals merge)
      var covered = 0L
      var curA = ivs.head._1
      var curB = ivs.head._2
      ivs.tail.foreach { case (a, b) =>
        if (a <= curB) curB = math.max(curB, b)
        else { covered += curB - curA; curA = a; curB = b }
      }
      covered += curB - curA
      val span = ivs.map(_._2).max - ivs.map(_._1).min
      (u, ivs.length.toLong, covered, span)
    }.toSeq.sortBy(_._1)
    val got = graft.SparkEntry.queries("evt_interval_union")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    got shouldBe expected
    expected should not be empty
    // overlap is real: covered < the naive duration sum for someone
    val naive = ev.groupBy(_._1).view.mapValues(
      _.map { case (_, _, y) => (math.abs(y) % 3000L + 600L) * 1000000L }.sum)
    expected.exists { case (u, _, cov, _) => cov < naive(u) } shouldBe true
  }

  test("evt_mad_outliers matches a direct sort-based median/MAD recompute") {
    // the query derives medians from cumulative counts over the
    // distinct-value table; this recompute sorts the raw values — an
    // independent formulation of the same order statistics
    def median2(xs: Seq[Long]): Long = {
      val s = xs.sorted
      val n = s.length
      s((n - 1) / 2) + s(n / 2) // v1 + v2; equal when n is odd
    }
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("event_type",
        "cast(cast(value as decimal(18,2)) * 100 as long) as y")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = ev.groupBy(_._1).map { case (t, g) =>
      val ys = g.map(_._2).toSeq
      val med2 = median2(ys)
      val devs = ys.map(y => math.abs(2 * y - med2))
      val mad4 = median2(devs)
      val outliers = devs.count(dv => 2 * dv > 5 * mad4).toLong
      (t, ys.length.toLong, med2, mad4, outliers)
    }.toSeq.sortBy(_._1)
    val got = graft.SparkEntry.queries("evt_mad_outliers")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    got shouldBe expected
    expected should not be empty
    // the robust threshold is non-degenerate on the fixture: MAD > 0
    // everywhere and at least one type flags at least one outlier
    got.foreach { case (t, _, _, mad4, _) =>
      withClue(s"$t:") { mad4 should be > 0L }
    }
    got.map(_._5).sum should be > 0L
  }

  test("evt_sliding_distinct equals the brute-force per-window distinct " +
      "census") {
    val ud = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "(ts div 1000) div 86400000000 as day")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val lo = ud.map(_._2).min - 6
    val hi = ud.map(_._2).max
    val expected = (lo to hi).flatMap { w =>
      val n = ud.filter(t => t._2 >= w && t._2 <= w + 6)
        .map(_._1).distinct.length.toLong
      if (n > 0) Some((w, n)) else None
    }
    val got = graft.SparkEntry.queries("evt_sliding_distinct")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    got shouldBe expected
    // windows genuinely slide: counts vary across the range (ramp-up
    // at the edges at minimum), and none exceeds the user universe
    val users = ud.map(_._1).distinct.length.toLong
    got.foreach(_._2 should be <= users)
    got.map(_._2).distinct.size should be > 1
  }

  test("agg_minhash_overlap signatures match a MessageDigest recompute " +
      "and the estimate brackets the exact intersection") {
    val ev = graft.Tables.events(spark, sf)
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byUser = ev.groupBy(_._1).view.mapValues { g =>
      val t = g.map(_._2)
      (t.count(_ == "purchase"), t.count(_ == "error"),
        t.count(_ == "click"), t.count(_ == "view"))
    }.toMap
    val a = byUser.collect { case (u, (np, ne, _, _)) if np > ne => u }.toSet
    val b = byUser.collect { case (u, (_, _, nc, nv)) if nc > nv => u }.toSet
    def h(u: Long, r: Int): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s"${u}_$r".getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val m = (0 until 64).count { r =>
      a.map(h(_, r)).min == b.map(h(_, r)).min
    }.toLong
    val inter = (a intersect b).size.toLong
    val got = graft.SparkEntry.queries("agg_minhash_overlap")(spark, sf)
      .collect().head
    got.getLong(0) shouldBe a.size.toLong
    got.getLong(1) shouldBe b.size.toLong
    got.getLong(2) shouldBe inter
    got.getLong(3) shouldBe m
    got.getLong(4) shouldBe m * (a.size + b.size)
    got.getLong(5) shouldBe 64L + m
    got.getBoolean(6) shouldBe true
    // the segments genuinely differ and genuinely overlap
    inter should be > 0L
    inter should be < math.min(a.size, b.size).toLong
  }

  test("agg_theta_setops: full KMV/theta-sketch recompute at sf0.001 " +
      "(exact branch) and sf0.01 (estimating branch), contracts hold") {
    val K = 64
    val U = 1L << 52
    def h52(u: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"${u}_kmv".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (0 until 13).map { i =>
        val c = hex(i)
        val w = if (c >= 'a') c - 'a' + 10 else c - '0'
        w.toLong << (4 * i)
      }.sum
    }
    def checkDir(dir: String): (Boolean, Row) = {
      val ev = graft.Tables.events(spark, dir)
        .select("user_id", "event_type").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      val byUser = ev.groupBy(_._1).view.mapValues { g =>
        val t = g.map(_._2)
        (t.count(_ == "purchase"), t.count(_ == "error"),
          t.count(_ == "click"), t.count(_ == "view"))
      }.toMap
      val a = byUser.collect { case (u, (np, ne, _, _)) if np > ne => u }.toSet
      val b = byUser.collect { case (u, (_, _, nc, nv)) if nc > nv => u }.toSet
      val ska = a.map(h52).toSeq.sorted.take(K)
      val skb = b.map(h52).toSeq.sorted.take(K)
      val sku = (ska ++ skb).distinct.sorted.take(K)
      val thetaA = if (ska.size >= K) ska.max else U
      val thetaB = if (skb.size >= K) skb.max else U
      val thetaU = if (sku.size >= K) sku.max else U
      val theta = math.min(thetaA, thetaB)
      val ra = ska.filter(_ < theta).toSet
      val rb = skb.filter(_ < theta).toSet
      val cInter = (ra intersect rb).size.toLong
      val cDiff = (ra diff rb).size.toLong
      val row = graft.SparkEntry.queries("agg_theta_setops")(spark, dir)
        .collect().head
      row.getAs[Long]("ka") shouldBe ska.size.toLong
      row.getAs[Long]("kb") shouldBe skb.size.toLong
      row.getAs[Long]("ku") shouldBe sku.size.toLong
      row.getAs[Long]("theta_a") shouldBe thetaA
      row.getAs[Long]("theta_b") shouldBe thetaB
      row.getAs[Long]("theta_u") shouldBe thetaU
      row.getAs[Long]("theta") shouldBe theta
      row.getAs[Long]("c_inter") shouldBe cInter
      row.getAs[Long]("c_diff") shouldBe cDiff
      row.getAs[Long]("n_a") shouldBe a.size.toLong
      row.getAs[Long]("n_b") shouldBe b.size.toLong
      row.getAs[Long]("exact_inter") shouldBe (a intersect b).size.toLong
      row.getAs[Long]("exact_union") shouldBe (a union b).size.toLong
      row.getAs[Long]("est_a_num") shouldBe
        (if (ska.size >= K) (K - 1L) * U else ska.size.toLong)
      row.getAs[Long]("est_a_den") shouldBe
        (if (ska.size >= K) thetaA else 1L)
      row.getAs[Long]("est_inter_num") shouldBe cInter * U
      row.getAs[Long]("est_inter_den") shouldBe theta
      row.getAs[Long]("est_diff_num") shouldBe cDiff * U
      row.getAs[Long]("est_diff_den") shouldBe theta
      Seq("a_within_40", "b_within_40", "union_within_40",
        "inter_within_40", "diff_within_40").foreach { f =>
        withClue(f) { row.getAs[Boolean](f) shouldBe true }
      }
      (ska.size >= K, row)
    }
    // sf0.001: segments smaller than K — the sketch IS the set, so
    // every estimate rational reduces to the exact count
    val (full0, r0) = checkDir(sf)
    full0 shouldBe false
    r0.getAs[Long]("est_a_num") shouldBe r0.getAs[Long]("n_a")
    r0.getAs[Long]("est_inter_num") / r0.getAs[Long]("est_inter_den") shouldBe
      r0.getAs[Long]("exact_inter")
    // sf0.01: both segments exceed K — the genuinely-estimating branch
    // runs, θ < U, and the estimates STILL sit inside ±40%
    val (full1, r1) = checkDir("/root/testdata/sf0.01")
    full1 shouldBe true
    r1.getAs[Long]("theta") should be < U
    // the estimate is genuinely an estimate there (not the exact count)
    (BigInt(r1.getAs[Long]("est_a_num")) ==
      BigInt(r1.getAs[Long]("n_a")) * r1.getAs[Long]("est_a_den")) shouldBe false
  }

  test("evt_markov_stationary equals a sequential power-iteration " +
      "recompute and mass stays within the floor-loss bound") {
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "event_type", "ts div 1000 as tus")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3)))
    val cells = ev.groupBy(_._1).values.flatMap { g =>
      val seq = g.sortBy(e => (e._4, e._2)).map(_._3)
      seq.zip(seq.drop(1))
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nOut = cells.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2).sum).toMap
    val states = (cells.keys.map(_._1) ++ cells.keys.map(_._2)).toSeq
      .distinct.sorted
    var pi: Map[String, Long] =
      states.map(_ -> 1000000000L / states.size).toMap
    for (_ <- 1 to 5) {
      val next = scala.collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
      pi.foreach { case (src, mass) =>
        cells.foreach { case ((s0, d0), n) =>
          if (s0 == src) next(d0) += mass * n / nOut(s0)
        }
      }
      // PageRank dangling treatment: mass on states with no outgoing
      // edges is redistributed uniformly (floor); π spans ALL states
      val dm = pi.collect { case (st, m) if !nOut.contains(st) => m }.sum
      pi = states.map(st => st -> (next(st) + dm / states.size)).toMap
    }
    val expected = pi.toSeq.sortBy(_._1)
      .map { case (st, p) => (st, p, nOut.getOrElse(st, 0L)) }
    val got = graft.SparkEntry.queries("evt_markov_stationary")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
    got shouldBe expected
    // mass conservation up to floor losses: within rounds·states·edges
    // nano of 1e9, and the distribution is genuinely non-uniform
    val total = got.map(_._2).sum
    total should be <= 1000000000L
    total should be >= 1000000000L - 5L * states.size * states.size * 5L
    got.map(_._2).distinct.size should be > 1
  }

  test("markovStationary conserves a planted dangling state's mass: " +
      "redistributed uniformly per round, total pinned near 1e9, no " +
      "state vanishes") {
    import spark.implicits._
    // c is DANGLING (appears only as dst): a -> b (2), b -> {a, c}
    val cellSeq = Seq(("a", "b", 2L), ("b", "a", 1L), ("b", "c", 1L))
    val got = EventTime.markovStationary(spark,
        cellSeq.toDF("src", "dst", "n")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // independent sequential recompute with the same conventions
    val nOut = Map("a" -> 2L, "b" -> 2L)
    val states = Seq("a", "b", "c")
    var pi = states.map(_ -> 1000000000L / 3).toMap
    for (_ <- 1 to 5) {
      val next = scala.collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
      cellSeq.foreach { case (s0, d0, n) =>
        next(d0) += pi(s0) * n / nOut(s0)
      }
      val dm = pi("c") // the dangling mass this round
      pi = states.map(st => st -> (next(st) + dm / 3)).toMap
    }
    got shouldBe states.map(st => (st, pi(st), nOut.getOrElse(st, 0L)))
    // the absorbing-discard convention this replaced lost c's full
    // share every round; with redistribution the total stays within
    // the floor-loss bound of 1e9 and c itself keeps receiving mass
    val total = got.map(_._2).sum
    total should be >= 1000000000L - 5L * (3L + 3L)
    total should be <= 1000000000L
    got.find(_._1 == "c").get._2 should be > 0L
  }

  test("evt_seasonal_decompose equals a sequential recompute and the " +
      "additive identity holds exactly on every row") {
    val DayUs = 86400000000L
    val daily = graft.Tables.events(spark, sf)
      .selectExpr(s"(ts div 1000) div $DayUs as day",
        "cast(cast(value as decimal(18,2)) * 100 as long) as y")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).toSeq.map { case (d, g) => (d, g.map(_._2).sum) }
      .sortBy(_._1)
    val full = daily.indices.flatMap { i =>
      val win = daily.slice(math.max(0, i - 3), math.min(daily.size, i + 4))
      if (win.size == 7 && win.last._1 - win.head._1 == 6)
        Some((daily(i)._1, (daily(i)._1 + 4) % 7, daily(i)._2,
          win.map(_._2).sum))
      else None
    }
    val r7s = full.map { case (d, dow, y, tr) => (d, dow, y, tr, 7 * y - tr) }
    val seas = r7s.groupBy(_._2).view.mapValues(g =>
      (g.map(_._5).sum, g.size.toLong)).toMap
    val expected = r7s.map { case (d, dow, y, tr, r7) =>
      val (sn, sd) = seas(dow)
      (d, dow, y, tr, r7, sn, sd, r7 * sd - sn)
    }.sortBy(_._1)
    val got = graft.SparkEntry.queries("evt_seasonal_decompose")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7))).toSeq
    got shouldBe expected
    got should not be empty
    // the additive identity 7·y·s_den = trend·s_den + s_num + rem_num
    got.foreach { r =>
      7L * r._3 * r._7 shouldBe r._4 * r._7 + r._6 + r._8
    }
    // seasonality is non-degenerate: day-of-week indices genuinely
    // differ (as rationals — compare cross-multiplied)
    val idx = got.map(r => (r._6, r._7)).distinct
    idx.combinations(2).exists { case Seq((n1, d1), (n2, d2)) =>
      n1 * d2 != n2 * d1 } shouldBe true
  }

  test("evt_ab_ttest equals a direct Welch recompute on exact moments") {
    val ys = graft.Tables.events(spark, sf)
      .filter("event_type = 'purchase'")
      .selectExpr("user_id",
        "cast(cast(value as decimal(18,2)) * 100 as long) as cents")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).toSeq.map { case (u, g) => (u % 2, g.map(_._2).sum) }
    val a = ys.filter(_._1 == 0L).map(_._2)
    val b = ys.filter(_._1 == 1L).map(_._2)
    def mom(xs: Seq[Long]) = (xs.size.toLong, xs.sum, xs.map(y => y * y).sum)
    val (na, sa, qa) = mom(a)
    val (nb, sb, qb) = mom(b)
    val va = (qa.toDouble - sa.toDouble * sa / na) / (na - 1)
    val vb = (qb.toDouble - sb.toDouble * sb / nb) / (nb - 1)
    val t = (sa.toDouble / na - sb.toDouble / nb) /
      math.sqrt(va / na + vb / nb)
    val row = graft.SparkEntry.queries("evt_ab_ttest")(spark, sf)
      .collect().head
    row.getAs[Long]("n_a") shouldBe na
    row.getAs[Long]("n_b") shouldBe nb
    row.getAs[Long]("sum_a") shouldBe sa
    row.getAs[Long]("sum_b") shouldBe sb
    row.getAs[Long]("sumsq_a") shouldBe qa
    row.getAs[Long]("sumsq_b") shouldBe qb
    row.getAs[Double]("t_stat") shouldBe BigDecimal.decimal(t)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    row.getAs[Boolean]("significant_05") shouldBe (math.abs(t) > 1.959964)
    // both variants are populated and the metric genuinely varies
    na should be > 1L
    nb should be > 1L
    (va + vb) should be > 0.0
  }

  test("evt_survival_km equals a sequential Kaplan-Meier recompute and " +
      "censoring is genuinely present") {
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "event_type", "ts div 1000 as tus")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val tEnd = ev.map(_._3).max
    val byUser = ev.groupBy(_._1).view.mapValues { g =>
      (g.filter(_._2 == "view").map(_._3).minOption,
        g.filter(_._2 == "purchase").map(_._3).minOption)
    }.toMap
    val obs = byUser.values.collect {
      case (Some(fv), fp) =>
        fp.filter(_ > fv).map(p => (p - fv, true))
          .getOrElse((tEnd - fv, false))
    }.toSeq
    val nSubjects = obs.size.toLong
    val deaths = obs.filter(_._2).groupBy(_._1).view.mapValues(_.size.toLong)
    val censByT = obs.filterNot(_._2).groupBy(_._1).view
      .mapValues(_.size.toLong)
    val times = obs.map(_._1).distinct.sorted
    var before = 0L
    var lnMicro = 0L
    val expected = Seq.newBuilder[(Long, Long, Long, Long, Long, Double)]
    times.foreach { t =>
      val d = deaths.getOrElse(t, 0L)
      val c = censByT.getOrElse(t, 0L)
      val nRisk = nSubjects - before
      if (d > 0 && nRisk > d) {
        val f = (BigDecimal.decimal(math.log((nRisk - d).toDouble / nRisk))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP) * 1000000).toLongExact
        lnMicro += f
        val surv = BigDecimal.decimal(math.exp(lnMicro.toDouble / 1e6))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        expected += ((t, nRisk, d, c, lnMicro, surv))
      }
      before += d + c
    }
    val got = graft.SparkEntry.queries("evt_survival_km")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    got shouldBe expected.result()
    // the curve is a genuine survival curve: strictly decreasing
    // survival across steps, and censored subjects exist
    got.map(_._6).sliding(2).foreach {
      case Seq(a, b) => b should be < a
      case _ => ()
    }
    obs.count(!_._2) should be > 0
    got.last._6 should be > 0.0
  }

  test("evt_ks_drift equals a brute-force two-sample ECDF recompute") {
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("(ts div 1000) div 86400000000 as day",
        "cast(cast(value as decimal(18,2)) * 100 as long) as y")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val d0 = ev.map(_._1).min
    val d1 = ev.map(_._1).max
    val split = (d0 + d1 + 1) / 2
    val a = ev.filter(_._1 < split).map(_._2)
    val b = ev.filter(_._1 >= split).map(_._2)
    a.length should be > 0
    b.length should be > 0
    val devs = (a ++ b).distinct.map { v =>
      val ca = a.count(_ <= v).toLong
      val cb = b.count(_ <= v).toLong
      ((BigInt(b.length) * ca - BigInt(a.length) * cb).abs, v)
    }
    val dmax = devs.map(_._1).max
    val atv = devs.filter(_._1 == dmax).map(_._2).min
    val row = graft.SparkEntry.queries("evt_ks_drift")(spark, sf)
      .collect().head
    row.getAs[Long]("n_a") shouldBe a.length.toLong
    row.getAs[Long]("n_b") shouldBe b.length.toLong
    row.getAs[Long]("d_num") shouldBe dmax.toLong
    row.getAs[Long]("d_den") shouldBe a.length.toLong * b.length
    row.getAs[Long]("at_value") shouldBe atv
    // the exact squared comparison agrees with the floating-point
    // textbook form (far from the boundary on this fixture)
    val dD = dmax.toDouble / (a.length.toLong * b.length)
    val crit = 1.3581 * math.sqrt(
      (a.length + b.length).toDouble / (a.length.toLong * b.length))
    row.getAs[Boolean]("reject_at_05") shouldBe (dD > crit)
    // the statistic is non-degenerate: the two halves are not identical
    dmax should be > BigInt(0)
  }

  test("ksReject has no width ceiling: the verdict flips at the exact " +
      "integer boundary for n_a*n_b = 1e18, past the old DECIMAL(38) " +
      "spelling's ~1e15 limit") {
    val nA = 1000000000L
    val nB = 1000000000L
    // reject <=> 1e8*d^2 > rhs <=> d^2 > q (rhs divisible by 1e8 here)
    val rhs = BigInt(184443561L) * (BigInt(nA) + nB) * BigInt(nA) * nB
    val q = rhs / BigInt(100000000L)
    (q * BigInt(100000000L)) shouldBe rhs
    // independent integer sqrt via BigDecimal.sqrt at 60 digits, then
    // PROVEN exact by the bracketing property (not by re-running the
    // formula under test)
    val dStar = BigInt(new java.math.BigDecimal(q.bigInteger)
      .sqrt(new java.math.MathContext(60))
      .setScale(0, java.math.RoundingMode.FLOOR).toBigIntegerExact)
    (dStar * dStar <= q) shouldBe true
    ((dStar + 1) * (dStar + 1) > q) shouldBe true
    // q is 28 digits: d^2*1e8 is ~3.7e35 at the boundary — representable
    // in DECIMAL(38), but d_num can reach n_a*n_b = 1e18, whose squared
    // left side is 1e44: the old in-plan compare overflowed exactly
    // where this one stays exact
    EventTime.ksReject(nA, nB, dStar) shouldBe false
    EventTime.ksReject(nA, nB, dStar + 1) shouldBe true
    // the D = 1 extreme at n_a*n_b = 1.6e19 (> Long nab) stays defined
    EventTime.ksReject(4000000000L, 4000000000L,
      BigInt(4000000000L) * BigInt(4000000000L)) shouldBe true
    // and D = 0 never rejects at any size
    EventTime.ksReject(4000000000L, 4000000000L, BigInt(0)) shouldBe false
  }

  test("evt_mannwhitney equals a brute-force midrank recompute, and " +
      "mwReject pins a hand example and stays exact past 64 bits") {
    import org.apache.spark.sql.functions.expr
    // brute force: collect both halves, walk the sorted value domain
    // accumulating midranks at 2x scale and the tie term
    val dayUs = 24L * 3600L * 1000000L
    val evs = graft.Tables.events(spark, sf)
      .select(expr(s"(ts div 1000) div $dayUs").as("day"),
        expr("cast(cast(value as decimal(18,2)) * 100 as bigint)").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val mid = (evs.map(_._1).min + evs.map(_._1).max + 1) / 2
    val a = evs.filter(_._1 < mid).map(_._2)
    val b = evs.filter(_._1 >= mid).map(_._2)
    var cum = 0L; var r2a = BigInt(0); var tie = BigInt(0)
    for ((v, rs) <- (a.map((_, 0)) ++ b.map((_, 1)))
        .groupBy(_._1).toSeq.sortBy(_._1)) {
      val t = rs.length.toLong; cum += t
      r2a += BigInt(rs.count(_._2 == 0)) * (2 * cum - t + 1)
      tie += BigInt(t) * t * t - t
    }
    val (nA, nB) = (a.length.toLong, b.length.toLong)
    val u2a = r2a - BigInt(nA) * (nA + 1)
    val d2 = u2a - BigInt(nA) * nB
    val row = graft.SparkEntry.queries("evt_mannwhitney")(spark, sf)
      .collect()(0)
    (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
      row.getLong(4), row.getBoolean(5)) shouldBe
      (nA, nB, u2a.toLong, d2.toLong, tie.toLong,
        EventTime.mwReject(nA, nB, d2, tie))
    // hand example A=[1,2,2] B=[2,3]: midranks 1/3/3/3/5 give
    // R_A = 7, U_A = 1 (checks against the #(a>b)+half-ties census),
    // u2 = 2, d2 = 2 - 6 = -4, T = 3^3-3 = 24; z far under 1.96
    EventTime.mwReject(3L, 2L, BigInt(-4), BigInt(24)) shouldBe false
    // exact boundary past 64 bits: nA = nB = 1e9, T = 0 —
    // reject <=> 7500 d2^2 n(n-1) > 9604 nAnB(n^3-n)
    val n9 = 1000000000L
    val nn = BigInt(n9) * 2
    val rhs = BigInt(9604) * n9 * n9 * (nn * nn * nn - nn)
    val lhsK = BigInt(7500) * nn * (nn - 1)
    val dStar = BigInt(new java.math.BigDecimal((rhs / lhsK).bigInteger)
      .sqrt(new java.math.MathContext(60))
      .setScale(0, java.math.RoundingMode.FLOOR).toBigIntegerExact)
    // bracketing proof, then the helper flips within +-1 of the
    // true real boundary (rhs/lhsK is not a perfect square, so the
    // strict inequality flips between dStar and dStar + 1)
    (dStar * dStar * lhsK <= rhs) shouldBe true
    ((dStar + 1) * (dStar + 1) * lhsK > rhs) shouldBe true
    EventTime.mwReject(n9, n9, dStar, BigInt(0)) shouldBe false
    EventTime.mwReject(n9, n9, dStar + 1, BigInt(0)) shouldBe true
    // degenerate: zero rank displacement never rejects
    EventTime.mwReject(n9, n9, BigInt(0), BigInt(0)) shouldBe false
  }

  test("evt_kruskal equals a brute-force three-group midrank recompute, " +
      "kwVerdict pins the textbook example, and the critical literal " +
      "is the true chi-square tail") {
    import org.apache.spark.sql.functions.expr
    // brute force: walk the sorted value domain accumulating doubled
    // midranks per temporal third and the tie term
    val dayUs = 24L * 3600L * 1000000L
    val evs = graft.Tables.events(spark, sf)
      .select(expr(s"(ts div 1000) div $dayUs").as("day"),
        expr("cast(cast(value as decimal(18,2)) * 100 as bigint)").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val (d0, d1) = (evs.map(_._1).min, evs.map(_._1).max)
    def grp(day: Long): Int =
      math.min(2L, (day - d0) * 3 / (d1 - d0 + 1)).toInt
    val tagged = evs.map(e => (e._2, grp(e._1)))
    var cum = 0L; val r2 = Array.fill(3)(BigInt(0)); var tie = BigInt(0)
    for ((_, rs) <- tagged.groupBy(_._1).toSeq.sortBy(_._1)) {
      val t = rs.length.toLong; cum += t
      for (g <- 0 to 2)
        r2(g) += BigInt(rs.count(_._2 == g)) * (2 * cum - t + 1)
      tie += BigInt(t) * t * t - t
    }
    val n = (0 to 2).map(g => tagged.count(_._2 == g).toLong)
    val (hM, rej) = EventTime.kwVerdict(
      n(0), n(1), n(2), r2(0), r2(1), r2(2), tie)
    val row = graft.SparkEntry.queries("evt_kruskal")(spark, sf)
      .collect()(0)
    (0 to 2).foreach(i => row.getLong(i) shouldBe n(i))
    (3 to 5).foreach(i => row.getLong(i) shouldBe r2(i - 3).toLong)
    row.getLong(6) shouldBe tie.toLong
    row.getLong(7) shouldBe hM
    row.getBoolean(8) shouldBe rej
    // all three thirds genuinely populated on the fixture
    n.foreach(_ should be > 0L)
    // textbook pin: A=[1,2,3] B=[4,5,6] C=[7,8,9] — no ties, doubled
    // rank sums (12, 30, 48); H = 12/(9·10)·(4+25+64)·9/3 − 30 = 7.2
    // > 5.9915 → reject, and the micro floor is exactly 7200000
    val (h72, rej72) = EventTime.kwVerdict(
      3L, 3L, 3L, BigInt(12), BigInt(30), BigInt(48), BigInt(0))
    h72 shouldBe 7200000L
    rej72 shouldBe true
    // all nine values tied: one tie group of 9 → T = 720 → Y = 0 →
    // the degenerate row (each member's doubled midrank is 10)
    EventTime.kwVerdict(3L, 3L, 3L,
      BigInt(30), BigInt(30), BigInt(30), BigInt(720)) shouldBe ((0L, false))
    // an empty third never rejects
    EventTime.kwVerdict(0L, 3L, 3L,
      BigInt(0), BigInt(21), BigInt(63), BigInt(0)) shouldBe ((0L, false))
    // identical rank distributions: X = 0 → H = 0, no rejection
    EventTime.kwVerdict(3L, 3L, 3L,
      BigInt(30), BigInt(30), BigInt(30), BigInt(0))._2 shouldBe false
    // the literal is the TRUE constant, not just self-consistent: at
    // df = 2 the chi-square tail is e^(−x/2), so the α = 0.05 critical
    // value must satisfy e^(−c/2) = 0.05 — checked against math.exp,
    // which breaks the single-source circularity. Micro-rounding moves
    // the tail by at most 0.05·(e^(0.25e−6) − 1) ≈ 1.25e−8.
    math.abs(math.exp(-EventTime.KwCritMicro / 2e6) - 0.05) should be < 1.3e-8
    math.abs(EventTime.KwCritMicro - 2.0 * math.log(20.0) * 1e6) should be <= 0.5
  }

  test("evt_spearman equals a brute-force midrank recompute, satisfies " +
      "the rank-sum identity, and a monotone hand series pins rho = ±1") {
    import org.apache.spark.sql.functions.expr
    val dayUs = 24L * 3600L * 1000000L
    val daily = graft.Tables.events(spark, sf)
      .select(expr(s"(ts div 1000) div $dayUs").as("day"),
        expr("cast(cast(value as decimal(18,2)) * 100 as bigint)").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).toSeq
      .map { case (_, es) => (es.length.toLong, es.map(_._2).sum) }
    def mid2(vals: Seq[Long]): Map[Long, Long] = {
      var cum = 0L
      vals.groupBy(identity).toSeq.sortBy(_._1).map { case (v, g) =>
        val t = g.length.toLong; cum += t
        v -> (2 * cum - t + 1)
      }.toMap
    }
    def spearman(xs: Seq[Long], ys: Seq[Long])
        : (Long, BigInt, BigInt, BigInt, Double) = {
      val (mx, my) = (mid2(xs), mid2(ys))
      val n = xs.length.toLong
      val rx = xs.map(mx); val ry = ys.map(my)
      def s(v: Seq[Long]) = v.map(BigInt(_)).sum
      def s2(a: Seq[Long], b: Seq[Long]) =
        a.zip(b).map { case (p, q) => BigInt(p) * q }.sum
      val num = BigInt(n) * s2(rx, ry) - s(rx) * s(ry)
      val vx = BigInt(n) * s2(rx, rx) - s(rx) * s(rx)
      val vy = BigInt(n) * s2(ry, ry) - s(ry) * s(ry)
      val rho = if (vx == 0 || vy == 0) 0.0
        else num.toDouble / math.sqrt(vx.toDouble * vy.toDouble)
      (n, num, vx, vy, rho)
    }
    val (n, num, vx, vy, rho) =
      spearman(daily.map(_._1), daily.map(_._2))
    // the doubled-midrank sums obey Σ mid2 = n(n+1) on BOTH axes
    mid2(daily.map(_._1)).map { case (v, m2) =>
      BigInt(m2) * daily.count(_._1 == v) }.sum shouldBe BigInt(n) * (n + 1)
    val row = graft.SparkEntry.queries("evt_spearman")(spark, sf)
      .collect()(0)
    (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) shouldBe
      ((n, num.toLong, vx.toLong, vy.toLong))
    row.getDouble(4) shouldBe rho
    math.abs(rho) should be <= 1.0
    // hand pins through the same recompute: a strictly monotone map
    // is rho = 1 exactly, its reversal −1, and heavy x-ties damp the
    // correlation strictly below 1 while staying positive
    spearman(Seq(1, 2, 3, 4), Seq(10, 20, 30, 40))._5 shouldBe 1.0
    spearman(Seq(1, 2, 3, 4), Seq(40, 30, 20, 10))._5 shouldBe -1.0
    val tied = spearman(Seq(1, 1, 1, 2), Seq(10, 20, 30, 40))._5
    tied should be > 0.0
    tied should be < 1.0
    // constant series: zero variance guards to rho = 0
    spearman(Seq(5, 5, 5), Seq(1, 2, 3))._5 shouldBe 0.0
  }

  test("evt_wilcoxon equals a brute-force per-user paired recompute, " +
      "and wilcoxonReject pins a hand example") {
    import org.apache.spark.sql.functions.expr
    val dayUs = 24L * 3600L * 1000000L
    val evs = graft.Tables.events(spark, sf)
      .select(expr(s"(ts div 1000) div $dayUs").as("day"),
        expr("user_id"),
        expr("cast(cast(value as decimal(18,2)) * 100 as bigint)").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val mid = (evs.map(_._1).min + evs.map(_._1).max + 1) / 2
    // per-user paired sums; only users active in BOTH halves, zero
    // differences dropped
    val diffs = evs.groupBy(_._2).values.flatMap { rs =>
      val a = rs.filter(_._1 < mid)
      val b = rs.filter(_._1 >= mid)
      if (a.isEmpty || b.isEmpty) None
      else {
        val dd = b.map(_._3).sum - a.map(_._3).sum
        if (dd == 0L) None else Some(dd)
      }
    }.toSeq
    var cum = 0L; var w2 = BigInt(0); var tie = BigInt(0)
    for ((ad, ds) <- diffs.groupBy(d => math.abs(d)).toSeq.sortBy(_._1)) {
      val t = ds.length.toLong; cum += t
      w2 += BigInt(ds.count(_ > 0)) * (2 * cum - t + 1)
      tie += BigInt(t) * t * t - t
    }
    val n = diffs.length.toLong
    val d2 = w2 - BigInt(n) * (n + 1) / 2
    n should be > 0L // the fixture genuinely pairs users
    val row = graft.SparkEntry.queries("evt_wilcoxon")(spark, sf)
      .collect()(0)
    (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
      row.getBoolean(4)) shouldBe
      (n, w2.toLong, d2.toLong, tie.toLong,
        EventTime.wilcoxonReject(n, d2, tie))
    // hand example: diffs {+1, -2, +3} -> |d| ranks 1,2,3,
    // W+ = 1 + 3 = 4, w2 = 8, d2 = 8 - 6 = 2, T = 0: far from 1.96
    EventTime.wilcoxonReject(3L, BigInt(2), BigInt(0)) shouldBe false
    // and the all-positive extreme {+1,+2,+3}: W+ = 6, w2 = 12,
    // d2 = 6 — still not significant at n = 3 (needs n >= 6 at
    // alpha = .05 two-sided, the textbook minimum)
    EventTime.wilcoxonReject(3L, BigInt(6), BigInt(0)) shouldBe false
    // n = 6 all-positive: W+ = 21, w2 = 42, d2 = 21: z = 2.20 > 1.96
    EventTime.wilcoxonReject(6L, BigInt(21), BigInt(0)) shouldBe true
  }

  test("evt_runs_test equals a sequential run census, and runsReject " +
      "pins alternating/clumped/balanced hand cases") {
    import org.apache.spark.sql.functions.expr
    val dayUs = 24L * 3600L * 1000000L
    val daily = graft.Tables.events(spark, sf)
      .select(expr(s"(ts div 1000) div $dayUs").as("day"),
        expr("cast(cast(value as decimal(18,2)) * 100 as bigint)").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    // lower median by (y, day) order, drop median-valued days
    val ym = daily.sortBy(t => (t._2, t._1))
      .apply((daily.length + 1) / 2 - 1)._2
    val signs = daily.filter(_._2 != ym).map(t => t._2 > ym)
    val n1 = signs.count(identity).toLong
    val n2 = signs.count(!_).toLong
    val runs =
      if (signs.isEmpty) 0L
      else 1L + signs.sliding(2).count(p => p.length == 2 && p(0) != p(1))
    val row = graft.SparkEntry.queries("evt_runs_test")(spark, sf)
      .collect()(0)
    (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
      row.getBoolean(4)) shouldBe
      (n1, n2, runs, (n1 + n2) * runs - 2 * n1 * n2 - (n1 + n2),
        EventTime.runsReject(n1, n2, runs))
    // perfect alternation (R = 20 at n1 = n2 = 10): z = +4.13, reject
    EventTime.runsReject(10L, 10L, 20L) shouldBe true
    // perfect clumping (R = 2): z = -4.13, the two-sided verdict
    // rejects on the other tail through the same squared comparison
    EventTime.runsReject(10L, 10L, 2L) shouldBe true
    // R = 11 = the exact mean: never rejects
    EventTime.runsReject(10L, 10L, 11L) shouldBe false
    // constant-sign degenerates report false, never divide by zero
    EventTime.runsReject(20L, 0L, 1L) shouldBe false
    EventTime.runsReject(1L, 1L, 2L) shouldBe false
  }

  test("evt_autocorr equals a BigInt-exact-then-one-double-chain " +
      "recompute at both lags") {
    import org.apache.spark.sql.functions.expr
    val dayUs = 24L * 3600L * 1000000L
    val daily = graft.Tables.events(spark, sf)
      .select(expr(s"(ts div 1000) div $dayUs").as("day"),
        expr("cast(cast(value as decimal(18,2)) * 100 as bigint)").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    def naive(k: Long): (Long, Double) = {
      val pairs = daily.toSeq.flatMap { case (day, yy) =>
        daily.get(day - k).map(x => (x, yy)) }
      val n = pairs.length.toLong
      // EXACT moments, then the identical IEEE chain the query runs
      val sx = pairs.map(p => BigInt(p._1)).sum.toDouble
      val sy = pairs.map(p => BigInt(p._2)).sum.toDouble
      val sxx = pairs.map(p => BigInt(p._1) * p._1).sum.toDouble
      val syy = pairs.map(p => BigInt(p._2) * p._2).sum.toDouble
      val sxy = pairs.map(p => BigInt(p._1) * p._2).sum.toDouble
      val den = math.sqrt(math.max(0.0,
        (n * sxx - sx * sx) * (n * syy - sy * sy)))
      (n, (n * sxy - sx * sy) / den)
    }
    val got = graft.SparkEntry.queries("evt_autocorr")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    got.keySet shouldBe Set(1L, 7L)
    Seq(1L, 7L).foreach { k =>
      val (n, r) = naive(k)
      got(k)._1 shouldBe n
      got(k)._2 shouldBe r
    }
  }

  test("evt_seasonal_anomaly matches a direct recompute and conditioning " +
      "on day-of-week changes some verdicts") {
    val DayUs = 86400000000L
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("event_type", s"((ts div 1000) div $DayUs + 4) % 7 as dow",
        "cast(cast(value as decimal(18,2)) * 100 as long) as y")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def outliers(g: Seq[Long], probe: Seq[Long]): Long = {
      val n = BigInt(g.length); val sc = g.map(BigInt(_)).sum
      val sc2 = g.map(v => BigInt(v) * v).sum
      probe.count { v =>
        val lhs = (n * v - sc) * (n * v - sc)
        lhs > 9 * (n * sc2 - sc * sc)
      }.toLong
    }
    val byType = ev.groupBy(_._1).view.mapValues(_.map(_._3).toSeq).toMap
    val expected = ev.groupBy(t => (t._1, t._2)).map { case ((tp, dw), g) =>
      val vs = g.map(_._3).toSeq
      (tp, dw, vs.size.toLong, outliers(vs, vs), outliers(byType(tp), vs))
    }.toSeq.sortBy(t => (t._1, t._2))
    val got = graft.SparkEntry.queries("evt_seasonal_anomaly")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    got shouldBe expected
    // the seasonal baseline genuinely changes at least one verdict
    got.exists(t => t._4 != t._5) shouldBe true
    got.map(_._5).sum should be > 0L
  }

  test("evt_time_to_convert matches a direct first-touch recompute") {
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "event_type", "ts div 1000 as tus")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1).view.mapValues { g =>
      (g.filter(_._2 == "view").map(_._3).minOption,
        g.filter(_._2 == "purchase").map(_._3).minOption)
    }.toMap
    val dts = byUser.values.collect {
      case (Some(fv), Some(fpv)) if fpv > fv => fpv - fv
    }.toSeq
    def median2(xs: Seq[Long]): Long = {
      val s0 = xs.sorted; s0((s0.length - 1) / 2) + s0(s0.length / 2)
    }
    val got = graft.SparkEntry.queries("evt_time_to_convert")(spark, sf)
      .collect().head
    got.getLong(0) shouldBe byUser.size.toLong
    got.getLong(1) shouldBe dts.size.toLong
    got.getLong(2) shouldBe (byUser.size - dts.size).toLong
    got.getLong(3) shouldBe median2(dts)
    dts.size should be > 0
  }

  test("evt_user_growth: first-touch identity equals a brute cumulative " +
      "distinct") {
    val DayUs = 86400000000L
    val ud = graft.Tables.events(spark, sf)
      .selectExpr("user_id", s"(ts div 1000) div $DayUs as day")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val firstDay = ud.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val days = firstDay.values.toSeq.distinct.sorted
    val expected = days.map { d =>
      val nNew = firstDay.count(_._2 == d).toLong
      // brute-force cumulative distinct — the definition the
      // first-touch identity replaces
      val cum = ud.filter(_._2 <= d).map(_._1).distinct.length.toLong
      (d, nNew, cum)
    }
    val got = graft.SparkEntry.queries("evt_user_growth")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldBe expected
    got.last._3 shouldBe firstDay.size.toLong
  }

  test("evt_slo_burn matches a sequential budget fold and the objective " +
      "discriminates") {
    val DayUs = 86400000000L
    val ev = graft.Tables.events(spark, sf)
      .selectExpr(s"(ts div 1000) div $DayUs as day",
        "event_type = 'error' as e")
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    var burn = 0L
    val expected = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (d, g) =>
      val t = g.length.toLong
      val e = g.count(_._2).toLong
      burn += 5L * e - t
      (d, t, e, burn, burn > 0L)
    }
    val got = graft.SparkEntry.queries("evt_slo_burn")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSeq
    got shouldBe expected
    // the budget position genuinely oscillates: daily increments
    // (5·errors − total) carry both signs (at sf0.01 the cumulative
    // crosses zero too — 19/30 breach days; at this sf the cumulative
    // happens to stay positive, which is fixture luck, not mechanism)
    val incs = got.map(t => 5L * t._3 - t._2)
    incs.exists(_ > 0L) shouldBe true
    incs.exists(_ < 0L) shouldBe true
  }

  test("evt_interarrival matches a sort-based gap median/MAD recompute") {
    def median2(xs: Seq[Long]): Long = {
      val s0 = xs.sorted; s0((s0.length - 1) / 2) + s0(s0.length / 2)
    }
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "event_type", "event_id", "ts div 1000 as tus")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    val gaps = ev.groupBy(e => (e._1, e._2)).values.flatMap { g =>
      val ts = g.sortBy(e => (e._4, e._3)).map(_._4)
      ts.zip(ts.drop(1)).map { case (a, b) => (g.head._2, b - a) }
    }.toSeq
    val expected = gaps.groupBy(_._1).map { case (t, g) =>
      val vs = g.map(_._2)
      (t, vs.length.toLong, median2(vs), median2(
        vs.map(v => math.abs(2 * v - median2(vs)))))
    }.toSeq.sortBy(_._1)
    val got = graft.SparkEntry.queries("evt_interarrival")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    got shouldBe expected
    got.foreach { case (t, n, m2, _) =>
      withClue(s"$t:") { n should be > 0L; m2 should be > 0L }
    }
  }

  test("evt_rolling_trend matches a sliding-window OLS recompute") {
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "ts div 1000 as tus",
        "(ts div 1000) div 60000000 - 28401120 as x",
        "cast(cast(value as decimal(18,2)) * 100 as long) as y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val expected = ev.groupBy(_._1).flatMap { case (u, g) =>
      val sorted = g.sortBy(e => (e._3, e._2)).toIndexedSeq
      sorted.indices.map { i =>
        val win = sorted.slice(math.max(0, i - 7), i + 1)
        val n = BigInt(win.length)
        val sx = win.map(e => BigInt(e._4)).sum
        val sy = win.map(e => BigInt(e._5)).sum
        val sxy = win.map(e => BigInt(e._4) * e._5).sum
        val sx2 = win.map(e => BigInt(e._4) * e._4).sum
        (u, sorted(i)._2, win.length.toLong,
          (n * sxy - sx * sy).toLong, (n * sx2 - sx * sx).toLong)
      }
    }.toSeq.sortBy(t => (t._1, t._2))
    val got = graft.SparkEntry.queries("evt_rolling_trend")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    got shouldBe expected
    // trends point both ways somewhere (rises and falls)
    got.exists(t => t._4 > 0) shouldBe true
    got.exists(t => t._4 < 0) shouldBe true
  }

  test("evt_chi_square matches a direct contingency recompute") {
    val DayUs = 86400000000L
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("event_type", s"((ts div 1000) div $DayUs + 4) % 7 as dow")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val cells = ev.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rowM = ev.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val colM = ev.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = BigInt(ev.length)
    val expected = cells.keys.toSeq.groupBy(_._1).map { case (tp, ks) =>
      val contribs = ks.map { case (t, dw) =>
        val o = BigInt(cells((t, dw)))
        val num = (o * n - BigInt(rowM(t)) * colM(dw))
        val c = BigDecimal.decimal(
          (num * num).toDouble / (n * rowM(t) * colM(dw)).toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        c
      }
      (tp, ks.map(k => cells(k)).sum, contribs.sum.toDouble,
        ks.size.toLong)
    }.toSeq.sortBy(_._1)
    val got = graft.SparkEntry.queries("evt_chi_square")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSeq
    got shouldBe expected
    // every type observed every weekday on the fixture
    got.foreach(_._4 shouldBe 7L)
  }

  test("evt_stickiness matches a brute-force DAU/WAU recompute and " +
      "WAU dominates DAU") {
    val ud = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "(ts div 1000) div 86400000000 as day")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val expected = ud.map(_._2).distinct.sorted.map { d =>
      val dau = ud.filter(_._2 == d).map(_._1).distinct.length.toLong
      val wau = ud.filter(t => t._2 >= d - 6 && t._2 <= d)
        .map(_._1).distinct.length.toLong
      (d, dau, wau)
    }.toSeq
    val got = graft.SparkEntry.queries("evt_stickiness")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldBe expected
    got.foreach { case (d, dau, wau) =>
      withClue(s"day $d:") { wau should be >= dau }
    }
    // the window genuinely widens the audience somewhere
    got.exists(t => t._3 > t._2) shouldBe true
  }

  test("evt_lift_chart matches a direct decile recompute and the lift " +
      "rationals are conserved") {
    val ev = graft.Tables.events(spark, sf)
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val users = ev.groupBy(_._1).map { case (u, g) =>
      val t = g.map(_._2)
      (u, t.count(_ == "click").toLong,
        t.count(_ == "purchase") > t.count(_ == "error"))
    }.toSeq.sortBy { case (u, sc, _) => (-sc, u) }
    val n = users.length
    val (q, r) = (n / 10, n % 10)
    def tileOf(rank0: Int): Long =
      if (rank0 < (q + 1) * r) rank0 / (q + 1) + 1L
      else (rank0 - (q + 1) * r) / math.max(q, 1) + r + 1L
    val tu = n.toLong
    val tr = users.count(_._3).toLong
    val expected = users.zipWithIndex
      .groupBy { case (_, i) => tileOf(i) }
      .map { case (d, g) =>
        val resp = g.count(_._1._3).toLong
        (d, g.size.toLong, resp, resp * tu, g.size * tr)
      }.toSeq.sortBy(_._1)
    val got = graft.SparkEntry.queries("evt_lift_chart")(spark, sf)
      .collect().map(r2 => (r2.getLong(0), r2.getLong(1), r2.getLong(2),
        r2.getLong(3), r2.getLong(4))).toSeq
    got shouldBe expected
    // conservation: responders across deciles sum to the population
    got.map(_._3).sum shouldBe tr
    got.map(_._2).sum shouldBe tu
  }

  test("evt_user_entropy matches a direct recompute and orders users " +
      "by behavioral diversity") {
    val ev = graft.Tables.events(spark, sf)
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = ev.groupBy(_._1).map { case (u, g) =>
      val counts = g.groupBy(_._2).values.map(_.length.toLong).toSeq
      val n = counts.sum
      val sclnc = counts.map { c =>
        (BigDecimal(c) * BigDecimal.decimal(math.log(c.toDouble))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP))
      }.sum
      (u, n, counts.size.toLong,
        BigDecimal.decimal(math.log(n.toDouble) - sclnc.toDouble / n)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy(_._1)
    val got = graft.SparkEntry.queries("evt_user_entropy")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    got shouldBe expected
    // entropies are positive (all users mix types) and below ln(5)
    got.foreach { case (u, _, _, h) =>
      withClue(s"user $u:") {
        h should be > 0.0
        h should be <= math.log(5.0) + 1e-6
      }
    }
  }

  test("evt_peak_concurrency equals a sequential sweep over session " +
      "intervals") {
    val GapUs = 30L * 60L * 1000000L
    val DayUs = 86400000000L
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "ts div 1000 as tus", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // sessions by the 30-min gap rule, sequentially per user
    val intervals = ev.groupBy(_._1).values.flatMap { g =>
      val ts = g.sortBy(e => (e._2, e._3)).map(_._2)
      val runs = scala.collection.mutable.ArrayBuffer((ts.head, ts.head))
      ts.tail.foreach { t =>
        if (t - runs.last._2 > GapUs) runs += ((t, t))
        else runs(runs.length - 1) = (runs.last._1, t)
      }
      runs
    }.toSeq
    // sequential sweep: +1 at start, −1 at end+1, ties +1 first
    val deltas = (intervals.map(i => (i._1, 1L)) ++
      intervals.map(i => (i._2 + 1L, -1L)))
      .sortBy { case (t, dlt) => (t, -dlt) }
    var conc = 0L
    val peaks = scala.collection.mutable.Map.empty[Long, Long]
    deltas.foreach { case (t, dlt) =>
      conc += dlt
      val day = t / DayUs
      peaks(day) = math.max(peaks.getOrElse(day, Long.MinValue), conc)
    }
    val expected = peaks.toSeq.sortBy(_._1)
    val got = graft.SparkEntry.queries("evt_peak_concurrency")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    got shouldBe expected
    // concurrency is genuinely plural somewhere
    got.map(_._2).max should be > 1L
  }

  test("evt_cusum: the window prefix-min identity equals the sequential " +
      "CUSUM recurrence, and the detector discriminates") {
    // independent recompute: the SEQUENTIAL recurrence the closed form
    // replaces — S_t = max(0, S_{t-1} + (n·y_t − Σy − n·K))
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "ts div 1000 as tus",
        "cast(cast(value as decimal(18,2)) * 100 as long) as y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val expected = ev.groupBy(_._1).map { case (u, g) =>
      val ys = g.sortBy(e => (e._3, e._2)).map(_._4)
      val n = ys.length.toLong
      val sy = ys.sum
      var s = 0L; var maxS = 0L; var alarms = 0L
      ys.foreach { y =>
        s = math.max(0L, s + (n * y - sy - n * 7500L))
        maxS = math.max(maxS, s)
        if (s > 10000L * n) alarms += 1
      }
      (u, n, maxS, alarms)
    }.toSeq.sortBy(_._1)
    val got = graft.SparkEntry.queries("evt_cusum")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    got shouldBe expected
    // the slack does its job: the detector neither fires for everyone
    // nor for no one
    val alarming = got.count(_._4 > 0)
    alarming should be > 0
    alarming should be < got.size
  }

  test("changepoint split equals a BigInt argmax replay of every candidate") {
    val DayUs = 86400000000L
    val daily = Tables.events(spark, sf)
      .selectExpr(s"(ts div 1000) div $DayUs as day",
        "cast(cast(value as decimal(18,2)) * 100 as bigint) as y")
      .groupBy("day").agg(org.apache.spark.sql.functions.sum("y").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = daily.length
    val total = daily.map(_._2).sum
    var cum = 0L
    val cands = daily.dropRight(1).zipWithIndex.map { case ((day, y), i) =>
      cum += y
      val (nl, nr) = (i + 1L, n - i - 1L)
      val (sl, sr) = (cum, total - cum)
      val g = (BigInt(sl) * sl * nr + BigInt(sr) * sr * nl).toDouble /
        (nl * nr).toDouble
      (day, nl, nr, sl, sr, g)
    }
    val best = cands.maxBy(c => (c._6, -c._1))
    val got = graft.SparkEntry.queries("evt_changepoint")(spark, sf)
      .collect()(0)
    got.getAs[Long]("split_day") shouldBe best._1
    got.getAs[Long]("n_left") shouldBe best._2
    got.getAs[Long]("n_right") shouldBe best._3
    got.getAs[Long]("sum_left_cents") shouldBe best._4
    got.getAs[Long]("sum_right_cents") shouldBe best._5
    got.getAs[Long]("n_days") shouldBe n.toLong
    // a split exists strictly inside the series
    best._2 should be >= 1L
    best._3 should be >= 1L
  }

  test("Theil-Sen ignores a planted outlier that drags OLS, and the real " +
      "query equals a local median-of-slopes recompute") {
    import spark.implicits._
    // y = 5x exactly, except the LAST day is corrupted 500x: the
    // pairwise-slope median stays exactly 5 (190 of 210 pairs avoid
    // the outlier), while OLS chases it
    val series = (0L to 20L).map(x =>
      (x, if (x == 20L) 50000L else 5L * x)).toDF("x", "y")
    val planted = EventTime.theilSen(series).collect()(0)
    planted.getAs[Long]("slope_num").toDouble /
      planted.getAs[Long]("slope_den") shouldBe 5.0
    // OLS on the same series is nowhere near 5 (the point of the op)
    val pts = (0L to 20L).map(x => (x.toDouble,
      if (x == 20L) 50000.0 else 5.0 * x))
    val n = pts.size
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sx2 = pts.map(p => p._1 * p._1).sum
    val ols = (n * sxy - sx * sy) / (n * sx2 - sx * sx)
    math.abs(ols - 5.0) should be > 10.0
    // the real query equals a local recompute under the same
    // deterministic (value, num, den) order
    val daily = Tables.events(spark, sf)
      .selectExpr(s"(ts div 1000) div ${24L * 3600 * 1000000L} as day",
        "cast(cast(value as decimal(18,2)) * 100 as bigint) as y")
      .groupBy("day").agg(org.apache.spark.sql.functions.sum("y").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val x0 = daily.map(_._1).min
    val xs = daily.map(t => (t._1 - x0, t._2)).sortBy(_._1)
    val pairSlopes = (for {
      i <- xs.indices; j <- i + 1 until xs.length
    } yield (xs(j)._2 - xs(i)._2, xs(j)._1 - xs(i)._1))
      .sortBy { case (num, den) => (num.toDouble / den, num, den) }
    val (sn, sd) = pairSlopes((pairSlopes.length + 1) / 2 - 1)
    val resid = xs.map { case (x, y) => y * sd - sn * x }
      .sortBy(r => (r.toDouble / sd, r))
    val in = resid((resid.length + 1) / 2 - 1)
    val got = graft.SparkEntry.queries("evt_theil_sen")(spark, sf)
      .collect()(0)
    got.getAs[Long]("slope_num") shouldBe sn
    got.getAs[Long]("slope_den") shouldBe sd
    got.getAs[Long]("icept_num") shouldBe in
    got.getAs[Long]("n_pairs") shouldBe pairSlopes.length.toLong
  }

  test("SPRT: an all-success sequence accepts H1 at the calibrated step, " +
      "an all-failure sequence accepts H0, and the walk matches a replay") {
    import spark.implicits._
    val a = math.round(math.log(0.22 / 0.18) * 1e6) //  200671
    val b = math.round(math.log(0.78 / 0.82) * 1e6) //  -50010
    val bound = math.round(math.log(19.0) * 1e6) //  2944439
    // variant 0: 100 successes — crosses +bound at ceil(bound/a);
    // variant 1: 100 failures — crosses -bound at ceil(bound/-b)
    val nUp = (bound + a - 1) / a
    val nDn = (bound + (-b) - 1) / (-b)
    val ev = ((1 to 100).map(i => (0L, i.toLong, i.toLong, 1L)) ++
      (1 to 100).map(i => (1L, i.toLong, (1000 + i).toLong, 0L)))
      .toDF("variant", "tus", "event_id", "succ")
    val got = EventTime.sprtDecisions(spark, ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5), r.getLong(6)))
    got(0) shouldBe (0L, 100L, 100L, 100L * a, "accept_h1", nUp, nUp * a)
    got(1) shouldBe (1L, 100L, 0L, 100L * b, "accept_h0", nDn, nDn * b)
    // absent parity class: a corpus with only variant 0 emits ONE row
    // (the oracle's GROUP BY shape), never a null-aggregate row for
    // the missing variant; the empty corpus emits zero rows
    val solo = EventTime.sprtDecisions(spark,
      ev.filter($"variant" === 0L)).collect()
    solo.map(_.getLong(0)).toSeq shouldBe Seq(0L)
    solo(0).getString(4) shouldBe "accept_h1"
    EventTime.sprtDecisions(spark, ev.filter($"variant" === 99L))
      .collect() shouldBe empty
    // and the real query's walk agrees with a sequential replay
    val events = Tables.events(spark, sf)
      .selectExpr("user_id % 2 as variant", "ts div 1000 as tus", "event_id",
        "case when event_type = 'purchase' then 1L else 0L end as succ")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val real = graft.SparkEntry.queries("evt_sprt")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(4), r.getLong(5), r.getLong(6)))
    Seq(0L, 1L).foreach { vv =>
      val walk = events.filter(_._1 == vv).sortBy(t => (t._2, t._3))
        .scanLeft(0L)((acc, e) => acc + (if (e._4 == 1L) a else b)).drop(1)
      val crossIdx = walk.indexWhere(l => l >= bound || l <= -bound)
      val (decision, at, llr) =
        if (crossIdx < 0) ("continue", 0L, 0L)
        else (if (walk(crossIdx) >= bound) "accept_h1" else "accept_h0",
          crossIdx + 1L, walk(crossIdx))
      real.find(_._1 == vv).get shouldBe (vv, decision, at, llr)
    }
  }

  private val DayUs = 86400000000L

  /** (day, ts_us, event_id, cents, event_type, user_id) off the
    * normalized events contract — shared by the round-11 recomputes. */
  private def evRows: Seq[(Long, Long, Long, Long, String, Long)] =
    graft.Tables.events(spark, sf)
      .selectExpr("(ts div 1000) div 86400000000 as day", "ts div 1000 as tu",
        "event_id", "cast(cast(value as decimal(18,2)) * 100 as long) as c",
        "event_type", "user_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5))).toSeq

  test("evt_ohlc equals a sequential first/last/extremes recompute") {
    val expected = evRows.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (day, es) =>
        val byTime = es.sortBy(e => (e._2, e._3))
        (day, byTime.head._4, byTime.last._4,
          es.map(_._4).max, es.map(_._4).min, es.size.toLong)
    }
    val got = graft.SparkEntry.queries("evt_ohlc")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    got shouldBe expected
    // open/close are genuinely positional, not extremes, somewhere
    got.exists(r => r._2 != r._4 && r._2 != r._5) shouldBe true
  }

  test("evt_sax equals a sequential PAA + exact-quartile recompute") {
    val segs = evRows.groupBy(e => e._2 / (6L * 3600000000L))
      .map { case (seg, es) => (seg, es.map(_._4).sum) }.toSeq
    val sorted = segs.map(_._2).sorted
    val n = sorted.length
    def q(p: Long) = sorted(((p * n + 99) / 100 - 1).toInt)
    val (q25, q50, q75) = (q(25), q(50), q(75))
    def sym(c: Long) =
      if (c < q25) "a" else if (c < q50) "b" else if (c < q75) "c" else "d"
    val expected = segs.groupBy(_._1 / 4).toSeq.sortBy(_._1).map {
      case (day, ss) =>
        val bySlot = ss.sortBy(_._1)
        (day, bySlot.map(s => sym(s._2)).mkString,
          ss.size.toLong, ss.map(_._2).sum)
    }
    val got = graft.SparkEntry.queries("evt_sax")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    got shouldBe expected
    // the alphabet genuinely discriminates on the fixture
    got.map(_._2).mkString.toSet.size should be >= 3
  }

  test("evt_moments equals a BigInt central-moment recompute") {
    val xs = evRows.map(_._4)
    val n = BigInt(xs.length)
    val s1 = xs.map(BigInt(_)).sum
    val s2 = xs.map(x => BigInt(x) * x).sum
    val s3 = xs.map(x => BigInt(x) * x * x).sum
    val s4 = xs.map(x => BigInt(x) * x * x * x).sum
    val m2 = n * s2 - s1 * s1
    val m3 = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1
    val m4 = n * n * n * s4 - 4 * n * n * s1 * s3 +
      6 * n * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1
    val r = graft.SparkEntry.queries("evt_moments")(spark, sf).collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2)) shouldBe
      (xs.length.toLong, s1.toLong, s2.toLong)
    def r12(x: Double) = BigDecimal(x).setScale(12,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    r.getDouble(3) shouldBe
      r12(m3.toDouble / (m2.toDouble * math.sqrt(m2.toDouble)))
    r.getDouble(4) shouldBe
      r12(m4.toDouble / (m2.toDouble * m2.toDouble) - 3.0)
    // the fixture tail is genuinely right-skewed and heavy
    r.getDouble(3) should be > 0.5
    r.getDouble(4) should be > 0.0
  }

  test("evt_cross_corr equals a direct paired-moment recompute at " +
      "every lag") {
    val daily = evRows.groupBy(_._1).map { case (day, es) =>
      (day, es.count(_._5 == "error").toLong, es.map(_._4).sum)
    }.toSeq
    val byDay = daily.map(d => d._1 -> d).toMap
    val got = graft.SparkEntry.queries("evt_cross_corr")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    got.map(_._1).toSeq shouldBe Seq(0L, 1L, 2L, 3L)
    got.foreach { case (k, nPairs, corr) =>
      val pairs = daily.flatMap { case (day, _, yv) =>
        byDay.get(day - k).map(b => (b._2, yv)) // x from day−k, y at day
      }
      nPairs shouldBe pairs.size.toLong
      val n = BigInt(pairs.size)
      val sx = pairs.map(p => BigInt(p._1)).sum
      val sy = pairs.map(p => BigInt(p._2)).sum
      val sxx = pairs.map(p => BigInt(p._1) * p._1).sum
      val syy = pairs.map(p => BigInt(p._2) * p._2).sum
      val sxy = pairs.map(p => BigInt(p._1) * p._2).sum
      val num = n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble
      val den = math.sqrt(math.max(0.0,
        (n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) *
          (n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble)))
      withClue(s"lag $k: ") {
        den should be > 0.0 // both fixture series genuinely vary
        math.abs(corr - num / den) should be < 1e-9
      }
    }
  }

  test("evt_hill_tail equals a sequential top-101 quantized-ln recompute " +
      "and lands in a plausible alpha range") {
    val top = evRows.map(_._4).filter(_ > 0).sorted.reverse.take(101)
    val q6 = (v: Long) =>
      BigDecimal(math.log(v.toDouble)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP)
    val sln = top.map(q6).sum
    val m = top.length
    val hill = (sln.toDouble - m * q6(top.min).toDouble) / (m - 1)
    val r = graft.SparkEntry.queries("evt_hill_tail")(spark, sf).collect()(0)
    r.getLong(0) shouldBe (m - 1).toLong
    r.getLong(1) shouldBe top.min
    math.abs(r.getDouble(2) - hill) should be < 1e-9
    r.getDouble(3) should be > 1.0 // a finite-mean tail on the fixture
  }

  test("evt_fano equals an exact cross-multiplied dispersion recompute") {
    val byType = evRows.groupBy(_._5)
    val hrs = evRows.map(_._2 / 3600000000L)
    val h = BigInt(hrs.max - hrs.min + 1)
    val expected = byType.toSeq.sortBy(_._1).map { case (t, es) =>
      val cs = es.groupBy(_._2 / 3600000000L).values.map(_.size.toLong)
      val n = BigInt(cs.sum)
      val s2 = cs.map(c => BigInt(c) * c).sum
      (t, n.toLong, cs.size.toLong,
        ((h * s2 - n * n) * 1000000 / (h * n)).toLong,
        h * s2 - n * n > h * n)
    }
    val got = graft.SparkEntry.queries("evt_fano")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSeq
    got shouldBe expected
    // near-Poisson synthetic traffic: every Fano lands around 1, and
    // the verdict column discriminates in at least one direction
    got.foreach(_._4 should (be > 500000L and be < 2000000L))
  }

  test("evt_pot_tail equals a sequential order-statistic + excess recompute") {
    val xs = evRows.map(_._4).sorted
    val k = ((95L * xs.length + 99L) / 100L).toInt
    val u = xs(k - 1)
    val exceed = xs.filter(_ > u)
    val r = graft.SparkEntry.queries("evt_pot_tail")(spark, sf).collect()(0)
    r.getLong(0) shouldBe u
    r.getLong(1) shouldBe exceed.length.toLong
    r.getLong(2) shouldBe exceed.map(_ - u).sum
    r.getDouble(3) shouldBe
      exceed.map(_ - u).sum.toDouble / exceed.length
    // the tail is genuinely heavy: mean excess well above zero
    r.getDouble(3) should be > 100.0
  }

  test("evt_decay_sum equals a sequential dyadic-weight recompute") {
    val maxd = evRows.map(_._1).max
    val expected = evRows.groupBy(_._6).toSeq.sortBy(_._1).map {
      case (u, es) =>
        val num = es.map(e =>
          BigInt(e._4) << (30 - (maxd - e._1)).toInt).sum
        (u, es.size.toLong, num.toLong, (num >> 30).toLong)
    }
    val got = graft.SparkEntry.queries("evt_decay_sum")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    got shouldBe expected
    // decay genuinely discounts: the decayed floor is under the raw sum
    val raw = evRows.groupBy(_._6).view.mapValues(_.map(_._4).sum)
    got.foreach { case (u, _, _, fl) => fl should be < raw(u) }
  }

  test("evt_bootstrap_ci: thresholds are floor(256*PoissonCDF(1)), the " +
      "envelope brackets the exact mean, and a replicate's weights " +
      "match a JDK-md5 recompute") {
    // the fixed CASE thresholds in poissonWeightSql, re-derived:
    // pmf(k) = e^-1 / k!, cdf = running sum
    val pmf = (0 to 4).map(k =>
      math.exp(-1.0) / (1 to k).map(_.toDouble).product)
    val cdf = pmf.scanLeft(0.0)(_ + _).tail
    cdf.map(c => math.floor(256 * c).toLong) shouldBe
      Seq(94L, 188L, 235L, 251L, 255L)

    val rows = graft.SparkEntry.queries("evt_bootstrap_ci")(spark, sf)
      .collect()
    rows should not be empty
    rows.foreach { r =>
      val (mean, lo, hi) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      lo should be <= hi
      // the envelope is a resampling CI around the exact mean: each
      // replicate reweights the same rows, so min <= mean-ish <= max
      // holds loosely; assert the envelope at least OVERLAPS the mean
      // within its own width (a sign-error or byte-misparse throws it
      // orders of magnitude off)
      val width = math.max(hi - lo, 1.0)
      math.abs(mean - (lo + hi) / 2) should be <= 3 * width
    }
    // brute-force replicate 0 weights on real rows via JDK md5
    import spark.implicits._
    val sample = Tables.events(spark, sf)
      .select($"event_id".cast("string")).limit(64).as[String].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    def weight(id: String): Int = {
      val hex = md.digest(id.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val u8 = Integer.parseInt(hex.substring(0, 2), 16)
      if (u8 < 94) 0 else if (u8 < 188) 1 else if (u8 < 235) 2
      else if (u8 < 251) 3 else if (u8 < 255) 4 else 5
    }
    val viaSql = Tables.events(spark, sf)
      .select($"event_id".cast("string").as("id"))
      .limit(64)
      .selectExpr("id", "md5(id) AS h")
      .selectExpr("id", EventTime.poissonWeightSql(0) + " AS w")
      .as[(String, Int)].collect().toMap
    sample.foreach { id => viaSql(id) shouldBe weight(id) }
  }
}
