package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{Tables, TestSpark}

/** Gates for the Z-order layout: the oracle proves the rank + curve
  * arithmetic and bucket assignment; these prove the LAYOUT CLAIM —
  * curve buckets bound BOTH key dimensions, which is what makes
  * min-max file skipping work for filters on either key, unlike a
  * single-key sort.
  */
class LayoutSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Scala reference interleave (a-bits on even positions, b on odd). */
  private def zRef(a: Long, b: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("the generated z expression equals the reference bit interleave") {
    import spark.implicits._
    val probes = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 0L), (0L, 65535L),
      (19999L, 999L), (12345L, 678L), (15L, 15L), (1L, 1L))
    val got = probes.toDF("a", "b")
      .selectExpr("a", "b", s"${Layout.zExpr("a", "b", 16, "div")} AS z")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    probes.foreach { case (a, b) =>
      withClue(s"($a, $b):") { got((a, b)) shouldBe zRef(a, b, 16) }
    }
  }

  /** ntile cut points: first (n % k) tiles get one extra row. */
  private def ntileSlices(n: Int, k: Int): Seq[(Int, Int)] = {
    val q = n / k; val r = n % k
    val sizes = Seq.tabulate(k)(i => if (i < r) q + 1 else q)
    sizes.scanLeft(0)(_ + _).zip(sizes)
  }

  /** Reference recompute of the whole rank→curve→bucket pipeline.
    * (l_orderkey, l_linenumber) is not unique, so ranks are assigned
    * per row INDEX with the same content-determining tiebreaks the
    * query sorts on — tied rows are identical tuples, so any tie order
    * yields the same bucket statistics. */
  private def referenceBuckets(rows: Array[(Long, Int, Long, Long)])
      : Seq[Array[(Long, Int, Long, Long)]] = {
    val n = rows.length
    def ranksBy[K: Ordering](key: Int => K): Array[Int] = {
      val order = rows.indices.sortBy(key)
      val rank = new Array[Int](n)
      ntileSlices(n, 16).zipWithIndex.foreach { case ((o, sz), t) =>
        order.slice(o, o + sz).foreach(i => rank(i) = t + 1)
      }
      rank
    }
    val pkRank = ranksBy { i =>
      val (ok, ln, pk, sk) = rows(i); (pk, ok, ln, sk) }
    val skRank = ranksBy { i =>
      val (ok, ln, pk, sk) = rows(i); (sk, ok, ln, pk, pkRank(i)) }
    val z = rows.indices.map(i => zRef(pkRank(i) - 1L, skRank(i) - 1L, 4))
    val curved = rows.indices.sortBy { i =>
      val (ok, ln, pk, sk) = rows(i); (z(i), ok, ln, pk, sk) }
    ntileSlices(n, 16).map { case (o, sz) =>
      curved.slice(o, o + sz).map(rows).toArray }
  }

  private lazy val rows: Array[(Long, Int, Long, Long)] =
    Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))

  test("z buckets bound BOTH dims; a single-key sort leaves the other dim unbounded") {
    val pkRange = (rows.map(_._3).max - rows.map(_._3).min + 1).toDouble
    val skRange = (rows.map(_._4).max - rows.map(_._4).min + 1).toDouble
    def spanPk(b: Array[(Long, Int, Long, Long)]) =
      (b.map(_._3).max - b.map(_._3).min + 1).toDouble
    def spanSk(b: Array[(Long, Int, Long, Long)]) =
      (b.map(_._4).max - b.map(_._4).min + 1).toDouble

    val zBuckets = referenceBuckets(rows)
    // single-key comparison layout: same bucket count, sorted by pk only
    val pkSorted = rows.sortBy { case (ok, ln, pk, _) => (pk, ok, ln) }
    val pkBuckets = ntileSlices(rows.length, 16).map { case (o, sz) =>
      pkSorted.slice(o, o + sz) }

    // the 1-D layout cannot cluster the second key: every bucket's
    // suppkey envelope stays essentially full-range
    pkBuckets.map(spanSk).min should be > skRange * 0.8
    // the Z layout bounds BOTH envelopes in every bucket
    all(zBuckets.map(spanPk)) should be < pkRange * 0.6
    all(zBuckets.map(spanSk)) should be < skRange * 0.6
    // so for a filter on suppkey alone, min-max stats skip most
    // Z-buckets but no pk-sorted bucket: mean covered fraction of the
    // suppkey range must be at least 2x better under Z
    val zCover = zBuckets.map(spanSk).sum / zBuckets.size / skRange
    val pkCover = pkBuckets.map(spanSk).sum / pkBuckets.size / skRange
    zCover should be < pkCover * 0.5
  }

  test("q_zorder_layout bucket stats agree with the reference pipeline recompute") {
    val expected = referenceBuckets(rows).zipWithIndex.map { case (b, i) =>
      (i + 1L) -> ((b.length.toLong, b.map(_._3).min, b.map(_._3).max,
        b.map(_._4).min, b.map(_._4).max))
    }.toMap
    val got = graft.SparkEntry.queries("q_zorder_layout")(spark, sf).collect()
    got.length shouldBe 16
    got.foreach { row =>
      val (cnt, minPk, maxPk, minSk, maxSk) = expected(row.getLong(0))
      withClue(s"bucket ${row.getLong(0)}:") {
        row.getLong(1) shouldBe cnt
        (row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5)) shouldBe
          ((minPk, maxPk, minSk, maxSk))
      }
    }
  }

  // ── Bloom file-skipping: contract + effectiveness + direct recompute ──

  test("hilbert LUT is a bijection whose consecutive positions are " +
      "grid-adjacent, and hilbert buckets beat z-order envelope area") {
    val n = 16
    val lut = Layout.hilbertLut
    lut.sorted shouldBe (0 until n * n)
    // the defining locality property: each curve step moves to a
    // 4-neighbor cell (Z-order violates this at every power-of-two
    // boundary)
    val pos = (for { x <- 0 until n; y <- 0 until n }
      yield lut(x * n + y) -> (x, y)).toMap
    (0 until n * n - 1).foreach { i =>
      val (ax, ay) = pos(i); val (bx, by) = pos(i + 1)
      withClue(s"step $i: ") {
        (math.abs(ax - bx) + math.abs(ay - by)) shouldBe 1
      }
    }
    // measured payoff on the fixture: summed per-bucket bounding-box
    // area strictly below the z-order layout's (~26% at this SF)
    def area(name: String): Long =
      graft.SparkEntry.queries(name)(spark, sf).collect().map { r =>
        (r.getLong(3) - r.getLong(2) + 1L) * (r.getLong(5) - r.getLong(4) + 1L)
      }.sum
    val (za, ha) = (area("q_zorder_layout"), area("q_hilbert_layout"))
    ha should be < za
  }

  test("q_bloom_skipping has zero false negatives and actually prunes") {
    val out = graft.SparkEntry.queries("q_bloom_skipping")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    out.length shouldBe 10
    // the Bloom contract: no file containing the key is ever skipped
    all(out.map(_._5)) shouldBe 0L
    val (present, absent) = out.partition(_._2)
    present.length shouldBe 5
    // present keys truly exist, and the index passes at least their files
    all(present.map(_._4)) should be >= 1L
    present.foreach { case (k, _, pass, actual, _) =>
      withClue(s"key $k:") { pass should be >= actual }
    }
    // absent keys exist in no file; at ~1% fp the 40 absent probe-file
    // checks should pass almost nowhere — pruning must be real
    all(absent.map(_._4)) shouldBe 0L
    absent.map(_._3).sum should be <= 10L
    // and some present key must spread over >1 file, or the layout
    // degenerated and the test proves nothing
    present.map(_._4).max should be > 1L
  }

  test("q_bloom_skipping verdicts match a direct single-threaded bloom recompute") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong))
    def shard(ok: Long, ln: Long): Long =
      (((ok * 8 + ln) % 1000003L) * 2654435761L) % 1000000007L % 8L
    val keys = li.map { case (ok, ln) => (shard(ok, ln), ok) }.distinct
    val perShard = keys.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nbits = perShard.view.mapValues(ks =>
      ((ks.size.toLong * 10 + 61) / 62) * 62).toMap
    val hashes = Layout.BloomHashes
    def bits(s: Long): Set[Long] = perShard(s).flatMap(k =>
      hashes.map { case (a, b) => (a * (k % 1000003L) + b) % 1000000007L % nbits(s) })
    val bloom: Map[Long, Set[Long]] = perShard.keys.map(s => s -> bits(s)).toMap
    val allKeys = keys.map(_._2).distinct.sorted
    val probes = allKeys.take(5).map((_, true)) ++
      (1 to 5).map(i => (allKeys.max + i, false))
    val expected = probes.map { case (k, exp) =>
      val pass = (0L until 8L).count { s =>
        nbits.contains(s) && hashes.forall { case (a, b) =>
          bloom.get(s).exists(_.contains((a * (k % 1000003L) + b) % 1000000007L % nbits(s))) }
      }.toLong
      val actual = (0L until 8L).count(s => perShard.get(s).exists(_.contains(k))).toLong
      (k, exp, pass, actual, 0L)
    }
    val got = graft.SparkEntry.queries("q_bloom_skipping")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    got.sortBy(_._1) shouldBe expected.sortBy(_._1).toArray
  }

  test("cut-point routing reproduces the full rewrite's assignment row-for-row") {
    import spark.implicits._
    // sf0.01: the 4-tuple (orderkey, linenumber, partkey, suppkey) is
    // unique there, so per-row equality is well-defined (sf0.001 has
    // one duplicated tuple, which the rewrite may split across a tile
    // boundary while routing cannot — identical rows are
    // interchangeable, but multiset comparison would see it)
    val base = Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey")
    val ranked = Layout.zorderRanked(spark, base).localCheckpoint(true)
    val cuts = Layout.zorderCutRows(ranked)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(r.fieldIndex("l_orderkey")),
        r.getInt(r.fieldIndex("l_linenumber")),
        r.getLong(r.fieldIndex("l_partkey")),
        r.getLong(r.fieldIndex("l_suppkey")))
    val rewrite = ranked.collect()
      .map(r => key(r) -> r.getLong(r.fieldIndex("bucket"))).toMap
    val routed = Layout.routeByCuts(spark, base, cuts).collect()
      .map(r => key(r) -> r.getLong(r.fieldIndex("bucket")))
    routed.length shouldBe rewrite.size
    routed.foreach { case (k, b) =>
      withClue(s"row $k:") { b shouldBe rewrite(k) }
    }
  }

  test("cut-point routing is a pure projection: no exchange, no join, no sort") {
    import spark.implicits._
    val base = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey")
    val cuts = Layout.zorderCutRows(
      Layout.zorderRanked(spark, base).localCheckpoint(true))
    val inc = Tables.lineitem(spark, sf)
      .filter($"l_orderkey" % 8 === 7)
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey")
    val plan = Layout.routeByCuts(spark, inc, cuts)
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
    plan should not include "Join"
    plan should not include "Sort"
  }
}
