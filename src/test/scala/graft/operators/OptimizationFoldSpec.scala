package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Focused gates for the round-16 optimization rewrites that changed
  * operator INTERNALS (the oracle proves the fixture answer; these
  * prove the rewrite's semantics on the edge cases the fixture may
  * not contain).
  *
  *  - The bpe/wordpiece argmax fold: `min(struct(-score, -n, u, v))`
  *    must pick exactly the first row of
  *    `ORDER BY score DESC, n DESC, u, v LIMIT 1` — including on
  *    ties, where the struct comparator's binary string order must
  *    match the sort's.
  *  - The closure-doubling round sizing: `ancestorClosure(p, r)`
  *    covers every ancestor at distance ≤ 2^r − 1, and
  *    q_hierarchy_rollup's adaptive formula picks the minimal such r
  *    — an off-by-one in either direction would drop the deepest
  *    ancestors (caught here on a pure path graph, the worst case).
  */
class OptimizationFoldSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("argmax-as-aggregate equals ORDER BY ... LIMIT 1 on every tie shape") {
    import spark.implicits._
    // score ties broken by n, n ties broken by (u, v) binary order —
    // includes case-sensitive and prefix string ties
    val rows = Seq(
      ("b", "x", 5L, 2.0), ("a", "y", 5L, 2.0), ("a", "x", 5L, 2.0),
      ("A", "z", 5L, 2.0), ("aa", "x", 5L, 2.0), ("z", "z", 7L, 2.0),
      ("q", "q", 7L, 1.5), ("r", "r", 1L, 2.0))
    val df = rows.toDF("u", "v", "n", "score")
    val viaSort = df.orderBy($"score".desc, $"n".desc, $"u", $"v")
      .limit(1).select($"u", $"v", $"n", $"score").collect()(0)
    val viaAgg = df
      .agg(min(struct((-$"score").as("ns"), (-$"n").as("nn"), $"u", $"v"))
        .as("b"))
      .select($"b.u", $"b.v", (-$"b.nn").as("n"), (-$"b.ns").as("score"))
      .collect()(0)
    viaAgg shouldBe viaSort
    // the empty-input contract the fold must keep: limit(1) on empty
    // yields zero rows, and so must the filtered aggregate
    val empty = df.filter($"n" < 0L)
      .agg(min(struct((-$"score").as("ns"), (-$"n").as("nn"), $"u", $"v"))
        .as("b"))
      .select($"b.u".as("u"), $"b.v".as("v"))
      .filter($"u".isNotNull)
    empty.count() shouldBe 0L
  }

  test("band-frame width bound dominates the exact bucket width and " +
      "keeps the pair set identical with the probe skipped") {
    import spark.implicits._
    // 40 docs over several partitions; docs 1-10 share ONE fingerprint
    // set (identical signatures — every band collides, a 10-wide
    // bucket), the rest are near-unique
    val docs = (1L to 40L)
      .map(k => (k, if (k <= 10L) Seq(100L, 200L, 300L)
                    else Seq(k * 13L, k * 17L, k * 29L)))
      .toDF("doc_id", "fps")
      .repartition(5)
    val (bands, bound) = Dedup.bandFrameWithBound(docs, nBands = 4, rowsPerBand = 2)
    // the Scala fold's keys must mirror the SQL band-key projection:
    // the bound (sum of per-partition maxes) can never under-state a
    // bucket counted from the frame itself
    val exactMax = bands.groupBy($"band", $"band_key")
      .agg(count(lit(1)).as("w")).agg(max($"w")).head().getLong(0)
    assert(bound >= exactMax,
      s"width bound $bound under-states exact max bucket width $exactMax")
    // and the pair primitive returns the same pairs whether the probe
    // ran (no bound) or the bound certified the plain join
    val viaProbe = Dedup.boundedBucketPairs(bands, "doc_id",
        Seq("band", "band_key"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaBound = Dedup.boundedBucketPairs(bands, "doc_id",
        Seq("band", "band_key"), widthBound = Some(bound))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    viaBound shouldBe viaProbe
    viaProbe should not be empty
  }

  test("adaptive closure rounds cover a pure path graph at the depth " +
      "boundary (2^r - 1) and one past it") {
    import spark.implicits._
    // path 1 <- 2 <- ... <- d: node k's ancestors are k-1 .. 1, the
    // deepest chain a parent-pointer forest admits
    def closureOk(depth: Int, rounds: Int): Boolean = {
      val par = (2 to depth + 1)
        .map(k => (k.toLong, k - 1L)).toDF("node", "parent")
      val got = Relational.ancestorClosure(par, rounds)
        .select($"node", $"anc", $"dist").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = (for {
        k <- 2 to depth + 1; a <- 1 until k
      } yield (k.toLong, a.toLong, (k - a).toLong)).toSet
      got == want
    }
    def roundsFor(depth: Long): Int = {
      var r = 1
      while ((1L << r) - 1 < depth) r += 1
      r
    }
    // depth 7 = 2^3 - 1 needs exactly 3 rounds; depth 8 rolls to 4
    roundsFor(7) shouldBe 3
    roundsFor(8) shouldBe 4
    closureOk(7, roundsFor(7)) shouldBe true
    closureOk(8, roundsFor(8)) shouldBe true
    // and the minimality claim: one round fewer genuinely misses the
    // deepest ancestors (the test would pass vacuously otherwise)
    closureOk(8, roundsFor(8) - 1) shouldBe false
  }
}
