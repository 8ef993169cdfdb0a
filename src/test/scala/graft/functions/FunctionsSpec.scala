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

  test("multimodal decode stub: batch shape and determinism") {
    import spark.implicits._
    val payloads = Seq((1L, "abcd".getBytes), (2L, Array.emptyByteArray))
      .toDS()
    val out = graft.operators.Multimodal.decodePartitions(payloads)
      .collect().sortBy(_.doc_id)
    out.map(_.byte_len) shouldBe Seq(4L, 0L)
    out.head.width shouldBe 5
    out.head.format shouldBe "img/fake-jpeg"
    out(1).format shouldBe "img/fake-png"
  }
}
