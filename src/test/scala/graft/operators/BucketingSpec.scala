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

  test("PQ ADC search over codes bucketed by vec_id: zero shuffle exchanges") {
    val sf = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions.col
    try {
      val (codes, books) = Similarity.pqPersistedModel(spark, sf)
      Bucketing.writeBucketed(codes, "b_pq_codes", "vec_id", 4)
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
      val plain = Similarity.pqAdcDistances(codes, lut)
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
