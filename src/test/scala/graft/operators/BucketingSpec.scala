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
