package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{Tables, TestSpark}

class SaltingSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("salted join equals the plain join on a skewed key distribution") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    // manufacture skew: fold most orderkeys onto one hot key
    val skewed = Tables.lineitem(spark, sf)
      .withColumn("jk",
        org.apache.spark.sql.functions.when($"l_orderkey" % 7 =!= 0, 42L)
          .otherwise($"l_orderkey"))
    val dim = Tables.orders(spark, sf)
      .select($"o_orderkey".as("jk"), $"o_orderpriority")
    val plain = skewed.join(dim, "jk")
    val salted = Salting.saltedJoin(skewed, dim, "jk", nSalts = 8)
    salted.count() shouldBe plain.count()
    // spot-check content equality via an aggregate signature
    def sig(df: org.apache.spark.sql.DataFrame) = df
      .groupBy($"o_orderpriority")
      .agg(org.apache.spark.sql.functions.sum($"l_extendedprice".cast("decimal(18,2)")).as("s"),
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
      .orderBy($"o_orderpriority")
      .collect().toSeq
    sig(salted) shouldBe sig(plain)
  }

  test("planted hot key: salt bounds per-shuffle-key input and the join partitions on (key, salt)") {
    import org.apache.spark.sql.functions.{count, lit, max, when}
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val nSalts = 8
    // pathological single-key skew — one key wider than any partition
    // is the case AQE's skew splitting cannot subdivide (the blowup is
    // inside one hash bucket, not across partitions)
    val skewed = Tables.lineitem(spark, sf)
      .withColumn("jk", when($"l_orderkey" % 7 =!= 0, 42L).otherwise($"l_orderkey"))
    val dim = Tables.orders(spark, sf)
      .select($"o_orderkey".as("jk"), $"o_orderpriority")

    // a shuffle-key's row count IS a lower bound on some task's input:
    // unsalted, the hot key lands whole in one task
    def maxKeyRows(df: org.apache.spark.sql.DataFrame,
        keys: Seq[String]): Long =
      df.groupBy(keys.map(org.apache.spark.sql.functions.col): _*)
        .agg(count(lit(1)).as("n")).agg(max($"n")).head.getLong(0)
    val hot = maxKeyRows(skewed, Seq("jk"))
    hot should be > (nSalts * 100L) // the fixture really is skewed
    val saltedSpread = maxKeyRows(
      skewed.withColumn("salt", Salting.defaultSalt(skewed, nSalts)),
      Seq("jk", "salt"))
    // the content-hash salt spreads the hot key near-uniformly: no
    // (key, salt) task input exceeds ~1.5x the ideal hot/nSalts slice
    saltedSpread should be <= (hot * 3L) / (nSalts * 2L)

    // and the executed join really shuffles on (key, salt): the salt
    // column appears in the exchange partitioning, so the bound above
    // is the bound the shuffle actually enforces. (Force the shuffle
    // join: at 100 TB the dim side of a salted join is not
    // broadcastable — that regime is the operator's reason to exist.)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val salted = Salting.saltedJoin(skewed, dim, "jk", nSalts)
      salted.count() // materialize through AQE
      val plan = salted.queryExecution.executedPlan.toString
      plan should include("__graft_salt")
      "hashpartitioning\\(jk[^)]*__graft_salt".r.findFirstIn(plan) should not be empty
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("salt bounds are respected and nSalts=1 degenerates to the plain join") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, sf)
    val dim = Tables.orders(spark, sf).select($"o_orderkey".as("l_orderkey"), $"o_orderstatus")
    Salting.saltedJoin(li, dim, "l_orderkey", 1).count() shouldBe li.join(dim, "l_orderkey").count()
    an[IllegalArgumentException] should be thrownBy
      Salting.saltedJoin(li, dim, "l_orderkey", 0)
  }
}
