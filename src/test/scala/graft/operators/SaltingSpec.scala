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
