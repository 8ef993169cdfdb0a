package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** SQL-surface registration of graft's custom expressions. */
class GraftExtensionsSpec extends AnyFunSuite with Matchers {

  test("graft_rolling_hash is callable from SQL via extensions") {
    // getOrCreate reuses any active session and would skip extension
    // registration — clear the session slots (keeping the shared
    // SparkContext) so a fresh session with extensions is built
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = spark.sql(
        "SELECT graft_rolling_hash('abc'), graft_rolling_hash('abc', 131)")
        .collect().head
      r.getLong(0) shouldBe 96354L // ((97*31)+98)*31+99
      r.getLong(1) shouldBe "abc".foldLeft(0L)((h, c) => (h * 131 + c) % 1000000007L)
      val err = intercept[Exception] {
        spark.sql("SELECT graft_rolling_hash('a', 'b', 'c')").collect()
      }
      err.getMessage should include("graft_rolling_hash")

      // native vector expressions, and parity with the plain-Scala fold
      val v = spark.sql(
        """SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(-1.0d, 0.5d, 2.0d)),
                  graft_l2sq(array(1.0d, 2.0d), array(3.0d, -1.0d)),
                  graft_dot(array(1.0d), CAST(null AS ARRAY<DOUBLE>)),
                  graft_dot(array(1.0d, CAST(null AS DOUBLE)), array(2.0d, 3.0d)),
                  graft_dot(array(1.0d), array(1.0d, 2.0d))""")
        .collect().head
      v.getDouble(0) shouldBe (1.0 * -1.0 + 2.0 * 0.5 + 3.0 * 2.0)
      v.getDouble(1) shouldBe (4.0 + 9.0)
      v.isNullAt(2) shouldBe true // null array -> null
      v.isNullAt(3) shouldBe true // null element -> null, never 0.0
      v.isNullAt(4) shouldBe true // length mismatch -> null, no truncation
      // non-array<double> input rejected at analysis, not silently read
      val typeErr = intercept[Exception] {
        spark.sql("SELECT graft_dot(CAST(array(1.0) AS ARRAY<FLOAT>), " +
          "CAST(array(1.0) AS ARRAY<FLOAT>))").collect()
      }
      typeErr.getMessage.toLowerCase should include("graft_dot")

      // simhash60 over a literal token array matches the expression API
      val sh = spark.sql(
        """SELECT graft_simhash60(array('a', 'b')),
                  graft_simhash60(array())""").collect().head
      val expected = {
        import org.apache.spark.sql.catalyst.util.GenericArrayData
        import org.apache.spark.unsafe.types.UTF8String
        graft.functions.SimHash.simhash60Boxed(new GenericArrayData(
          Array[Any](UTF8String.fromString("a"), UTF8String.fromString("b"))))
      }
      sh.getLong(0) shouldBe expected.longValue()
      sh.isNullAt(1) shouldBe true // empty array -> null (explode drop-out)
      // wrong-typed input rejected at analysis, not read via Unsafe
      val shErr = intercept[Exception] {
        spark.sql("SELECT graft_simhash60('not an array')").collect()
      }
      shErr.getMessage.toLowerCase should include("graft_simhash60")
      val shErr2 = intercept[Exception] {
        spark.sql("SELECT graft_simhash60(array(1L, 2L))").collect()
      }
      shErr2.getMessage.toLowerCase should include("graft_simhash60")
    } finally {
      // don't stop(): that would kill the SparkContext shared with the
      // other suites — just restore the previous session slots
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
