package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Smoke: every registered query executes at sf0.001 and the flagship
  * entry returns rows (the driver's t1 check). Oracle equivalence is
  * checked by graft.Verify + tools/check.py at sf0.01.
  */
class QuerySmokeSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("provenance summary resolves from the build resource") {
    Provenance.summary should startWith("kafkaconnectftpspark 0.1.0")
  }

  test("entry returns rows") {
    SparkEntry.entry(spark).count() should be > 0L
  }

  test("every query name has unique, well-formed oracle wiring") {
    val qs = SparkEntry.allQueries
    qs.keys.foreach(k => k should fullyMatch regex "[a-z0-9_]+")
    SparkEntry.oracleSql.keySet.subsetOf(qs.keySet) shouldBe true
  }

  test("scanOnce persist mode produces identical results to localCheckpoint") {
    // the fault-tolerant pin (spark.graft.scanOnce=persist, DISK_ONLY_2)
    // must be a pure strategy swap: same rows from the scan-once queries
    def rows(name: String) =
      SparkEntry.queries(name)(spark, sf).collect().toSeq.map(_.toSeq)
    val before = Seq("evt_retention", "evt_anomaly").map(n => n -> rows(n))
    spark.conf.set("spark.graft.scanOnce", "persist")
    try before.foreach { case (n, expected) =>
      withClue(s"$n under persist mode: ") { rows(n) shouldBe expected }
    } finally spark.conf.unset("spark.graft.scanOnce")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name executes at sf0.001") {
      noException should be thrownBy fn(spark, sf).count()
    }
  }
}
