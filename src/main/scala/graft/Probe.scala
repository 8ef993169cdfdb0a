package graft
import org.apache.spark.sql.SparkSession

/** Scratch probe for environment checks (not part of the library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val pairs = SparkEntry.queries("dedup_simhash_pairs_banded")(spark, dir)
    println(s"== pairs: ${pairs.count()}")
    val clusters = SparkEntry.queries("dedup_clusters")(spark, dir)
    import org.apache.spark.sql.functions._
    clusters.groupBy("cluster_id").count()
      .agg(count(lit(1)).as("n_clusters"), max("count").as("biggest"))
      .show()
    spark.stop()
  }
}
