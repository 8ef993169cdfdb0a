package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
    import spark.implicits._
    val d = "/root/testdata/sf0.1"
    // replicate the dedup_clusters loop with per-iteration timing
    val t0 = System.nanoTime()
    val pairs = SparkEntry.queries("dedup_simhash_pairs_banded")(spark, d)
      .select($"doc1", $"doc2")
    val edges = pairs.select($"doc1".as("src"), $"doc2".as("dst"))
      .union(pairs.select($"doc2".as("src"), $"doc1".as("dst")))
      .localCheckpoint(true)
    println(f"== edges built: ${(System.nanoTime() - t0) / 1e9}%.2f s (${edges.count()} edges)")
    var labels = Tables.documents(spark, d)
      .select($"doc_id", $"doc_id".as("cluster")).localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < 25) {
      val ti = System.nanoTime()
      val nmin = edges.join(labels.withColumnRenamed("doc_id", "src"), Seq("src"))
        .groupBy($"dst".as("doc_id")).agg(min($"cluster").as("nc"))
      val stepped = labels.join(nmin, Seq("doc_id"), "left_outer")
        .select($"doc_id", $"cluster".as("old"),
          least($"cluster", coalesce($"nc", $"cluster")).as("mid"))
      val reps = labels.select($"doc_id".as("mid"), $"cluster".as("rep"))
      val updated = stepped.join(reps, Seq("mid"), "left_outer")
        .select($"doc_id", $"old", least($"mid", coalesce($"rep", $"mid")).as("cluster"))
        .localCheckpoint(true)
      changed = updated.filter($"cluster" =!= $"old").count()
      labels = updated.select($"doc_id", $"cluster")
      iter += 1
      println(f"== iter $iter: changed=$changed ${(System.nanoTime() - ti) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
