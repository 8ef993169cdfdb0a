package graft
import org.apache.spark.sql.SparkSession

/** Scratch probe for environment checks (not part of the library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Tuning.configure(SparkSession.builder(), 4)
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    for (t <- Seq("events", "orders", "embeddings", "documents")) {
      try {
        val df = spark.read.parquet(s"$dir/$t.parquet")
        println(s"== $t: ${df.count()} rows")
        df.printSchema()
      } catch { case e: Throwable => println(s"== $t FAILED: ${e.getMessage.take(300)}") }
    }
    spark.stop()
  }
}
