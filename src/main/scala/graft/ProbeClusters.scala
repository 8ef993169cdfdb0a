package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe: where does dedup_clusters spend its time at sf0.1?
  * (not part of the library surface; remove or keep as a diagnostic) */
object ProbeClusters {
  def main(args: Array[String]): Unit = {
    val cpus = 32
    val spark = Tuning.configure(SparkSession.builder(), cpus)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // warm-up
    operators.Dedup.queries("dedup_simhash_pairs_banded")
      .fn(spark, "/root/testdata/sf0.001").collect()

    val pairs = time("banded pairs (count)") {
      operators.Dedup.queries("dedup_simhash_pairs_banded").fn(spark, d).count()
    }
    println(s"[probe] pair rows: $pairs")
    time("banded pairs again") {
      operators.Dedup.queries("dedup_simhash_pairs_banded").fn(spark, d).count()
    }
    time("full dedup_clusters") {
      operators.Dedup.queries("dedup_clusters").fn(spark, d).collect()
    }

    // sketch alone, then a banded self-join over a CHECKPOINTED sketch
    {
      import org.apache.spark.sql.functions._
      val sketch = time("dedup_simhash sketch (collect)") {
        operators.Dedup.queries("dedup_simhash").fn(spark, d).localCheckpoint(true)
      }
      // attach lang (dedup_simhash output is doc_id, simhash only? check)
      println("[probe] sketch cols: " + sketch.columns.mkString(","))
      val sim = Tables.documents(spark, d).select(col("doc_id"), col("lang"))
        .join(sketch, "doc_id").localCheckpoint(true)
      time("banded join over checkpointed sketch") {
        val widths = Seq(7, 7, 7, 7, 7, 7, 6, 6, 6)
        val offsets = widths.scanLeft(0)(_ + _).dropRight(1)
        val segs = widths.zip(offsets).zipWithIndex.map { case ((w, off), i) =>
          struct(lit(i).as("band"),
            shiftright(col("simhash"), off).bitwiseAND(lit((1L << w) - 1)).as("seg"))
        }
        val bands = sim
          .select(col("doc_id"), col("lang"), col("simhash"),
            explode(array(segs: _*)).as("bs"))
          .select(col("doc_id"), col("lang"), col("simhash"),
            col("bs.band").as("band"), col("bs.seg").as("seg"))
        val n = bands.as("a").join(bands.as("b"),
            col("a.lang") === col("b.lang") && col("a.band") === col("b.band") &&
            col("a.seg") === col("b.seg") && col("a.doc_id") < col("b.doc_id"))
          .withColumn("hamming", bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))))
          .filter(col("hamming") <= 8)
          .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
          .distinct().count()
        println(s"[probe] pairs via checkpointed sketch: $n")
      }
    }

    // replicate the loop with per-iteration timing
    {
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val pairsDf = time("pairs for loop") {
        operators.Dedup.queries("dedup_simhash_pairs_banded").fn(spark, d)
          .select($"doc1", $"doc2").localCheckpoint(true)
      }
      val edges = pairsDf.select($"doc1".as("src"), $"doc2".as("dst"))
        .union(pairsDf.select($"doc2".as("src"), $"doc1".as("dst")))
        .localCheckpoint(true)
      var labels = Tables.documents(spark, d)
        .select($"doc_id", $"doc_id".as("cluster"))
        .localCheckpoint(true)
      var changed = 1L
      var iter = 0
      while (changed > 0 && iter < 25) {
        time(s"iter $iter") {
          val nmin = edges
            .join(labels.withColumnRenamed("doc_id", "src"), Seq("src"))
            .groupBy($"dst".as("doc_id")).agg(min($"cluster").as("nc"))
          val stepped = labels.join(nmin, Seq("doc_id"), "left_outer")
            .select($"doc_id", $"cluster".as("old"),
              least($"cluster", coalesce($"nc", $"cluster")).as("mid"))
          val reps = labels.select($"doc_id".as("mid"), $"cluster".as("rep"))
          val updated = stepped.join(reps, Seq("mid"), "left_outer")
            .select($"doc_id", $"old",
              least($"mid", coalesce($"rep", $"mid")).as("cluster"))
            .localCheckpoint(true)
          changed = updated.filter($"cluster" =!= $"old").count()
          labels = updated.select($"doc_id", $"cluster")
          iter += 1
          println(s"[probe]   changed=$changed")
        }
      }
    }
    spark.stop()
  }
}
