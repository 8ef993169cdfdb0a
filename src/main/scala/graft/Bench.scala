package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Non-headline queries are correctness-only and
  * excluded so the benchmark measures the scan/join/agg/window hot paths
  * rather than 40 tiny projections.
  *
  * Timing materializes EVERY output column via `bit_xor(xxhash64(*))` —
  * a plain `.count()` would let Catalyst prune projections the count
  * does not need (e.g. a window sum that no filter reads), so some
  * queries would time scan+count instead of the operator under test.
  */
object Bench {

  /** Column-pruning-proof materialization: the hash consumes all output
    * columns, so the full plan must execute; the result is one long.
    * The fold is BIT_XOR, not SUM — summing xxhash64 longs overflows
    * almost immediately under ANSI mode and aborts the query mid-run
    * (which the old silent catch recorded as a fast "success"); XOR
    * cannot overflow and is order-independent. */
  private def materialize(df: org.apache.spark.sql.DataFrame): Unit = {
    import org.apache.spark.sql.functions._
    df.agg(bit_xor(xxhash64(df.columns.map(col): _*))).collect()
    ()
  }

  /** Release everything a query pinned (localCheckpoint/persist/cache).
    * ~20 of the 24 headliners checkpoint a shared frame; without an
    * explicit blocking unpersist the async ContextCleaner lets storage
    * accumulate across reps and queries, and later queries in the
    * alphabet pay for earlier queries' blocks (the r04 2-5x inflation
    * of the llm_* tail). Runs OUTSIDE the timed region. */
  private def releaseStorage(spark: SparkSession): Unit = {
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    spark.catalog.clearCache()
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tuning.configure(SparkSession.builder(), cpus.toInt)
      .master(s"local[$cpus]")
      // local override: at sf0.1 the 2x-cores rule's partitions are
      // pure scheduling overhead; match cores exactly
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Dev aid: SPARK_GRAFT_QUERIES=a,b,c times just those queries (any
    // registered query, headline or not). Unset = the headline set.
    val names = sys.env.get("SPARK_GRAFT_QUERIES") match {
      case Some(list) => list.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      case None       => SparkEntry.headlineQueries
    }

    // JVM + parquet-footer warm-up on the smallest SF so the timed runs
    // measure execution, not first-touch classloading/codegen.
    names.foreach { name =>
      try materialize(SparkEntry.queries(name)(spark, "/root/testdata/sf0.001"))
      catch { case _: Throwable => () }
      releaseStorage(spark)
    }
    // Per-query MEDIAN of `reps` runs (default 3), with reps INTERLEAVED
    // as passes: run every query once (pass 1), then pass 2, then pass 3,
    // and take each query's median ACROSS passes. Same total cost as
    // back-to-back reps, but a contiguous ambient-load window (the
    // multi-minute stalls that inflated the alphabetically-adjacent
    // llm_* block 2-5x in rounds 5-7) now hits each query at most once
    // instead of all three of its reps, so the median survives one
    // contaminated pass. Single-shot timings carry ±0.3 s scheduler
    // noise on sub-second queries; the cross-pass median is robust to
    // one bad draw per query from either source.
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt)
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val passTimes: Seq[Map[String, Double]] = (1 to reps).map { _ =>
      names.map { name =>
        val t0 = System.nanoTime()
        val elapsed =
          try {
            materialize(SparkEntry.queries(name)(spark, sfDir))
            (System.nanoTime() - t0) / 1e9
          } catch {
            case e: Throwable =>
              // a failed query must not masquerade as a fast one: flag it
              // with a negative time and say so on stderr
              System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
              -1.0
          }
        // storage hygiene between queries, outside the timed region:
        // every timing starts from an empty block store, so passes
        // compare like-for-like and load vs. leak is diagnosable from
        // the per-pass times below
        releaseStorage(spark)
        name -> elapsed
      }.toMap
    }
    // Spread-triggered extra passes: interleaving defends against a
    // single contaminated pass, but an ambient-load window spanning TWO
    // of three passes still captures the median (r08: q1_pricing_summary
    // 10.02/1.06/5.36 -> median 5.36 vs settled 0.88). When a query's
    // cross-pass spread (max/min) exceeds 3x, something other than the
    // plan drove at least one rep; re-run that query alone up to 2 more
    // times — later in wall-clock, so decorrelated from the load window —
    // and take the median of ALL its samples. Cost is bounded: only
    // high-spread queries pay, at most 2 extra reps each.
    val spreadLimit = sys.env.getOrElse("SPARK_GRAFT_SPREAD", "3.0").toDouble
    val extraReps = math.max(0, sys.env.getOrElse("SPARK_GRAFT_EXTRA_REPS", "2").toInt)
    val results = names.map { name =>
      val base = passTimes.map(_(name))
      if (base.exists(_ < 0)) name -> (-1.0, base)
      else {
        val spread = base.max / math.max(base.min, 1e-9)
        val times =
          if (reps < 2 || spread <= spreadLimit) base
          else base ++ (1 to extraReps).map { _ =>
            val t0 = System.nanoTime()
            val t =
              try { materialize(SparkEntry.queries(name)(spark, sfDir)); (System.nanoTime() - t0) / 1e9 }
              catch { case e: Throwable =>
                System.err.println(s"[bench] $name extra-rep FAILED: ${e.getMessage}"); -1.0 }
            releaseStorage(spark)
            t
          }.filter(_ >= 0)
        name -> (median(times), times)
      }
    }
    def fmt(d: Double): String = BigDecimal(d)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, (m, _)) => "\"" + k + "\":" + fmt(m) }
      .mkString("{", ",", "}")
    // per-pass times (pass order = list order) so a one-off load spike
    // is distinguishable from a genuine regression without rerunning —
    // a contaminated pass shows as the SAME index elevated across many
    // queries. Printed as a SEPARATE line:
    // the harness that collects the bench keeps only a bounded tail of
    // stdout and parses the LAST line as JSON — with 27 queries the
    // combined line crossed that buffer and round 6's total was lost
    // ("parsed": null). The final line must stay compact.
    val repsJson = results.map { case (k, (_, ts)) =>
      "\"" + k + "\":" + ts.map(fmt).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    println(s"""{"metric":"rep_times","rep_times":$repsJson}""")
    val total = results.map(_._2._1).filter(_ >= 0).sum
    val sfJson = sfDir.replace("\\", "\\\\").replace("\"", "\\\"")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfJson","reps":$reps,"stat":"median-across-passes"}""")
    spark.stop()
  }
}
