package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-query execution profiler for the optimization rounds: runs the
  * named queries (args; default the headline set) with the bench's
  * session shape and materialization, and prints per query the
  * wall-clock seconds plus the scheduler-level counters the bench JSON
  * cannot show — jobs launched, stages run, tasks run, summed executor
  * task time, and shuffle bytes read/written. On the small bench SFs
  * most headline queries are JOB-COUNT-bound, not byte-bound; this is
  * the instrument that says which (guide §1: measure first, §7.1: find
  * where the time goes). Not part of the library surface; the driver
  * contract lives in Bench/Verify.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tuning.configure(SparkSession.builder(), cpus.toInt)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.headlineQueries

    val jobs = new AtomicLong; val stages = new AtomicLong
    val tasks = new AtomicLong; val taskMs = new AtomicLong
    val shufR = new AtomicLong; val shufW = new AtomicLong
    val dumpStages = sys.env.get("PROBE_STAGES").contains("1")
    val dumpJobs = sys.env.get("PROBE_JOBS").contains("1")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (dumpJobs) {
          val desc = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(Option(j.properties)
              .flatMap(p => Option(p.getProperty("callSite.short"))))
            .getOrElse("?")
          println(f"[job] id=${j.jobId}%4d stages=${j.stageIds.size}%2d  " +
            desc.take(140))
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks.toLong)
        if (dumpStages) {
          val i = s.stageInfo
          val ms = i.taskMetrics
          println(f"[stage] id=${i.stageId}%4d tasks=${i.numTasks}%4d " +
            f"taskTime=${ms.executorRunTime / 1000.0}%7.2f s " +
            f"in=${ms.inputMetrics.bytesRead / 1048576.0}%7.1f MiB " +
            f"sr=${ms.shuffleReadMetrics.totalBytesRead / 1048576.0}%6.1f " +
            f"sw=${ms.shuffleWriteMetrics.bytesWritten / 1048576.0}%6.1f  " +
            i.name.take(120))
        }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          taskMs.addAndGet(m.executorRunTime)
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })

    def materialize(df: org.apache.spark.sql.DataFrame): Unit = {
      import org.apache.spark.sql.functions._
      df.agg(bit_xor(xxhash64(df.columns.map(col): _*))).collect()
      ()
    }
    def release(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
    }

    // same warm-up as the bench: classloading/codegen off the clock
    names.foreach { name =>
      try materialize(SparkEntry.queries(name)(spark, "/root/testdata/sf0.001"))
      catch { case _: Throwable => () }
      release()
    }

    names.foreach { name =>
      Thread.sleep(300) // drain listener events from the previous query
      jobs.set(0); stages.set(0); tasks.set(0)
      taskMs.set(0); shufR.set(0); shufW.set(0)
      val t0 = System.nanoTime()
      val outcome =
        try { materialize(SparkEntry.queries(name)(spark, sfDir)); "ok" }
        catch { case e: Throwable => s"FAILED: ${e.getMessage}" }
      val sec = (System.nanoTime() - t0) / 1e9
      release()
      Thread.sleep(300) // let stragglers post before reading counters
      println(f"[probe] $name%-28s ${sec}%7.2f s  jobs=${jobs.get}%3d " +
        f"stages=${stages.get}%4d tasks=${tasks.get}%5d " +
        f"taskTime=${taskMs.get / 1000.0}%7.1f s " +
        f"shufR=${shufR.get / 1048576.0}%8.1f MiB " +
        f"shufW=${shufW.get / 1048576.0}%8.1f MiB  $outcome")
    }
    spark.stop()
  }
}
