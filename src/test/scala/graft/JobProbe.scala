package graft

import org.apache.spark.sql.SparkSession

/** Per-query JOB/STAGE-count probe (test scope — not part of the shipped
  * library): at bench scale the wall of a small-output query is
  * dominated by adaptive-stage scheduling (~40-80 ms replan gap per
  * query stage, measured r20), so job count is the noise-free proxy the
  * r20 cold-leg campaign optimized against. Usage:
  *   sbt> Test/runMain graft.JobProbe q_zipf q_containment_pairs
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), GRAFT_STAGE_CACHE,
  * SCRATCH_EXPLAIN=1 (dump the executed plan's exchange/agg skeleton),
  * SCRATCH_JOBLOG=1 (per-job start/end timeline).
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("documents", "events").foreach(t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count() catch { case _: Throwable => })

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    val taskTime = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      val t00 = System.nanoTime()
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (sys.env.get("SCRATCH_JOBLOG").contains("1"))
          println(f"[job+] ${e.jobId} t=${(System.nanoTime() - t00) / 1e6}%.0f")
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        if (sys.env.get("SCRATCH_JOBLOG").contains("1"))
          println(f"[job-] ${e.jobId} t=${(System.nanoTime() - t00) / 1e6}%.0f")
      override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) taskTime.addAndGet(e.taskMetrics.executorRunTime)
    })

    val names = if (args.nonEmpty) args.toSeq else Seq("q_zipf")
    names.foreach { qname =>
      val fn = SparkEntry.queries(qname)
      (0 until 3).foreach { rep =>
        graft.StageCache.clear()
        Thread.sleep(300)
        val j0 = jobs.get(); val s0 = stages.get(); val tt0 = taskTime.get()
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"[probe] $qname rep=$rep rows=$n wall=$wall%.3f " +
          f"jobs=${jobs.get() - j0} stages=${stages.get() - s0} " +
          f"taskSec=${(taskTime.get() - tt0) / 1e3}%.2f")
        if (rep == 2 && sys.env.get("SCRATCH_EXPLAIN").contains("1")) {
          val p = fn(spark, sfDir).queryExecution.executedPlan.toString
          p.split("\n").filter(l => l.contains("Exchange") || l.contains("Window") ||
              l.contains("HashAggregate") || l.contains("Join") || l.contains("Generate"))
            .foreach(l => println("[plan] " + l.trim.take(150)))
        }
        graft.StageCache.endQuery()
      }
    }
    spark.stop()
  }
}
