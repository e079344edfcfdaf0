package graft
import org.apache.spark.sql.SparkSession

/** Diagnostic main: run the named queries once (after one warmup rep)
  * and print every Spark JOB the timed rep schedules — id, wall ms, and
  * the call site — so a query's job-floor overhead (N scheduler
  * round-trips for a metadata-sized answer) is attributable without
  * spelunking the UI. Usage:
  *   runMain graft.JobProbe q_chunk_prune,q_holes [sfDir]
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(sys.error("usage: JobProbe q_a,q_b [sfDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("GRAFT_AQE_PARALLELISM_FIRST", "false"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val jobStages = new java.util.concurrent.ConcurrentHashMap[Int, Seq[Int]]()
    // per-stage (tasks, task-time ms, input bytes, shuffle read bytes,
    // shuffle write bytes) so a slow job is attributable to scan vs
    // exchange volume without the UI (guide §7.1 equivalent)
    val stageM = new java.util.concurrent.ConcurrentHashMap[Int, (Int, Long, Long, Long, Long)]()
    val log = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        starts.put(e.jobId, (System.nanoTime(), site))
        jobStages.put(e.jobId, e.stageIds.map(_.toInt))
      }
      override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        if (m != null) stageM.put(si.stageId, (si.numTasks, m.executorRunTime,
          m.inputMetrics.bytesRead, m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten))
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(starts.remove(e.jobId)).foreach { case (t0, site) =>
          val ms = Option(jobStages.remove(e.jobId)).getOrElse(Nil)
            .flatMap(s => Option(stageM.get(s)))
          val (nt, rt, in, sr, sw) = ms.foldLeft((0, 0L, 0L, 0L, 0L)) {
            case ((a, b, c, d, e2), (f, g, h, i, j)) => (a + f, b + g, c + h, d + i, e2 + j) }
          def mb(v: Long): String = f"${v / 1048576.0}%.1f"
          log.add(f"    job ${e.jobId}%3d  ${(System.nanoTime() - t0) / 1e6}%8.1f ms  " +
            f"tasks $nt%4d  cpu ${rt}%6d ms  in ${mb(in)}%8s MB  sh-r ${mb(sr)}%8s MB  sh-w ${mb(sw)}%8s MB  $site")
        }
      }
    })
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (sys.env.get("GRAFT_PROBE_EXPLAIN").exists(_ == "1"))
        println(fn(spark, sfDir).queryExecution
          .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      try fn(spark, sfDir).count() catch { case e: Throwable => println(s"warmup $name: $e") }
      StageCache.endQuery()
      Thread.sleep(300)
      log.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      StageCache.endQuery()
      val total = (System.nanoTime() - t0) / 1e6
      Thread.sleep(300) // listener events are async
      println(f"== $name  total $total%8.1f ms")
      log.forEach(println(_))
    }
    spark.stop()
  }
}
