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
    val log = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        starts.put(e.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(starts.remove(e.jobId)).foreach { case (t0, site) =>
          log.add(f"    job ${e.jobId}%3d  ${(System.nanoTime() - t0) / 1e6}%8.1f ms  $site")
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
