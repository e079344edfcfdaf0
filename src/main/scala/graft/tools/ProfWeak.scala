package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd}

/** Scratch profiler: per-query Spark JOB count + wall time for the
  * bench's weak set (sub-second queries whose ratio vs the DuckDB twin
  * is dominated by the local job-scheduling floor, per VERDICT r15).
  * Each job a query runs costs a scheduler round-trip (~50-150 ms at
  * local[32]); the fusion recipe (fold probes into consuming jobs,
  * collect bounded artifacts once) shows up here as a lower job count.
  */
object ProfWeak {
  def main(args: Array[String]): Unit = {
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.StageCache.setEager(sys.env.get("GRAFT_STAGE_EAGER").exists(_.trim == "1"))

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val verbose = sys.env.get("PROF_VERBOSE").contains("1")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        starts.put(e.jobId, System.nanoTime())
        if (verbose) {
          val p = e.properties
          val site = Option(p.getProperty("callSite.short"))
            .orElse(Option(p.getProperty("spark.job.description")))
            .getOrElse(p.stringPropertyNames().toArray.mkString(","))
          val stages = e.stageInfos.map(s => s"${s.stageId}:${s.name.take(40)}").mkString(" | ")
          println(f"  [job ${e.jobId}%4d start] $site :: $stages")
        }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = if (verbose) {
        val dt = Option(starts.get(e.jobId)).map(t => (System.nanoTime() - t) / 1e9).getOrElse(-1.0)
        println(f"  [job ${e.jobId}%4d end]   ${dt}%6.3f s")
      }
    })

    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q_store_update", "q_store_replace", "q_ann_rerank",
        "q_quantize_embed", "q_islands_split", "q_pca_topk",
        "q_diversity_sample", "q_ivf_int8", "q_version_select",
        "q_combine_first", "q_holes", "q_winnow_pairs")

    // warm the tables + session
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    for (rep <- 1 to 3) {
      println(s"--- rep $rep ---")
      names.foreach { n =>
        val fn = graft.SparkEntry.queries(n)
        val j0 = jobs.get(); val t0 = System.nanoTime()
        val rows = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"$n%-22s ${dt}%7.3f s  jobs=${jobs.get() - j0}%3d  rows=$rows")
        // with GRAFT_STAGE_CACHE=0 this drops the query's stages, so
        // reps 2..3 price the stage-cold shape (rep 1 carries JIT)
        graft.StageCache.endQuery()
      }
    }
    spark.stop()
  }
}
