package graft.tmp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling driver (deleted before commit). */
object Scratch {
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
    Seq("documents", "events").foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    val taskTime = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      val t00 = System.nanoTime()
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (sys.env.get("SCRATCH_JOBLOG").contains("1"))
          println(f"[job+] ${e.jobId} t=${(System.nanoTime()-t00)/1e6}%.0f")
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        if (sys.env.get("SCRATCH_JOBLOG").contains("1"))
          println(f"[job-] ${e.jobId} t=${(System.nanoTime()-t00)/1e6}%.0f")
      }
      override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        println(f"[stage] ${e.stageInfo.stageId} tasks=${e.stageInfo.numTasks} name=${e.stageInfo.name.take(60)} runMs=${e.stageInfo.taskMetrics.executorRunTime}")
      }
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) taskTime.addAndGet(e.taskMetrics.executorRunTime)
    })

    sys.env.get("SCRATCH_CONF").foreach { kvs =>
      kvs.split(";").foreach { kv => val Array(k, v) = kv.split("="); spark.conf.set(k, v) }
    }
    if (sys.env.get("SCRATCH_MINI").contains("1")) {
      def t[A](label: String)(f: => A): A = {
        val tt0 = taskTime.get(); val t0 = System.nanoTime()
        val r = f
        println(f"[mini] $label%-28s wall=${(System.nanoTime() - t0) / 1e9}%.3f taskSec=${(taskTime.get() - tt0) / 1e3}%.2f")
        r
      }
      val base = spark.range(260000).selectExpr("id % 6000 as id", "cast(id % 97 as int) as n_sh", "id * 2654435761 as __b", "id % 1000 as __df").repartition(col("__b"))
      val cached = base.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("mini materialize")(cached.count())
      val plainRange = spark.range(260000).selectExpr("id % 6000 as id", "id * 2654435761 as __b")
      (0 until 2).foreach { i =>
        t(s"groupBy no-repart $i")(plainRange.groupBy("id").count().count())
        t(s"repartition only $i")(plainRange.repartition(col("__b")).count())
        t(s"groupBy post-repart $i")(plainRange.repartition(col("__b")).groupBy("id").count().count())
        t(s"range sum $i")(spark.range(1000000L).selectExpr("sum(id)").collect())
      }
      spark.stop(); return
    }
    if (sys.env.get("SCRATCH_PHASES").contains("1")) {
      import org.apache.spark.sql.expressions.Window
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      def t[A](label: String)(f: => A): A = {
        val tt0 = taskTime.get(); val t0 = System.nanoTime()
        val r = f
        println(f"[phase] $label%-24s wall=${(System.nanoTime() - t0) / 1e9}%.3f taskSec=${(taskTime.get() - tt0) / 1e3}%.2f")
        r
      }
      (0 until 2).foreach { rep =>
        println(s"=== phases rep $rep ===")
        graft.StageCache.clear()
        val n = 3; val maxDf = 1000L; val numAnchors = 4
        val withDf = graft.StageCache.matHot(
          docs.select(col("doc_id").as("id"),
              graft.functions.ShingleOps.shingleHashModSet(lower(col("text")), n).as("__hs"))
            .select(col("id"), size(col("__hs")).as("n_sh"), explode(col("__hs")).as("__b"))
            .repartition(col("__b"))
            .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("__b")))))
        t("materialize")(withDf.count())
        t("cached count again")(withDf.count())
        t("cached filter")(withDf.filter(col("__df") <= 1000L).count())
        t("cached groupBy id")(withDf.groupBy("id").count().count())
        t("cached sort-window")(withDf.withColumn("__rn", row_number().over(Window.partitionBy(col("id")).orderBy(col("__df"), col("__b")))).filter(col("__rn") <= 4).count())
        t("parquet scan count")(docs.count())
        t("explode scan count")(docs.select(col("doc_id"), explode(graft.functions.ShingleOps.shingleHashModSet(lower(col("text")), 3)).as("__b")).count())
        val wDoc = Window.partitionBy(col("id")).orderBy(col("__df"), col("__b"))
        val anchors = withDf.withColumn("__rn", row_number().over(wDoc))
          .filter(col("__rn") <= numAnchors && col("__df") <= maxDf)
          .select(col("id").as("__aid"), col("__b"))
        t("anchors")(anchors.count())
        val members = withDf.filter(col("__df") <= maxDf).select(col("id").as("__mid"), col("__b"))
        t("members")(members.count())
        val cand = anchors.join(members, Seq("__b"))
          .filter(col("__aid") =!= col("__mid"))
          .select(least(col("__aid"), col("__mid")).as("id_a"), greatest(col("__aid"), col("__mid")).as("id_b"))
          .distinct()
        t("cand")(cand.count())
        val j1 = cand.join(withDf.select(col("id").as("id_a"), col("n_sh").as("__na"), col("__b")), Seq("id_a"))
        t("join1")(j1.count())
        val inter = j1.join(withDf.select(col("id").as("id_b"), col("n_sh").as("__nb"), col("__b")), Seq("id_b", "__b"))
          .groupBy("id_a", "id_b")
          .agg(count(lit(1)).as("__ni"), max(col("__na")).as("na"), max(col("__nb")).as("nb"))
        t("inter")(inter.count())
      }
      spark.stop(); return
    }
    val qnames = sys.env.getOrElse("SCRATCH_Q", "q_containment_pairs").split(",")
    qnames.foreach { qname =>
      val fn = graft.SparkEntry.queries(qname)
      (0 until 3).foreach { rep =>
        graft.StageCache.clear()
        Thread.sleep(300)
        val j0 = jobs.get(); val s0 = stages.get(); val tt0 = taskTime.get()
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"[scratch] $qname rep=$rep rows=$n wall=$wall%.3f jobs=${jobs.get() - j0} stages=${stages.get() - s0} taskSec=${(taskTime.get() - tt0) / 1e3}%.2f")
        if (rep == 2 && sys.env.get("SCRATCH_EXPLAIN").contains("1")) {
          val p = fn(spark, sfDir).queryExecution.executedPlan.toString
          p.split("\n").filter(l => l.contains("Exchange") || l.contains("Window") || l.contains("HashAggregate") || l.contains("Join") || l.contains("Generate")).foreach(l => println("[plan] " + l.trim.take(150)))
        }
        graft.StageCache.endQuery()
      }
    }
    spark.stop()
  }
}
