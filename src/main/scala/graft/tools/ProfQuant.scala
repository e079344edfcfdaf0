package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: is q_quantize_embed's 0.9 s one-job wall the quantize
  * projection itself or a sort/explode artifact under count()? */
object ProfQuant {
  def main(args: Array[String]): Unit = {
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    println(s"embeddings rows=${emb.count()} dims=${emb.selectExpr("size(embedding)").head.getInt(0)}")

    val q = graft.SparkEntry.queries("q_quantize_embed")(spark, sfDir)
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    val exec = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) exec.addAndGet(e.taskMetrics.executorRunTime)
    })
    def te(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val e0 = exec.get(); val n = f
      Thread.sleep(50)
      println(f"$name%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s  taskms=${exec.get() - e0}%6d  rows=$n")
    }
    for (rep <- 1 to 3) {
      println(s"--- rep $rep ---")
      te("full q_quantize_embed count") { q.count() }
      te("quantize only (no explode)") {
        graft.pipeline.Similarity.quantizeInt8(emb, "vec_id", "embedding").count() }
      te("quantize+posexplode, no orderBy") {
        graft.pipeline.Similarity.quantizeInt8(emb, "vec_id", "embedding")
          .select(col("id").as("vec_id"), round(col("scale"), 9).as("scale"),
            posexplode(col("qvec")).as(Seq("pos", "qval"))).count() }
      te("posexplode of cheap transform") {
        emb.select(posexplode(transform(col("embedding"), x => x.cast("int")))).count() }
    }
    println("=== plan under count ===")
    val agg = q.groupBy().count()
    println(agg.queryExecution.executedPlan.toString.take(3000))
    spark.stop()
  }
}
