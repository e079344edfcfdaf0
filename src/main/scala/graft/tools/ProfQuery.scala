package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler: reps of named SparkEntry queries (SPARK_GRAFT_ONLY). */
object ProfQuery {
  def main(args: Array[String]): Unit = {
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = sys.env.getOrElse("SPARK_GRAFT_ONLY", "q_multimodal_features").split(",")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    for (rep <- 1 to 3; name <- names) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[prof] $name rep$rep ${(System.nanoTime() - t0) / 1e9}%8.3f s rows=$n")
    }
    spark.stop()
  }
}
