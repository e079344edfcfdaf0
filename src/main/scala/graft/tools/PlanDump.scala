package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Optimization-round plan artifacts: dump `explain("formatted")` for the
  * named queries into one file per query (`<outDir>/<name>_<tag>.txt`), so
  * before/after plan claims in OPTIMIZATION_r*.md are checkable without
  * running Spark. Usage:
  *   runMain graft.tools.PlanDump q_holes,q_find_groups plans/r21 before [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
    val names  = args.headOption.map(_.split(",").toSeq)
      .getOrElse(sys.error("usage: PlanDump q_a,q_b outDir tag [sfDir]"))
    val outDir = args.lift(1).getOrElse("plans/r21")
    val tag    = args.lift(2).getOrElse("before")
    val sfDir  = args.lift(3).getOrElse("/root/testdata/sf0.1")
    val cpus   = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("GRAFT_AQE_PARALLELISM_FIRST", "false"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${n}_$tag.txt"), txt)
      println(s"[plandump] wrote $outDir/${n}_$tag.txt")
    }
    spark.stop()
  }
}
