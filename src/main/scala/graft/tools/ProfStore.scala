package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Driver-phase decomposition of the TimeseriesStore write path (r22,
  * VERDICT r21 #3): JobProbe shows ~0.6 s of NON-job wall per store
  * query — this main times each driver call (temp dir, batch write,
  * series write, read-back) so the gap is attributable to write-commit
  * vs planning vs listing without the UI. Usage:
  *   runMain graft.tools.ProfStore [sfDir] [reps]
  */
object ProfStore {
  def main(args: Array[String]): Unit = {
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
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
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"    $label%-28s ${(System.nanoTime() - t0) / 1e6}%8.1f ms"); r
    }
    (0 until reps).foreach { rep =>
      println(s"== rep $rep")
      val dir = java.nio.file.Files.createTempDirectory("graft_profstore_").toString
      val st = new graft.store.TimeseriesStore(spark, dir,
        StructType(Seq(StructField("user_id", LongType))))
      val ev = spark.read.parquet(s"$sfDir/events.parquet")
      val daily = ev
        .filter(col("user_id") < 3 && col("event_type").isin("view", "purchase"))
        .groupBy(col("user_id"), col("event_type"), date_trunc("day", col("ts")).as("ts"))
        .agg(avg(col("value")).as("avg_v"))
      val view = daily.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), round(col("avg_v"), 6).as("value"))
      val purchases = daily
        .filter(col("user_id") === 1 && col("event_type") === "purchase")
        .select(col("ts"), round(col("avg_v") * 2.0, 6).as("value"))
      t("setManyTs (fresh write)") { st.setManyTs(view) }
      t("setTs replace") { st.setTs(Map("user_id" -> 1L), purchases, replace = true) }
      t("getTs count") { st.getTs().count() }
      t("getTs count 2") { st.getTs().count() }
      // write-overhead bisection: same prepared frame, varying sink
      val prepared = view.repartition(col("user_id"))
        .sortWithinPartitions(col("user_id"), col("ts"))
      def fresh(): String =
        java.nio.file.Files.createTempDirectory("graft_profstore_x_").toString
      t("A dyn-overwrite partitionBy") {
        prepared.write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("user_id").parquet(fresh())
      }
      t("B static partitionBy") {
        prepared.write.mode("overwrite").partitionBy("user_id").parquet(fresh())
      }
      t("C no partitionBy") {
        prepared.write.mode("overwrite").parquet(fresh())
      }
      t("D noop sink") {
        prepared.write.format("noop").mode("overwrite").save()
      }
      t("E count only") { prepared.count() }
      t("F dyn-overwrite + observe.get") {
        val obs = org.apache.spark.sql.Observation()
        prepared.observe(obs, count(lit(1)).as("n")).write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("user_id").parquet(fresh())
        obs.get("n")
      }
    }
    spark.stop()
  }
}
