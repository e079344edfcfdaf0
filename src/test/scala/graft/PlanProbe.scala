package graft
import org.apache.spark.sql.SparkSession

/** Scratch plan probe (test scope — not shipped): print the AQE-final
  * executed plan of one SparkEntry query. Usage:
  *   sbt> Test/runMain graft.PlanProbe q_ngram_jaccard [sfDir]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(args(0))(spark, args.lift(1).getOrElse("/root/testdata/sf0.01"))
    df.count() // materialize AQE final plan
    println(df.queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
