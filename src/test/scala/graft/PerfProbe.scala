package graft

import org.apache.spark.sql.SparkSession

/** Scratch timing probe for individual queries (test scope — not part of
  * the shipped library). Usage:
  *   sbt> Test/runMain graft.PerfProbe q_ngram_jaccard q_minhash_lsh
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS, SPARK_GRAFT_REPS.
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val reps  = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else Seq("q_ngram_jaccard", "q_minhash_lsh")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $n: min=${times.min}%.3f all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
