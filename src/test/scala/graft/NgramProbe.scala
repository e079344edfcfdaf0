package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch sub-stage timing for the blocked n-gram Jaccard path (test
  * scope — not shipped). Times (a) the exploded-shingle checkpoint build
  * and (b) the join+aggregation given the checkpoint.
  */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm page cache
    (0 until 3).foreach { r =>
      var t0 = System.nanoTime()
      val sh = docs.select(col("doc_id").as("id"), col("lang"),
          graft.pipeline.Dedup.shingles(col("text"), 3).as("sh"))
        .withColumn("n_sh", size(col("sh"))).filter(col("n_sh") > 0)
      val ex = sh.select(col("id"), col("n_sh"), col("lang"), explode(col("sh")).as("shingle"))
        .withColumn("h", xxhash64(col("shingle"))).drop("shingle")
        .localCheckpoint()
      val nEx = ex.count()
      val tCheckpoint = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val a = ex.select(col("id").as("id_a"), col("n_sh").as("na"), col("lang").as("__la"), col("h").as("ha"))
      val b = ex.select(col("id").as("id_b"), col("n_sh").as("nb"), col("lang").as("__lb"), col("h").as("hb"))
      val sizeOk = least(col("na"), col("nb")) >= greatest(col("na"), col("nb")) * 0.5
      val n = a.join(b, col("ha") === col("hb") && col("id_a") < col("id_b") && sizeOk && col("__la") === col("__lb"))
        .groupBy(col("id_a"), col("id_b"), col("na"), col("nb")).agg(count(lit(1)).as("n_shared"))
        .withColumn("jaccard", col("n_shared").cast("double") / (col("na") + col("nb") - col("n_shared")))
        .filter(col("jaccard") >= 0.5).count()
      val tJoin = (System.nanoTime() - t0) / 1e9
      println(f"[ngram-probe] rep=$r exploded=$nEx pairs=$n checkpoint=${tCheckpoint}%.2fs join_agg=${tJoin}%.2fs")
    }
    spark.stop()
  }
}
