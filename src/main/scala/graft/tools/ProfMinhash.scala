package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler: stage-by-stage timing of the minhash pipeline. */
object ProfMinhash {
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
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }

    import graft.functions.PortableHash
    import graft.pipeline.Dedup

    for (rep <- 1 to 3) {
      println(s"--- rep $rep ---")
      t("explode+hash") {
        docs.select(col("doc_id").as("id"), explode(Dedup.shingles(col("text"), 3)).as("shingle"))
          .select(col("id"), PortableHash.hashMod(col("shingle")).as("__b")).count()
      }
      t("signature (explode+hash+agg)") {
        Dedup.minhashSignature(docs, "doc_id", "text", 3, 32).count()
      }
      t("full minhashLshPairs") {
        Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 8, 4, 0.5).count()
      }
      t("full ngramJaccardLsh") {
        Dedup.ngramJaccardPairsLsh(docs, "doc_id", "text", 3, 0.5).count()
      }
    }
    spark.stop()
  }
}
