package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions wiring: SQL function injection + the NativeHashRewrite
  * optimizer rule (the shared test session is built withExtensions, so
  * every suite runs under the rule — any rewrite-induced regression would
  * surface across the whole test set, not just here).
  */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("injected SQL functions resolve: hash60 / dot_product") {
    val h = spark.sql("SELECT hash60('abc') AS h").head().getLong(0)
    assert(h === graft.functions.PortableHash.const60("abc"))
    val d = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head().getDouble(0)
    assert(d === 11.0)
  }

  // LocalRelation inputs constant-fold away before the plan can be
  // inspected — back the test frames with parquet, like real scans.
  private lazy val pq: String = {
    val dir = java.nio.file.Files.createTempDirectory("extspec").toString
    Seq(("abc", Array(1.0f, 2.0f), Array(3.0f, 4.0f), Array(1.0, 2.0), Array(3.0, 4.0)),
        ("def", Array(1.0f, 0.0f), Array(0.0f, 1.0f), Array(1.0, 0.0), Array(0.0, 1.0)),
        ("日本語", Array(2.0f, 2.0f), Array(2.0f, 2.0f), Array(2.0, 2.0), Array(2.0, 2.0)))
      .toDF("s", "af", "bf", "ad", "bd").write.mode("overwrite").parquet(dir)
    dir
  }

  test("optimizer rewrites the builtin md5-conv chain to native Hash60") {
    val df = spark.read.parquet(pq)
      .select(col("s"), graft.functions.PortableHash.hash60Builtin(col("s")).as("h"))
      .orderBy("s").select("h")
    val optimized = df.queryExecution.optimizedPlan
    val hasNative = optimized.exists(
      _.expressions.exists(_.exists(_.isInstanceOf[graft.functions.Hash60])))
    assert(hasNative, s"expected Hash60 in optimized plan:\n$optimized")
    // and the rewritten plan still computes the portable value
    val expect = Seq("abc", "def", "日本語").sorted.map(graft.functions.PortableHash.const60)
    assert(df.collect().map(_.getLong(0)).toSeq === expect)
  }

  test("optimizer does NOT rewrite the HOF dot fold (NULL semantics differ from DotProduct)") {
    for ((a, b) <- Seq(("af", "bf"), ("ad", "bd"))) {
      val df = spark.read.parquet(pq)
        .select(graft.pipeline.Similarity.dotHof(col(a), col(b)).as("d"), col("s"))
        .orderBy("s").select("d")
      assert(!df.queryExecution.optimizedPlan.exists(
        _.expressions.exists(_.exists(_.isInstanceOf[graft.functions.DotProduct]))),
        s"dot fold must stay a HOF in $a/$b plan:\n${df.queryExecution.optimizedPlan}")
      assert(df.collect().map(_.getDouble(0)).toSeq === Seq(11.0, 0.0, 8.0))
    }
    // the divergence that forbids the rewrite: mismatched lengths → the
    // HOF fold is NULL (zip_with pads with null), DotProduct is a number
    val r = spark.sql(
      """SELECT aggregate(zip_with(array(1.0D), array(1.0D, 2.0D),
        |  (x, y) -> x * y), 0.0D, (acc, x) -> acc + x) AS d""".stripMargin).head()
    assert(r.isNullAt(0), "HOF fold over mismatched lengths must stay NULL")
  }

  test("injected wire-codec SQL functions round-trip blob bytes from plain SQL") {
    // chunk payload: values -> lz4-frame(float64-LE) -> values, pure SQL
    val vals = spark.sql(
      """SELECT unpack_doubles_le(lz4_frame_decompress(
        |         lz4_frame_compress(pack_doubles_le(array(1.5D, -2.25D))))) AS v""".stripMargin)
      .head().getSeq[Double](0)
    assert(vals === Seq(1.5, -2.25))
    // feather whole-series blob: SQL-side encode, decode, name + points back
    val row = spark.sql(
      """SELECT feather_decode(feather_encode('prm_sql',
        |  array(struct(TIMESTAMP_NTZ '2024-01-01 00:00:00' AS ts, 7.5D AS value)))) AS d""".stripMargin)
      .select("d.name", "d.points").head()
    assert(row.getString(0) === "prm_sql")
    val p = row.getSeq[org.apache.spark.sql.Row](1)
    assert(p.length === 1 && p.head.getAs[Double]("value") === 7.5)
  }
}
