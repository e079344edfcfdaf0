package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The shared-stage materialization contract: a mat'd stage evaluates
  * identically to its plain plan, registers with the session cache so an
  * INDEPENDENTLY-built equal plan reads the materialized data, and
  * clear() releases every block.
  */
class StageCacheSpec extends SparkSpec {
  import spark.implicits._

  test("mat: same results as the plain plan; persisted storage level") {
    val base = (1L to 100L).toDF("id").withColumn("v", col("id") * 3 % 17)
    val plain = base.groupBy("v").count()
    val staged = StageCache.mat(base.groupBy("v").count())
    try {
      assert(staged.storageLevel != StorageLevel.NONE, "stage must be persisted")
      assert(staged.orderBy("v").collect().toSeq === plain.orderBy("v").collect().toSeq)
    } finally StageCache.clear()
  }

  test("an independently rebuilt equal plan reads the cached stage") {
    val mk = () => spark.range(1000).toDF("id")
      .withColumn("b", pmod(col("id") * 31, lit(97)))
      .groupBy("b").agg(sum(col("id")).as("s"))
    val staged = StageCache.mat(mk())
    staged.count() // materialize
    try {
      // the SECOND build is a fresh plan object — reuse must come from
      // CacheManager plan matching, not object identity
      val replanned = mk().queryExecution.withCachedData
      val hits = replanned.collect {
        case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
      }
      assert(hits.nonEmpty, s"equal plan did not pick up the cached stage:\n$replanned")
      assert(mk().orderBy("b").collect().toSeq === staged.orderBy("b").collect().toSeq)
    } finally StageCache.clear()
  }

  test("clear unpersists registered stages") {
    val staged = StageCache.mat(spark.range(10).toDF("id"))
    staged.count()
    assert(staged.storageLevel != StorageLevel.NONE)
    StageCache.clear()
    assert(staged.storageLevel == StorageLevel.NONE, "clear() must unpersist")
  }
}
