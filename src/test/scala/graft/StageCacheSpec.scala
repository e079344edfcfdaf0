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

  test("mat registers lazily; matHot pre-materializes in harness eager mode") {
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    // blocks-loaded state of a registered stage, race-free against other
    // suites sharing the context (no global job counting)
    def loaded(df: org.apache.spark.sql.DataFrame): Boolean =
      spark.sharedState.cacheManager
        .lookupCachedData(df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]])
        .exists(_.cachedRepresentation.asInstanceOf[InMemoryRelation]
          .cacheBuilder.isCachedColumnBuffersLoaded)
    try {
      // library contract (ADVICE r15): constructing an operator that
      // mats a stage must NOT run Spark jobs — registration only
      val lazyDf = StageCache.mat(
        Seq(101L, 202L, 303L).toDF("lazy_probe_v").selectExpr("lazy_probe_v * 7 as lp"))
      assert(!loaded(lazyDf), "mat must not materialize at registration")
      lazyDf.count()
      assert(loaded(lazyDf), "first action materializes the lazy stage")
      // matHot is lazy too in harness mode (r17 demotion): the eager
      // count is an opt-in for long-lived servers only
      val hotDf = StageCache.matHot(
        Seq(5L, 6L).toDF("hot_probe_v").selectExpr("hot_probe_v + 11 as hp"))
      assert(!loaded(hotDf), "matHot must stay lazy outside eager mode")
      // flipping eager mode on pre-materializes at registration so
      // concurrent AQE consumers read finished blocks instead of racing
      StageCache.setEager(true)
      try {
        val eagerDf = StageCache.matHot(
          Seq(7L, 8L).toDF("hot_probe_v2").selectExpr("hot_probe_v2 + 13 as hp2"))
        assert(loaded(eagerDf), "matHot in eager mode must pre-materialize")
      } finally StageCache.setEager(false)
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

  // ADVICE r17: two threads racing the FIRST materialization of a shared
  // lazily-persisted stage once produced empty results in parallel
  // Verify. The library-level guard: a cache hit from a thread that did
  // not register the stage materializes it synchronously before the hit
  // returns — so the second consumer's action never races unfinished
  // blocks. Same-thread reuse must stay lazy (Bench's warm leg depends
  // on it).
  test("cross-thread hit on an unmaterialized stage forces materialization; same-thread stays lazy") {
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    def loaded(df: org.apache.spark.sql.DataFrame): Boolean =
      spark.sharedState.cacheManager
        .lookupCachedData(df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]])
        .exists(_.cachedRepresentation.asInstanceOf[InMemoryRelation]
          .cacheBuilder.isCachedColumnBuffersLoaded)
    val mk = () => Seq(17L, 34L, 51L).toDF("race_probe_v")
      .selectExpr("race_probe_v * 19 as rp")
    try {
      val first = StageCache.matHot(mk())
      assert(!loaded(first), "registration must stay lazy")
      // same-thread re-registration: still lazy (no forced count)
      StageCache.matHot(mk())
      assert(!loaded(first), "same-thread hit must not materialize")
      // a DIFFERENT thread picking up the stage is the hazard moment —
      // the hit must return with the blocks already finished
      val t = new Thread(() => StageCache.matHot(mk()))
      t.start(); t.join()
      assert(loaded(first), "cross-thread hit must materialize the stage before returning")
    } finally StageCache.clear()
  }

  // VERDICT r17 #6: incremental near-dup screening promises the
  // seen-side signature stage reuses BY PLAN IDENTITY across successive
  // increments against the same corpus snapshot (the 100 TB contract:
  // the standing corpus is signed once, not per crawl increment). The
  // registry-count arithmetic proves the reuse: increment 1 registers
  // two per-side stages (seen + new); increment 2 must add exactly ONE
  // (its own new side) — the seen side HITS. Results stay correct both
  // times.
  test("incremental near-dup: seen-side signature stage reuses across increments") {
    StageCache.clear()
    val seen = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "an entirely different standing corpus document body"),
      (3L, "structured streaming with watermarks and stateful maps")).toDF("id", "text")
    val inc1 = Seq(
      (101L, "the quick brown fox jumps over the lazy dog tonight"),
      (102L, "fresh unseen text with no duplicate in the corpus")).toDF("id", "text")
    val inc2 = Seq(
      (201L, "an entirely different standing corpus document body"),
      (202L, "another novel crawl document nothing matches here")).toDF("id", "text")
    try {
      val base = StageCache.registeredCount
      val r1 = graft.pipeline.Dedup
        .incrementalNearDupPairs(inc1, seen, "id", "text").collect()
      val afterFirst = StageCache.registeredCount
      assert(afterFirst === base + 2,
        s"increment 1 must register the two per-side signature stages, got ${afterFirst - base}")
      val r2 = graft.pipeline.Dedup
        .incrementalNearDupPairs(inc2, seen, "id", "text").collect()
      val afterSecond = StageCache.registeredCount
      assert(afterSecond === afterFirst + 1,
        s"increment 2 must reuse the seen-side stage (one new entry), got ${afterSecond - afterFirst}")
      // and the screening itself stays right: each exact clone matches
      assert(r1.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((101L, 1L)))
      assert(r2.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((201L, 2L)))
    } finally StageCache.clear()
  }

  // the same corpus-only-plan reuse contract for the two r18 incremental
  // text-rewriting operators: increment 2 against the same corpus
  // snapshot must HIT the seen-side stage (exactly one new registry
  // entry — its own increment-side stage), not re-derive the corpus
  test("incremental paragraph dedup and span removal reuse the seen-side stage across increments") {
    val seen = Seq(
      (1L, "standing corpus paragraph body\n\nanother corpus block"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val inc1 = Seq((101L, "fresh one\n\nstanding corpus paragraph body")).toDF("doc_id", "text")
    val inc2 = Seq((201L, "another corpus block\n\nfresh two")).toDF("doc_id", "text")
    try {
      StageCache.clear()
      val base = StageCache.registeredCount
      graft.pipeline.Dedup.incrementalParagraphDedup(inc1, seen, "doc_id", "text").collect()
      val a1 = StageCache.registeredCount
      graft.pipeline.Dedup.incrementalParagraphDedup(inc2, seen, "doc_id", "text").collect()
      val a2 = StageCache.registeredCount
      // paragraph dedup registers ONE stage per call pair: the seen-side
      // hash set (the increment side is not cached) — so the second call
      // must add NOTHING
      assert(a1 === base + 1 && a2 === a1,
        s"paragraph dedup: expected seen-stage reuse, got +${a1 - base} then +${a2 - a1}")

      StageCache.clear()
      val b0 = StageCache.registeredCount
      graft.pipeline.Dedup.incrementalStripDuplicateSpans(inc1, seen, "doc_id", "text").collect()
      val b1 = StageCache.registeredCount
      graft.pipeline.Dedup.incrementalStripDuplicateSpans(inc2, seen, "doc_id", "text").collect()
      val b2 = StageCache.registeredCount
      // span removal registers the seen-side hash set AND the increment's
      // own window table per call — increment 2 adds exactly its own
      assert(b1 === b0 + 2 && b2 === b1 + 1,
        s"span removal: expected seen-stage reuse, got +${b1 - b0} then +${b2 - b1}")
    } finally StageCache.clear()
  }
}
