package graft

import graft.pipeline.{Classifier, Clustering, Curation, Dedup, Multimodal, Packing, Sampling, Similarity, TextAnalysis}
import graft.ts.{Combine, Gaps, Grid, Intervals, Resample, Stats}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.util.chaining._

/** Driver contract: one `queries` entry per implemented operator from
  * SURVEY.md §2 (+ the LLM-pipeline extensions), each with an ANSI-SQL
  * twin in `oracleSql` runnable by DuckDB over the same parquet tables.
  *
  * Portability rules used throughout (so the DuckDB hash-compare is
  * byte-stable):
  *  - every timestamp output is TIMESTAMP_NTZ (naive, UTC wall time) —
  *    matches DuckDB's naive TIMESTAMP reading of the same parquet;
  *  - float aggregates are `round`-ed (2-6 dp depending on magnitude) in
  *    BOTH engines; integer sums are cast to BIGINT in SQL (DuckDB sums
  *    to HUGEINT otherwise);
  *  - both sides ORDER BY a deterministic key set.
  */
object SparkEntry {

  // ---- helpers ---------------------------------------------------------

  /** Memoized readers: `spark.read.parquet` builds a fresh file index
    * (directory listing + footer schema read) on EVERY call, and the
    * query surface reads the same immutable fixture tables hundreds of
    * times per session — the repeated listing was a measurable slice of
    * the per-query floor. One DataFrame per (session, dir, table);
    * reusing the object also makes the logical subtrees trivially
    * identical for [[graft.StageCache]] plan matching. The fixtures are
    * read-only by contract (TESTDATA.md), so the memo can never serve a
    * stale schema.
    */
  private val tableCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  private def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val key = (spark, dir, name)
    // drop entries of STOPPED sessions, but only on a MISS: a DataFrame
    // holds a hard reference to its session, so without the purge a
    // restarted-session JVM (test suites, notebooks) retains every dead
    // session's state forever (ADVICE r12) — yet scanning the whole
    // registry on every hit would be O(cache) work on the hottest entry
    // point (ADVICE r13). A stale entry can only be created by a miss,
    // so purging before each insert bounds staleness the same way.
    // (Not inside computeIfAbsent's mapper — mutating a ConcurrentHashMap
    // from its own compute function is forbidden.)
    if (!tableCache.containsKey(key))
      tableCache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    tableCache.computeIfAbsent(key,
      _ => spark.read.parquet(s"$dir/$name.parquet"))
  }

  /** Naive literal timestamp (TIMESTAMP_NTZ). Built from LocalDateTime —
    * Catalyst maps it straight to a TIMESTAMP_NTZ literal with no
    * epoch/instant hop, so the wall time survives ANY JVM default tz
    * (java.sql.Timestamp.valueOf + cast would shift when JVM tz ≠ session
    * tz).
    */
  private def ts(s: String): Column =
    lit(java.time.LocalDateTime.parse(s.replace(" ", "T")))

  private def ntz(c: Column): Column = c.cast("timestamp_ntz")

  /** Schema-adaptive events reader. The fixture's `ts` physical type has
    * drifted across driver generations: TIMESTAMP(NANOS) (which Spark's
    * parquet reader rejects unless `legacy.parquet.nanosAsLong` is set, and
    * then surfaces as LongType) vs plain timestamp[us]. A NANOS file fails
    * at schema load without the conf, so we set it BEFORE the read, branch
    * on the dataType that actually loaded, and restore the previous value
    * (the conf only changes how NANOS columns surface — a µs file reads as
    * TimestampType either way).
    */
  private val eventsCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private[graft] def events(spark: SparkSession, dir: String): DataFrame = {
    // memoized like [[table]] (the conf dance + schema branch run once
    // per (session, dir), not once per query; dead sessions purged the
    // same miss-only way)
    val key = (spark, dir)
    if (!eventsCache.containsKey(key))
      eventsCache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    eventsCache.computeIfAbsent(key, _ => eventsUncached(spark, dir))
  }

  private def eventsUncached(spark: SparkSession, dir: String): DataFrame = synchronized {
    // synchronized: the set→schema-load→restore below is the ONLY
    // session-conf mutation in the query surface; serializing it makes
    // every query thread-safe, so Verify can dump queries concurrently
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    val raw =
      try { spark.conf.set(key, "true"); table(spark, dir, "events") }
      catch { case e: Throwable => restoreConf(spark, key, prev); throw e }
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // TIMESTAMP(NANOS) read as raw nanos: floor-convert to µs — exactly
        // what DuckDB's scanner does, so both engines see identical values.
        // The conf stays set: the scan re-reads it at execution time, and
        // unsetting it here would fail the deferred parquet read.
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      case _ =>
        // Plain timestamp[us]: no legacy handling needed — restore the conf
        // so the session-wide side effect doesn't leak to other reads.
        restoreConf(spark, key, prev)
        raw.withColumn("ts", col("ts").cast("timestamp_ntz"))
    }
  }

  private def restoreConf(spark: SparkSession, key: String, prev: Option[String]): Unit =
    prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }

  private def lineitem(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem").withColumn("l_shipdate", ntz(col("l_shipdate")))

  private def orders(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders").withColumn("o_orderdate", ntz(col("o_orderdate")))

  /** The headline classifier fit (documents, is_long = n_chars >= 250,
    * 256 buckets, 12 GD steps, lr 3.0) as a [[pipeline.ModelCache]]
    * artifact: q_logreg_train publishes it and q_logreg_score consumes
    * it — ONE training run per session per dataset, the way a pipeline
    * actually deploys a gate model (VERDICT r11 #1).
    */
  private def logregWeights(s: SparkSession, d: String): Array[Long] =
    pipeline.ModelCache.getOrFit(s"logreg:$d:documents:is_long:b256:i12:lr3.0") {
      val docs = table(s, d, "documents").withColumn("is_long", col("n_chars") >= 250)
      Classifier.trainLogRegWeights(docs, "doc_id", "text", "is_long",
        numBuckets = 256, iters = 12, lr = 3.0)
    }

  /** Flagship: gap analysis over the event stream at sf0.001 — grid
    * reindex + hole islands (G2/G3), the reference's core analytic.
    */
  def entry(spark: SparkSession): DataFrame = {
    val ev = events(spark, "/root/testdata/sf0.001")
    val perDay = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("ts"))
      .agg(count(lit(1)).cast("double").as("value"))
    Gaps.holes(perDay, Seq("user_id"),
      java.time.LocalDateTime.parse("2024-01-01T00:00"),
      java.time.LocalDateTime.parse("2024-01-30T00:00"), 86400L)
  }

  // ---- the operator inventory -----------------------------------------

  // ListMap: declaration order is the iteration order, so Verify dumps
  // and Bench JSON keys are stable run-to-run (not hash-ordered)
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    scala.collection.immutable.ListMap(

    // S1/P1/P3 — keyed scan + time slice (pushdown-friendly literal filters)
    "q_scan_filter" -> ((s, d) => {
      events(s, d)
        .filter(col("user_id") === 7 && col("event_type") === "view")
        .filter(col("ts") >= ts("2024-01-05 00:00:00") && col("ts") < ts("2024-01-20 00:00:00"))
        .select(col("event_id"), col("ts"), col("value"))
        .orderBy("event_id")
    }),

    // P1 — Django __-lookup filter compilation (in/range/startswith/lt) on the scan
    // path (chunk_timeserie_store.py:889-899; graft.store.Lookups): the
    // compiled predicates stay pushdown-eligible literals.
    "q_lookup_filter" -> ((s, d) => {
      events(s, d)
        .filter(graft.store.Lookups.compile(Map(
          "user_id__in" -> Seq(1, 5, 9, 23),
          "ts__range" -> (java.time.LocalDateTime.parse("2024-01-10T00:00"),
                          java.time.LocalDateTime.parse("2024-02-20T00:00")),
          "event_type__startswith" -> "vi",
          "value__lt" -> 50.0)).get)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
        .orderBy("user_id")
    }),

    // P2/F7 — chunk_index derivation + range pruning (year*12+month-1).
    // The chunk filter is on a DERIVED column, which no parquet reader can
    // push down — so the equivalent ts bounds ride along (chunk 24288 =
    // 2024-01, 24289 = 2024-02; chunkIndexMonthly is monotone in ts, so
    // [24288, 24289] ⇔ ts ∈ [2024-01-01, 2024-03-01) UTC) and row groups
    // prune at the scan. This is exactly the store read path's discipline
    // (ChunkStore.getTs derives both a partition filter AND ts bounds from
    // one interval); the r14 job probe showed the unpruned scan at 0.7 s
    // for a 2-row answer.
    "q_chunk_prune" -> ((s, d) => {
      val ci = Grid.chunkIndexMonthly(col("ts"), "UTC")
      events(s, d)
        .filter(col("ts") >= ts("2024-01-01 00:00:00") && col("ts") < ts("2024-03-01 00:00:00"))
        .withColumn("chunk_index", ci)
        .filter(col("chunk_index") >= 24288 && col("chunk_index") <= 24289)
        .groupBy("chunk_index")
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
        .orderBy("chunk_index")
    }),

    // J4 — dense calendar-grid reindex (spine LEFT JOIN values)
    "q_grid_reindex" -> ((s, d) => {
      val vals = events(s, d).filter(col("user_id") < 10)
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("ts"))
        .agg(round(avg(col("value")), 4).as("value_avg"))
      Grid.reindex(vals, Seq("user_id"),
          java.time.LocalDateTime.parse("2024-01-01T00:00"),
          java.time.LocalDateTime.parse("2024-01-08T00:00"), 3600L)
        .select(col("user_id"), col("ts"), col("value_avg"))
        .orderBy("user_id", "ts")
    }),

    // J1 — ts_combine_first: first non-null by priority at each (key, ts).
    // The fixture has duplicate (orderkey, linenumber) rows, so collapse to
    // one row per priority first (max ignores nulls) — keeps the ordered
    // coalesce deterministic in both engines.
    "q_combine_first" -> ((s, d) => {
      val li = lineitem(s, d).withColumn("val",
        when(col("l_discount") < 0.02, lit(null)).otherwise(col("l_quantity")))
      // ONE exchange for both stacked aggregations: hash-partitioning by
      // the (orderkey, shipdate) PREFIX satisfies ClusteredDistribution
      // for the wider (orderkey, shipdate, linenumber) grouping too, so
      // the dedup collapse and the ordered coalesce run back-to-back on
      // the same shuffle output instead of re-shuffling 600k
      // near-unchanged rows between them. Same trick at any scale: the
      // second agg's keys are a prefix of the first's.
      val uniq = li
        .repartition(col("l_orderkey"), col("l_shipdate"))
        .groupBy(col("l_orderkey"), col("l_shipdate").as("ts"), col("l_linenumber"))
        .agg(max(col("val")).as("val"))
      uniq.groupBy(col("l_orderkey"), col("ts"))
        .agg(Combine.firstNonNullByPriority(col("val"), col("l_linenumber")).as("value"))
      // no trailing orderBy: 600k output rows, and the correctness
      // compare re-sorts before hashing (q_update_merge discipline)
    }),

    // J2 — version-combined read (highest version wins, lower fills);
    // collapsed to one row per (key, ts, version) for determinism.
    "q_version_combine" -> ((s, d) => {
      val li = lineitem(s, d).select(
        col("l_orderkey"),
        col("l_linenumber").as("version"),
        col("l_shipdate").as("ts"),
        when(col("l_tax") > 0.06, lit(null)).otherwise(col("l_extendedprice")).as("value"))
      // one exchange for both stacked aggs (q_combine_first trick): the
      // (orderkey, ts) partitioning satisfies the wider dedup grouping
      // AND the ordered-coalesce grouping
      val uniq = li.repartition(col("l_orderkey"), col("ts"))
        .groupBy("l_orderkey", "version", "ts").agg(max(col("value")).as("value"))
      Combine.combineVersions(uniq, Seq("l_orderkey"), "version", "ts", "value")
      // no trailing orderBy (600k rows; compare re-sorts)
    }),

    // J2 knobs — get_lc(order_by=('version',), custom_filters={'version__gte': 2}):
    // ascending fold order (oldest entry wins) over a lookup-filtered scan
    // (hostore.py:218-268; Lookups.compileOne("version__gte", 2)).
    "q_version_select" -> ((s, d) => {
      val li = lineitem(s, d).select(
        col("l_orderkey"),
        col("l_linenumber").as("version"),
        col("l_shipdate").as("ts"),
        when(col("l_tax") > 0.06, lit(null)).otherwise(col("l_extendedprice")).as("value"))
      val uniq = li.filter(graft.store.Lookups.compileOne("version__gte", 2))
        .repartition(col("l_orderkey"), col("ts")) // one exchange, both aggs
        .groupBy("l_orderkey", "version", "ts").agg(max(col("value")).as("value"))
      Combine.combineOrdered(uniq, Seq("l_orderkey"), Seq("version" -> true), "ts", "value")
      // no trailing orderBy (500k rows; compare re-sorts)
    }),

    // J3 — update merge: new.combine_first(existing). ONE lineitem
    // aggregation derives BOTH feeds: ts is a group key, so the shipdate
    // predicate is constant per group and a conditional max equals the
    // old filtered re-aggregation. The shared stage is LAZY mat (r17):
    // the union's branches build it inside one stage (no cross-job AQE
    // race), and dropping the eager count() job measured 2.9→1.0-1.5 s
    // stage-cold / 0.5→0.2-0.4 s warm even though the merge groupBy now
    // pays its own Exchange (PlanSpec-pinned at exactly 1). Still never
    // the pre-r8 shape (re-scanning + re-aggregating 1.2M rows per
    // branch — 3 shuffles, 5.9x under contention). No trailing orderBy:
    // the correctness compare re-sorts before hashing.
    "q_update_merge" -> ((s, d) => {
      val agg = lineitem(s, d)
        .groupBy(col("l_orderkey"), col("l_linenumber"), col("l_shipdate").as("ts"))
        .agg(
          max(when(col("l_shipdate") >= ts("1998-01-01 00:00:00"), col("l_quantity") * 2)).as("__new"),
          max(col("l_quantity")).as("__old"))
        .pipe(graft.StageCache.mat)
      val newDf = agg.filter(col("__new").isNotNull)
        .select(col("l_orderkey"), col("l_linenumber"), col("ts"), col("__new").as("value"))
      val oldDf = agg
        .select(col("l_orderkey"), col("l_linenumber"), col("ts"), col("__old").as("value"))
      Combine.updateMerge(newDf, oldDf, Seq("l_orderkey", "l_linenumber"))
    }),

    // G1 — gaps-and-islands: runs of equal value per key (null-safe)
    "q_islands" -> ((s, d) => {
      val ev = events(s, d).select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("value"))
      Gaps.constantIslands(ev, Seq("user_id"), "ts", "value", Seq("event_id"))
        .select(col("user_id"), col("run_start"), col("run_end"), col("value"), col("run_len"))
        .orderBy("user_id", "run_start")
    }),

    // hot-series islands (constantIslandsSplit: per-bucket run-length with
    // a boundary run-state carry — q_asof_split's precedent: the scale
    // path gets its own oracle pin, the plain form keeps the benchmark
    // shape). Same oracle SQL as q_islands; identical output required.
    "q_islands_split" -> ((s, d) => {
      val ev = events(s, d).select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("value"))
      Gaps.constantIslandsSplit(ev, Seq("user_id"), "ts", "value", Seq("event_id"))
        .select(col("user_id"), col("run_start"), col("run_end"), col("value"), col("run_len"))
        .orderBy("user_id", "run_start")
    }),

    // G2/G3 — completeness holes over a dense grid, absent keys → full range
    "q_holes" -> ((s, d) => {
      val ev = events(s, d).filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("ts"))
        .agg(count(lit(1)).cast("double").as("value"))
      val requested = s.range(20).toDF("user_id")
      Gaps.holes(ev, Seq("user_id"),
          java.time.LocalDateTime.parse("2024-01-01T00:00"),
          java.time.LocalDateTime.parse("2024-01-30T00:00"), 86400L,
          requestedKeys = Some(requested))
        .orderBy("user_id", "hole_start")
    }),

    // G3/G5 — holes with min_delta threading: boundary gaps shorter than
    // min_delta drop (difference_missing semantics); interior islands and
    // all-missing keys survive unconditionally.
    "q_holes_mindelta" -> ((s, d) => {
      val ev = events(s, d).filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("ts"))
        .agg(count(lit(1)).cast("double").as("value"))
      Gaps.holes(ev, Seq("user_id"),
          java.time.LocalDateTime.parse("2024-01-01T00:00"),
          java.time.LocalDateTime.parse("2024-01-30T00:00"), 86400L,
          requestedKeys = Some(s.range(20).toDF("user_id")),
          minDeltaSecs = 3 * 86400L)
        .orderBy("user_id", "hole_start")
    }),

    // G5 — interval union (sweep-line as windows)
    "q_interval_union" -> ((s, d) => {
      val iv = orders(s, d).select(
        col("o_custkey"),
        col("o_orderdate").as("start"),
        (col("o_orderdate") + expr("INTERVAL 30 DAY")).as("end"))
      Intervals.unionIntervals(iv, Seq("o_custkey"))
        .orderBy("o_custkey", "merged_start")
    }),

    // G4 — find_groups: cluster keys by identical missing-range lists
    "q_find_groups" -> ((s, d) => {
      val ev = events(s, d).filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("ts"))
        .agg(count(lit(1)).cast("double").as("value"))
      Gaps.findGroups(ev, "user_id",
          java.time.LocalDateTime.parse("2024-01-01T00:00"),
          java.time.LocalDateTime.parse("2024-01-15T00:00"), 86400L,
          requestedKeys = Some(s.range(30).toDF("user_id")))
        .orderBy("missing_sig")
    }),

    // dedup — embedding-cosine near-dup pairs. Explicit label block keeps
    // the oracle SQL-expressible; the no-block DEFAULT is sign-LSH
    // bucketing (scale path, DedupSpec-covered).
    "q_embed_dedup" -> ((s, d) => {
      Dedup.embeddingCosinePairs(table(s, d, "embeddings"), "vec_id", "embedding",
          blockCols = Seq("label"), minCos = 0.35)
        .select(col("id_a"), col("id_b"), round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy("id_a", "id_b")
    }),

    // dedup — cross-corpus incremental exact dedup: the odd-id "new
    // crawl" snapshot anti-joined against the even-id "standing corpus"
    // on content hash, then self-deduped (min id per hash)
    "q_incremental_dedup" -> ((s, d) => {
      val docs = table(s, d, "documents")
      Dedup.crossCorpusDedup(
          docs.filter(col("doc_id") % 2 === 1),
          docs.filter(col("doc_id") % 2 === 0),
          "doc_id", "text")
        .select(col("id").as("doc_id"), col("content_hash"))
        .orderBy("doc_id")
    }),

    // dedup — Bloom-join crawl increment: the increment's hashes go into
    // a Bloom sketch, the corpus scan is pruned MAP-SIDE by
    // might_contain (no false negatives → no dup can slip through), and
    // the increment anti-joins only the surviving corpus hashes — so
    // corpus hashes never shuffle in full, the result is EXACT, and the
    // oracle is the plain anti-join. Different split (mod 3) than
    // q_incremental_dedup so the two paths can't shadow each other.
    "q_bloom_dedup" -> ((s, d) => {
      val docs = table(s, d, "documents")
      Dedup.crossCorpusDedupBloom(
          docs.filter(col("doc_id") % 3 =!= 0),
          docs.filter(col("doc_id") % 3 === 0),
          "doc_id", "text")
        .select(col("id").as("doc_id"), col("content_hash"))
        .orderBy("doc_id")
    }),

    // dedup — SemDeDup-style semantic dedup: kmeans-bucketed exact
    // cosine, drop a vector when a lower-id cluster-mate is within tau.
    // subPlanes=8 sub-blocks each cluster by sign-LSH bucket (block key =
    // cluster × bucket) so the quadratic block is |cluster ∩ bucket|, not
    // |cluster| — the fixed-k scale guard; subProbes=2 multi-probes the
    // lower-id side for recall at the bucket boundary.
    "q_semantic_dedup" -> ((s, d) => {
      Dedup.semanticDedup(table(s, d, "embeddings"), "vec_id", "embedding",
          k = 8, iters = 2, tau = 0.4, subPlanes = 8, subProbes = 2,
          cacheKey = Some(s"$d/embeddings"))
        .select(col("id").as("vec_id"), col("cluster"), col("dup_of"), col("keep"))
        .orderBy("vec_id")
    }),

    // P4 — bounds-NaN trim (keep [first, last] non-null per key)
    "q_trim_bounds" -> ((s, d) => {
      val ev = events(s, d).select(col("user_id"), col("event_id"), col("ts"),
        when(col("event_type") === "error", lit(null)).otherwise(col("value")).as("value"))
      Resample.trimBounds(ev, Seq("user_id"))
        .select("user_id", "event_id", "ts", "value")
        .orderBy("user_id", "event_id")
    }),

    // P6 — delay slice: drop the first 72h of each key's series
    "q_delay_slice" -> ((s, d) => {
      Resample.sliceWithDelay(events(s, d), Seq("user_id"), 72 * 3600L)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
        .orderBy("user_id")
    }),

    // A8 — min-max normalize per key (constant series → null)
    "q_normalize" -> ((s, d) => {
      Resample.normalize(events(s, d), Seq("user_id"))
        .select(col("event_id"), col("user_id"), round(col("value_norm"), 6).as("value_norm"))
        .orderBy("event_id")
    }),

    // A9 — frequency inference: min consecutive step per key (exact µs)
    "q_min_freq" -> ((s, d) => {
      Resample.minFreq(events(s, d), Seq("user_id")).orderBy("user_id")
    }),

    // stats — exponential smoothing level per series (Series.ewm analog):
    // scale-safe segmented fold (per-segment affine pairs composed in ts
    // order — no whole-series buffer); the oracle runs the collected
    // sequential fold (list_reduce), mathematically identical, and the
    // 6-dp round absorbs float reassociation
    "q_ewma" -> ((s, d) => {
      Stats.ewmaLevelSegmented(events(s, d).filter(col("user_id") < 40), Seq("user_id"), alpha = 0.3)
        .select(col("user_id"), col("n"), round(col("ewma"), 6).as("ewma"))
        .orderBy("user_id")
    }),

    // stats — winsorized clipping per series (Series.clip(quantiles)):
    // exact interpolated percentiles (Spark percentile == quantile_cont)
    "q_winsorize" -> ((s, d) => {
      Stats.winsorize(events(s, d).filter(col("user_id") < 10), Seq("user_id"),
          pLo = 0.05, pHi = 0.95)
        .select(col("event_id"), col("user_id"), round(col("value_clipped"), 6).as("value_clipped"))
        .orderBy("event_id")
    }),

    // stats — fixed-range histogram per series (value_counts(bins)):
    // shared [0, 100) grid, out-of-range values clamp to edge bins
    "q_histogram" -> ((s, d) => {
      Stats.histogram(events(s, d).filter(col("user_id") < 10), Seq("user_id"),
          lo = 0.0, hi = 100.0, bins = 20)
        .select(col("user_id"), col("bin"), round(col("bin_lo"), 6).as("bin_lo"), col("n"))
        .orderBy("user_id", "bin")
    }),

    // stats — MAD-rule robust outliers per series (load-curve QA):
    // exact medians both sides, only flagged rows returned
    "q_mad_outliers" -> ((s, d) => {
      Stats.madOutliers(events(s, d).filter(col("user_id") < 20), Seq("user_id"), k = 3.5)
        .filter(col("is_outlier"))
        .select(col("event_id"), col("user_id"), round(col("value"), 6).as("value"))
        .orderBy("event_id")
    }),

    // resample — period OHLC downsampling (pandas resample().ohlc());
    // open/close via the (ts, value) min/max-struct trick, one agg
    "q_ohlc" -> ((s, d) => {
      Resample.ohlc(events(s, d).filter(col("user_id") < 50), Seq("user_id"), "hour")
        .select(col("user_id"), col("period"),
          round(col("open"), 6).as("open"), round(col("high"), 6).as("high"),
          round(col("low"), 6).as("low"), round(col("close"), 6).as("close"), col("n"))
        .orderBy("user_id", "period")
    }),

    // stats — cumulative-meter consumption deltas with counter-reset
    // handling (Prometheus increase() semantics; first reading null).
    // Runs the bucket-carry split form (bounded lag-window partitions;
    // law-tested identical to the whole-series lag, the oracle twin)
    "q_counter_delta" -> ((s, d) => {
      Stats.counterDeltaSplit(events(s, d).filter(col("user_id") < 20), Seq("user_id"),
          orderCol = "event_id", splitSeconds = 7L * 86400L)
        .select(col("user_id"), col("event_id"), col("ts"),
          round(col("value"), 6).as("value"), round(col("delta"), 6).as("delta"),
          col("is_reset"))
        .orderBy("user_id", "event_id")
    }),

    // stats — CUSUM change-point detection per series (Page 1954) as
    // prefix-sum-minus-running-min window algebra; drift terms in exact
    // integer micro-units scaled by n (no float mean, the inertia
    // lesson). The query runs the bucket-carry SPLIT form (bounded
    // window partitions; law-tested bit-identical to the whole-series
    // form, which stays the DuckDB-portable oracle twin)
    "q_cusum" -> ((s, d) => {
      Stats.cusumSplit(events(s, d).filter(col("user_id") < 20), Seq("user_id"),
          slack = 25.0, threshold = 200.0, splitSeconds = 7L * 86400L)
        .select(col("user_id"), col("ts"), col("value"),
          col("cusum_hi"), col("cusum_lo"), col("alarm"))
        .orderBy("user_id", "ts", "value")
    }),

    // stats — weekly seasonal residuals (dow × hod profile, the
    // load-curve shape primitive); dow is 0=Sunday in both engines
    "q_deseasonalize" -> ((s, d) => {
      Stats.deseasonalize(events(s, d).filter(col("user_id") < 5), Seq("user_id"))
        .select(col("event_id"), col("user_id"),
          round(col("profile_mean"), 6).as("profile_mean"),
          round(col("residual"), 6).as("residual"))
        .orderBy("event_id")
    }),

    // A5 — max_horodate: latest non-null ts per key; absent keys → null
    "q_max_horodate" -> ((s, d) => {
      val live = events(s, d).filter(col("event_type") =!= "error")
        .groupBy("user_id").agg(max(col("ts")).as("max_horodate"))
      s.range(160).toDF("user_id").join(live, Seq("user_id"), "left")
        .orderBy("user_id")
    }),

    // A3 — last_updated_at with 2000-01-01 default on empty
    "q_last_updated" -> ((s, d) => {
      val upd = events(s, d).filter(col("event_type") === "signup")
        .groupBy("user_id").agg(max(col("ts")).as("mx"))
      s.range(20).toDF("user_id").join(upd, Seq("user_id"), "left")
        .select(col("user_id"),
          coalesce(col("mx"), ts("2000-01-01 00:00:00")).as("last_updated"))
        .orderBy("user_id")
    }),

    // A1/A2/A4 — counting aggregates
    "q_counts" -> ((s, d) => {
      events(s, d).groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          max(col("event_id")).as("max_event_id"))
        .orderBy("event_type")
    }),

    // J5 (prereq) — forward fill over the dense grid
    "q_ffill" -> ((s, d) => {
      val vals = events(s, d)
        .filter(col("user_id") < 5 && col("ts") >= ts("2024-01-01 00:00:00") && col("ts") < ts("2024-01-08 00:00:00"))
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("ts"))
        .agg(round(avg(col("value")), 4).as("value_avg"))
      val dense = Grid.reindex(vals, Seq("user_id"),
        java.time.LocalDateTime.parse("2024-01-01T00:00"),
        java.time.LocalDateTime.parse("2024-01-07T23:00"), 3600L)
      // split form (day buckets over the 7-day window): same semantics as
      // the whole-series window, no single-task series — oracle unchanged
      Resample.ffillSplit(dense, Seq("user_id"), "ts", "value_avg", "value_ffill",
          splitSeconds = 86400L)
        .select("user_id", "ts", "value_ffill")
        .orderBy("user_id", "ts")
    }),

    // time-weighted linear interpolation of the dense grid's interior
    // holes (Series.interpolate(method='time')); leading/trailing stay
    // null — no extrapolation
    "q_interpolate" -> ((s, d) => {
      val vals = events(s, d)
        .filter(col("user_id") < 5 && col("ts") >= ts("2024-01-01 00:00:00") && col("ts") < ts("2024-01-08 00:00:00"))
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("ts"))
        .agg(round(avg(col("value")), 4).as("value_avg"))
      val dense = Grid.reindex(vals, Seq("user_id"),
        java.time.LocalDateTime.parse("2024-01-01T00:00"),
        java.time.LocalDateTime.parse("2024-01-07T23:00"), 3600L)
      // split form (day buckets over the 7-day window): same semantics as
      // the whole-series window, no single-task series — oracle unchanged
      Resample.interpolateSplit(dense, Seq("user_id"), "ts", "value_avg", "value_interp",
          splitSeconds = 86400L)
        .select(col("user_id"), col("ts"), round(col("value_interp"), 6).as("value_interp"))
        .orderBy("user_id", "ts")
    }),

    // stats — robust rolling baseline: 24-row median window. Split form
    // (30-day padded buckets): same semantics as the whole-series window
    // (StatsSpec padding law), no single-task series — oracle unchanged
    "q_rolling_median" -> ((s, d) => {
      Stats.rollingMedianSplit(events(s, d).filter(col("user_id") < 5), Seq("user_id"),
          n = 24, orderCol = "event_id")
        .select(col("event_id"), col("user_id"), round(col("roll_med"), 6).as("roll_med"))
        .orderBy("event_id")
    }),

    // stats — tariff split: weekday 8-20h is peak (dow 0=Sunday both
    // engines after the -1 shift)
    "q_peak_offpeak" -> ((s, d) => {
      Stats.peakOffpeak(events(s, d).filter(col("user_id") < 40), Seq("user_id"))
        .select(col("user_id"), col("is_peak"),
          round(col("energy"), 4).as("energy"), col("n"))
        .orderBy("user_id", "is_peak")
    }),

    // stats — daily load factor (avg/max flatness KPI)
    "q_load_factor" -> ((s, d) => {
      Stats.loadFactor(events(s, d).filter(col("user_id") < 10), Seq("user_id"))
        .select(col("user_id"), col("day"), round(col("load_factor"), 6).as("load_factor"))
        .orderBy("user_id", "day")
    }),

    // stats — lag-1 autocorrelation per series: the forecasting
    // sanity-check number (persistence strength) straight off the store
    "q_autocorr" -> ((s, d) => {
      Stats.autocorr(events(s, d).filter(col("user_id") < 40), Seq("user_id"),
          lagK = 1, tsCol = "ts", orderCol = "event_id")
        .select(col("user_id"), col("n_pairs"), round(col("acf"), 6).as("acf"))
        .orderBy("user_id")
    }),

    // J5 — upsample with reference profile (ratio-to-period-mean)
    "q_upsample" -> ((s, d) => {
      val ev = events(s, d)
      val spine = Grid.spine(s,
        java.time.LocalDateTime.parse("2024-01-01T00:00"),
        java.time.LocalDateTime.parse("2024-01-07T23:00"), 3600L)
      val users = s.range(3).toDF("user_id")
      val ref = ev.groupBy(date_trunc("hour", col("ts")).as("ts"))
        .agg(round(sum(col("value")), 4).as("ref0"))
      val feat = ev.filter(col("user_id") < 3)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(round(sum(col("value")), 4).as("feat"))
      val dense = users.crossJoin(broadcast(spine))
        .withColumn("day", date_trunc("day", col("ts")))
        .join(ref, Seq("ts"), "left")
        .withColumn("ref", coalesce(col("ref0"), lit(0.0)))
        .join(feat, Seq("user_id", "day"), "left")
      Resample.upsampleWithProfile(dense, Seq("user_id"), "day", "feat", "ref", "value_up")
        .select(col("user_id"), col("ts"), round(col("value_up"), 4).as("value_up"))
        .orderBy("user_id", "ts")
    }),

    // I1 — sync updates listing: chunk metadata since a watermark, paginated
    "q_sync_updates" -> ((s, d) => {
      events(s, d)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("chunk_day"))
        .agg(max(col("ts")).as("updated_at"))
        .filter(col("updated_at") >= ts("2024-01-15 00:00:00"))
        .orderBy(col("updated_at"), col("user_id"), col("chunk_day"))
        .offset(50).limit(100)
    }),

    // find_groups piece — requested keys minus stored keys (anti-join)
    "q_absent_keys" -> ((s, d) => {
      s.range(200).toDF("user_id")
        .except(events(s, d).select(col("user_id")).distinct())
        .orderBy("user_id")
    }),

    // P5/W7 — tombstone filter: readers exclude soft-deleted rows
    "q_tombstone_filter" -> ((s, d) => {
      events(s, d)
        .withColumn("is_deleted", col("event_id") % 7 === 0)
        .filter(!col("is_deleted"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
        .orderBy("event_type")
    }),

    // analytics extension — grouping sets (ROLLUP) over the fact table
    "q_rollup" -> ((s, d) => {
      lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),

    // analytics extension — sessionization: gaps > 30 min split sessions
    // (training-data event segmentation; islands over time deltas)
    "q_sessionize" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      events(s, d)
        .withColumn("__prev", lag(col("ts"), 1).over(w))
        .withColumn("__new", when(col("__prev").isNull ||
          unix_micros(col("ts").cast("timestamp")) - unix_micros(col("__prev").cast("timestamp")) > 1800L * 1000000L, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("__new")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, org.apache.spark.sql.expressions.Window.currentRow)))
        .groupBy("user_id", "session_id")
        .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
        .orderBy("user_id", "session_start")
    }),

    // analytics tier — TPC-H-style pricing summary (bench headliner)
    "q_pricing_summary" -> ((s, d) => {
      lineitem(s, d).filter(col("l_shipdate") <= ts("1998-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // analytics tier — multi-way dimension join (broadcast dims)
    "q_revenue_join" -> ((s, d) => {
      val li = lineitem(s, d); val o = orders(s, d)
      val c = table(s, d, "customer"); val n = table(s, d, "nation"); val r = table(s, d, "region")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .filter(col("o_orderdate") >= ts("1995-01-01 00:00:00") && col("o_orderdate") < ts("1996-01-01 00:00:00"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy("n_name")
    }),

    // analytics tier — top-k with deterministic tie-break
    "q_top_customers" -> ((s, d) => {
      orders(s, d).groupBy("o_custkey")
        .agg(sum(col("o_totalprice")).as("rev_raw"))
        .orderBy(col("rev_raw").desc, col("o_custkey"))
        .limit(10)
        .select(col("o_custkey"), round(col("rev_raw"), 2).as("revenue"))
    }),

    // dedup — exact duplicate groups by content hash
    "q_dedup_exact" -> ((s, d) => {
      Dedup.exactGroups(table(s, d, "documents"), "doc_id", "text")
        .orderBy("content_hash")
    }),

    // dedup — normalization-robust exact groups: hash the canonical form
    // (lowercase, punctuation/whitespace collapsed) so near-exact dups
    // that raw-byte hashing misses land in one group
    "q_dedup_norm" -> ((s, d) => {
      val docs = table(s, d, "documents")
        .withColumn("__ctext", TextAnalysis.canonicalize(col("text")))
      Dedup.exactGroups(docs, "doc_id", "__ctext")
        .orderBy("content_hash")
    }),

    // dedup — exact-dup drop list (non-canonical rows)
    "q_dedup_drop" -> ((s, d) => {
      Dedup.exactDropList(table(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // dedup — n-gram Jaccard near-dup pairs. Explicit lang block keeps the
    // oracle SQL-expressible; the no-block DEFAULT routes through MinHash
    // LSH banding (scale path, DedupSpec-covered).
    "q_ngram_jaccard" -> ((s, d) => {
      Dedup.ngramJaccardPairs(table(s, d, "documents"), "doc_id", "text",
          n = 3, minJaccard = 0.5, blockCols = Seq("lang"))
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id_a", "id_b")
    }),

    // text analysis — per-language stopword scores (language-ID heuristic)
    "q_lang_scores" -> ((s, d) => {
      TextAnalysis.langScores(table(s, d, "documents"))
        .select(col("doc_id"), col("lang"),
          col("score_de").cast("long").as("score_de"),
          col("score_en").cast("long").as("score_en"),
          col("score_es").cast("long").as("score_es"),
          col("score_fr").cast("long").as("score_fr"),
          col("score_zh").cast("long").as("score_zh"))
        .orderBy("doc_id")
    }),

    // text analysis — token/char counts + quality ratios
    "q_quality" -> ((s, d) => {
      TextAnalysis.qualityScore(table(s, d, "documents"))
        .select(col("doc_id"),
          col("n_tokens").cast("long").as("n_tokens"),
          col("n_chars_m").cast("long").as("n_chars_m"),
          round(col("avg_token_len"), 4).as("avg_token_len"),
          round(col("stopword_ratio"), 4).as("stopword_ratio"))
        .orderBy("doc_id")
    }),

    // dedup/hygiene — benchmark decontamination: shingle overlap between
    // the corpus and a simulated eval set (doc_id % 97 == 0)
    "q_contamination" -> ((s, d) => {
      val docs = table(s, d, "documents")
      Dedup.contamination(
        docs.filter(col("doc_id") % 97 =!= 0), "doc_id", "text",
        docs.filter(col("doc_id") % 97 === 0), "text", n = 3, minShared = 3)
        .select(col("id").as("doc_id"), col("n_shared"))
        .orderBy("doc_id")
    }),

    // text analysis — repetition ratio (dominant n-gram share; the
    // boilerplate/spam pre-filter)
    "q_repetition" -> ((s, d) => {
      TextAnalysis.repetitionRatio(table(s, d, "documents"), "doc_id", "text", n = 3)
        .select(col("id").as("doc_id"), col("n_ngrams"), col("top_ngram_count"),
          round(col("rep_ratio"), 6).as("rep_ratio"))
        .orderBy("doc_id")
    }),

    // text analysis — Gopher repetition filters: char fraction of the top
    // 2-/3-gram and of duplicated 5-grams per doc (the Rae et al. §A1.1
    // machine-text gates)
    "q_gopher_rep" -> ((s, d) => {
      TextAnalysis.gopherRepetition(table(s, d, "documents"), "doc_id", "text",
          topNs = Seq(2, 3), dupNs = Seq(5))
        .select(col("id").as("doc_id"), col("total_chars"),
          round(col("top_2gram_char_frac"), 6).as("top_2gram_char_frac"),
          round(col("top_3gram_char_frac"), 6).as("top_3gram_char_frac"),
          round(col("dup_5gram_char_frac"), 6).as("dup_5gram_char_frac"))
        .orderBy("doc_id")
    }),

    // text analysis — Gopher LINE-level dup/format fractions. The fixture
    // text has no newlines, so the query deterministically manufactures
    // them first (every ' a '/' the ' becomes a line break — left-to-right
    // non-overlapping replace, identical in Spark and the RE2 oracle) and
    // the operator then runs with its default "\n" separator.
    "q_gopher_lines" -> ((s, d) => {
      val lined = table(s, d, "documents").select(col("doc_id"),
        regexp_replace(col("text"), " (a|the) ", "\n").as("text"))
      TextAnalysis.gopherLineStats(lined, "doc_id", "text")
        .select(col("id").as("doc_id"), col("total_lines"), col("total_chars"),
          round(col("dup_line_frac"), 6).as("dup_line_frac"),
          round(col("dup_line_char_frac"), 6).as("dup_line_char_frac"),
          round(col("ellipsis_line_frac"), 6).as("ellipsis_line_frac"),
          round(col("bullet_line_frac"), 6).as("bullet_line_frac"))
        .orderBy("doc_id")
    }),

    // C4 heuristic cleaning (Raffel et al. 2020 §2.2) over manufactured
    // lines — line retention (terminal punctuation, ≥5 words, no
    // "javascript") + page drops (lorem ipsum / brace / <3 kept lines)
    "q_c4_filters" -> ((s, d) => {
      val lined = table(s, d, "documents").select(col("doc_id"),
        regexp_replace(col("text"), " (a|the) ", "\n").as("text"))
      TextAnalysis.c4Filters(lined, "doc_id", "text")
        .select(col("id").as("doc_id"), col("total_lines"), col("kept_lines"),
          col("has_lorem"), col("has_brace"), col("keep_doc"), col("kept_text"))
        .orderBy("doc_id")
    }),

    // pipeline — fastText-style hashed linear classifier TRAINED in the
    // engine (12 full-batch GD steps here — `iters` is parameterized;
    // exact-integer aggregations; the k-means literal-weights pattern
    // applied to gradient descent). The fit is a ModelCache artifact:
    // train and score share ONE training run (the classifier is trained
    // once and consumed everywhere, not refit per consumer).
    // The label is length (n_chars >= 250): the one text property this
    // synthetic fixture's single shared vocabulary makes LEARNABLE — a
    // lang label here is random w.r.t. the text (ClassifierSpec proves
    // real separation on constructed vocabulary instead)
    "q_logreg_train" -> ((s, d) => {
      Classifier.weightTable(s, logregWeights(s, d)).orderBy("bucket")
    }),

    // pipeline — the trained classifier applied back over the corpus:
    // margin (exact micro units), calibrated p, hard prediction vs label
    "q_logreg_score" -> ((s, d) => {
      val docs = table(s, d, "documents").withColumn("is_long", col("n_chars") >= 250)
      val w = logregWeights(s, d)
      Classifier.scoreLogReg(docs, "doc_id", "text", w)
        .join(docs.select(col("doc_id").as("id"), col("is_long")), Seq("id"))
        .select(col("id").as("doc_id"), col("margin"), col("p"),
          col("predicted"), col("is_long").as("label"))
        .orderBy("doc_id")
    }),

    // pipeline — context-window chunking (token windows of 40, stride
    // 30); chunks generated inside one lambda, only slices survive
    "q_chunk_docs" -> ((s, d) => {
      TextAnalysis.chunkDocs(table(s, d, "documents"), "doc_id", "text",
          window = 40, stride = 30)
        .select(col("id").as("doc_id"), col("chunk_idx"), col("n_tokens"),
          col("chunk_text"))
        .orderBy("doc_id", "chunk_idx")
    }),

    // pipeline — split-leakage audit: near-dup pairs (MinHash LSH)
    // crossing a deterministic hash train/valid/test split
    "q_split_leakage" -> ((s, d) => {
      val docs = table(s, d, "documents")
      val splits = Sampling.shardAssign(docs, "doc_id", numShards = 10, salt = "split")
        .withColumn("split",
          when(col("shard") < 8, "train").when(col("shard") === 8, "valid").otherwise("test"))
      val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
        n = 3, bands = 8, rowsPerBand = 4, minSim = 0.5).select("id_a", "id_b")
      Curation.splitLeakage(splits, "doc_id", "split", pairs)
        .orderBy("split_a", "split_b")
    }),

    // corpus analytics — Zipf-law fit over the vocabulary (slope of
    // ln freq vs ln rank; corpus-health / synthetic-text detector).
    // Regression sums in exact integer micro-units (decimal 38,0).
    "q_zipf" -> ((s, d) => {
      TextAnalysis.zipfFit(table(s, d, "documents"), "text")
    }),

    // corpus analytics — per-doc n-gram novelty: fraction of a doc's
    // distinct trigram shingles with corpus document-frequency 1
    // (diversity weighting / inverse-boilerplate signal)
    "q_novelty" -> ((s, d) => {
      TextAnalysis.novelty(table(s, d, "documents"), "doc_id", "text", n = 3)
        .select(col("id").as("doc_id"), col("n_shingles"), col("n_novel"),
          col("novelty"))
        .orderBy("doc_id")
    }),

    // corpus analytics — exact top-k heavy hitters with a Count-Min
    // Sketch cross-check (portable universal-hash sketch rows; the
    // oracle replays the sketch bit-for-bit, cms_est >= n_exact by law)
    "q_heavy_hitters" -> ((s, d) => {
      TextAnalysis.heavyHitters(table(s, d, "documents"), "text",
          k = 50, width = 1024, depth = 4)
        .orderBy(col("n_exact").desc, col("term"))
    }),

    // corpus analytics — first-merge BPE pair statistics: adjacent
    // character-pair frequencies weighted by word occurrence (the
    // opening step of byte-pair-encoding tokenizer training)
    "q_bpe_pairs" -> ((s, d) => {
      TextAnalysis.bpePairStats(table(s, d, "documents"), "text", k = 50)
        .orderBy(col("n").desc, col("pair"))
    }),

    // curation — EXACT stratified proportional split (largest-remainder
    // per-stratum counts; salted-hash order; bucketed ranking, no
    // whole-stratum window)
    "q_stratified_split" -> ((s, d) => {
      Sampling.stratifiedSplit(table(s, d, "documents"), "doc_id", "lang",
          Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1), salt = "strat")
        .select(col("doc_id"), col("lang"), col("split"))
        .orderBy("doc_id")
    }),

    // corpus analytics — per-group embedding dispersion: mean pairwise
    // squared distance WITHOUT pairs (2n·Σ||x||² − 2||Σx||² identity);
    // exact micro-unit sums, 6-dp by integer half-up division
    "q_embed_dispersion" -> ((s, d) => {
      Similarity.embeddingDispersion(table(s, d, "embeddings"), "label", "embedding")
        .orderBy("label")
    }),

    // corpus analytics — cross-source overlap matrix: estimated Jaccard
    // between whole sub-corpora from per-source union MinHash signatures
    // (one explode + one group agg; pairwise over the few groups only)
    "q_source_sim" -> ((s, d) => {
      Dedup.minhashGroupSim(table(s, d, "documents"), "source", "text",
          n = 3, numHashes = 32, idCol = Some("doc_id"))
        .orderBy("grp_a", "grp_b")
    }),

    // text analysis — PII redaction (emails + digit runs → typed tokens)
    "q_redact" -> ((s, d) => {
      table(s, d, "documents")
        .select(col("doc_id"), TextAnalysis.redact(col("text")).as("redacted"))
        .orderBy("doc_id")
    }),

    // text analysis — per-language length-distribution profile (exact
    // quantiles for the oracle; approx_percentile is the 100 TB default,
    // pinned against exact by PipelineSpec)
    "q_length_quantiles" -> ((s, d) => {
      TextAnalysis.lengthQuantiles(table(s, d, "documents"), "lang", "n_chars", exact = true)
        .select(col("lang"),
          round(col("p25"), 4).as("p25"), round(col("p50"), 4).as("p50"),
          round(col("p75"), 4).as("p75"), round(col("p95"), 4).as("p95"),
          col("n_docs"), round(col("mean"), 4).as("mean"))
        .orderBy("lang")
    }),

    // text analysis — token counts under the three budget tokenizations
    // (whitespace chunks, alphanumeric words, BPE-ish pre-tokens)
    "q_token_counts" -> ((s, d) => {
      TextAnalysis.tokenCounts(table(s, d, "documents"), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_ws"), col("n_alnum"), col("n_bpe"))
        .orderBy("doc_id")
    }),

    // text analysis — TF-IDF top terms per document
    "q_tfidf" -> ((s, d) => {
      TextAnalysis.tfIdfTop(table(s, d, "documents"), "doc_id", "text", k = 3)
        .select(col("id").as("doc_id"), col("term"),
          round(col("tfidf"), 6).as("tfidf"), col("rank").cast("long").as("rank"))
        .orderBy("doc_id", "rank")
    }),

    // rolling features — trailing moving average per key (training-data
    // windowed feature extraction). Split form (padded buckets): identical
    // values to the whole-series window, no single-task series
    "q_moving_avg" -> ((s, d) => {
      Stats.movingAvgSplit(events(s, d), Seq("user_id"),
          n = 5, orderCol = "event_id", outCol = "ma5")
        .withColumn("ma5", round(col("ma5"), 4))
        .select("user_id", "event_id", "ts", "ma5")
        .orderBy("user_id", "event_id")
    }),

    // interval alignment — binned range join: purchases attributed to the
    // 2h attribution window of each view (graft.ts.Intervals.rangeJoin:
    // interval->bin explode + equi-join, never a nested-loop BETWEEN join)
    "q_range_join" -> ((s, d) => {
      val base = events(s, d)
        .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
      val purchases = base.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts_us"))
      val views = base.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"),
          col("ts_us").as("start_us"), (col("ts_us") + lit(7200000000L)).as("end_us"))
      graft.ts.Intervals.rangeJoin(purchases, views, Seq("user_id"),
          "ts_us", "start_us", "end_us", binWidth = 3600000000L)
        .select(col("user_id"), col("event_id"), col("view_id"))
        .orderBy("user_id", "event_id", "view_id")
    }),

    // timeseries alignment — backward as-of join with tolerance: each
    // click gets the latest preceding view value within 6h (graft.ts.Asof:
    // union + one keyed window, no range join)
    "q_asof_join" -> ((s, d) => {
      val ev = events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .groupBy("user_id", "ts").agg(max(col("value")).as("view_value"))
      graft.ts.Asof.asofJoin(clicks, views, Seq("user_id"), "ts",
          rightCols = Seq("view_value"), toleranceSecs = Some(6 * 3600L))
        .select(col("user_id"), col("event_id"), col("ts"),
          round(col("view_value"), 6).as("view_value"))
        .orderBy("user_id", "event_id")
    }),

    // hot-series as-of: identical semantics via the pre-split form — each
    // (user, week-bucket) aligns as its own window task, boundary matches
    // restored from per-bucket edge carries (Asof.asofJoinSplit); same
    // DuckDB ASOF oracle as q_asof_join
    "q_asof_split" -> ((s, d) => {
      val ev = events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .groupBy("user_id", "ts").agg(max(col("value")).as("view_value"))
      graft.ts.Asof.asofJoinSplit(clicks, views, Seq("user_id"), "ts",
          rightCols = Seq("view_value"), toleranceSecs = Some(6 * 3600L),
          splitSeconds = 7L * 86400L)
        .select(col("user_id"), col("event_id"), col("ts"),
          round(col("view_value"), 6).as("view_value"))
        .orderBy("user_id", "event_id")
    }),

    // similarity — exact brute-force cosine top-k (ANN baseline)
    "q_cosine_topk" -> ((s, d) => {
      val emb = table(s, d, "embeddings")
      Similarity.bruteForceTopK(emb.filter(col("vec_id") < 10), emb, k = 5)
        .select(col("query_id"), col("vec_id"),
          round(col("cos_sim"), 6).as("cos_sim"), col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),

    // multimodal — binary payload plumbing + stubbed decode features
    "q_multimodal_features" -> ((s, d) => {
      val media = Multimodal.syntheticMedia(table(s, d, "documents"), "doc_id")
      Multimodal.extractFeatures(media).toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"),
          round(col("byte_mean"), 4).as("byte_mean"))
        .orderBy("media_id")
    }),

    // dedup — MinHash+LSH candidate pairs (portable md5-based hashing:
    // the DuckDB oracle reproduces the full signature pipeline)
    "q_minhash_lsh" -> ((s, d) => {
      Dedup.minhashLshPairs(table(s, d, "documents"), "doc_id", "text",
          n = 3, bands = 8, rowsPerBand = 4, minSim = 0.5)
        .select(col("id_a"), col("id_b"), round(col("sig_sim"), 6).as("sig_sim"))
        .orderBy("id_a", "id_b")
    }),

    // dedup — asymmetric CONTAINMENT pairs: |A∩B| / min(|A|,|B|) over
    // the same banded candidates (catches subset/quote duplication that
    // symmetric Jaccard misses; no size-ratio prune by design)
    "q_containment_pairs" -> ((s, d) => {
      Dedup.ngramContainmentPairs(table(s, d, "documents"), "doc_id", "text",
          n = 3, minContainment = 0.6)
        .select(col("id_a"), col("id_b"), round(col("containment"), 6).as("containment"))
        .orderBy("id_a", "id_b")
    }),

    // dedup — near-dup CLUSTERS: minhash pairs → connected components →
    // one canonical doc per duplicate group (the end-to-end dedup step;
    // pairs alone under-delete transitive groups)
    "q_dup_clusters" -> ((s, d) => {
      Clustering.nearDupClusters(table(s, d, "documents"), "doc_id", "text",
          n = 3, bands = 8, rowsPerBand = 4, minSim = 0.5)
        .orderBy("id")
    }),

    // dedup — quality-priority retention: same minhash components as
    // q_dup_clusters, but the survivor is the highest-n_chars doc
    // (tie → lowest id), not the lowest-id canonical
    "q_dedup_best" -> ((s, d) => {
      val docs = table(s, d, "documents")
      Dedup.dedupKeepBest(docs, "doc_id", "n_chars",
          Dedup.minhashLshPairs(docs, "doc_id", "text", n = 3, bands = 8,
            rowsPerBand = 4, minSim = 0.5))
        .orderBy("id")
    }),

    // dedup — substring-level duplication: maximal spans of duplicated
    // 5-token windows (finds the boilerplate paragraph INSIDE otherwise
    // unique documents; windowed approximation of suffix-array dedup)
    "q_dup_spans" -> ((s, d) => {
      Dedup.duplicateSpans(table(s, d, "documents"), "doc_id", "text", w = 5)
        .select(col("id").as("doc_id"), col("span_start"), col("span_end"), col("n_windows"))
        .orderBy("doc_id", "span_start")
    }),

    // dedup — SimHash near-dup pairs (60-bit portable signatures)
    "q_simhash_pairs" -> ((s, d) => {
      Dedup.simhashPairs(table(s, d, "documents"), "doc_id", "text", maxHamming = 3)
        .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
        .orderBy("id_a", "id_b")
    }),

    // sampling — deterministic stratified sample + stable shard
    // assignment (portable hash membership: rerun/repartition/engine-
    // proof, unlike DataFrame.sample)
    "q_sample_shard" -> ((s, d) => {
      val docs = table(s, d, "documents")
      val sampled = Sampling.stratifiedSample(docs, "doc_id", "lang",
        Map("en" -> 0.5), defaultFraction = 0.2)
      Sampling.shardAssign(sampled, "doc_id", numShards = 8)
        .select(col("doc_id"), col("lang"), col("shard"))
        .orderBy("doc_id")
    }),

    // curation — the full pre-training data path composed as ONE plan:
    // quality gate → exact dedup → stratified sample → shard + pack
    "q_curation_pipeline" -> ((s, d) => {
      Curation.curate(table(s, d, "documents"), "doc_id", "text", "lang",
          minTokens = 5, fractions = Map("en" -> 0.6), defaultFraction = 0.4,
          budget = 512, numShards = 4)
        .select(col("id").as("doc_id"), col("lang"), col("n_tokens"),
          col("shard"), col("start_off"), col("pack_first"), col("pack_last"))
        .orderBy("doc_id")
    }),

    // curation — cross-modal: text gate + dedup joined with embeddings,
    // k-means DIVERSITY sampling decides representation, then pack
    "q_curate_diverse" -> ((s, d) => {
      Curation.curateDiverse(table(s, d, "documents"), table(s, d, "embeddings"),
          "doc_id", "text", "lang", "vec_id", "embedding",
          minTokens = 5, k = 4, iters = 2, perCluster = 32,
          budget = 512, numShards = 4, cacheKey = Some(s"$d/documents+embeddings"))
        .select(col("id").as("doc_id"), col("lang"), col("n_tokens"), col("cluster"),
          col("shard"), col("start_off"), col("pack_first"), col("pack_last"))
        .orderBy("doc_id")
    }),

    // packing — GPT-style concat-then-split sequence packing for training
    // exports: hash-shard, deterministic well-mixed order within shard,
    // running token offset → fixed-budget pack ids (pack_last >
    // pack_first ⇔ the doc straddles a sequence boundary)
    "q_pack_sequences" -> ((s, d) => {
      Packing.packSequences(table(s, d, "documents"), "doc_id", "text",
          budget = 512, numShards = 4)
        .select(col("id").as("doc_id"), col("shard"), col("n_tokens"),
          col("start_off"), col("pack_first"), col("pack_last"))
        .orderBy("doc_id")
    }),

    // text analysis — winnowing fingerprints (MOSS): min of every
    // k-window of w-token window hashes — density-reduced fingerprints
    // with the shared-run guarantee
    "q_winnow" -> ((s, d) => {
      TextAnalysis.winnow(table(s, d, "documents"), "doc_id", "text", w = 5, k = 4)
        .select(col("id").as("doc_id"), col("pos"), col("fp"))
        .orderBy("doc_id", "pos", "fp")
    }),

    // text analysis — near-dup candidate pairs at winnowed density
    // (df-capped fingerprint join; shuffles carry (fp, id) longs)
    "q_winnow_pairs" -> ((s, d) => {
      TextAnalysis.winnowPairs(table(s, d, "documents"), "doc_id", "text",
          w = 5, k = 4, minShared = 2, maxDf = 100)
        .select(col("id_a"), col("id_b"), col("n_shared"))
        .orderBy("id_a", "id_b")
    }),

    // text analysis — rolling-hash fingerprints (portable token hash)
    "q_fingerprint" -> ((s, d) => {
      table(s, d, "documents")
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    }),

    // similarity — IVF-flat ANN (deterministic md5-sampled centroids,
    // nprobe cells per query)
    "q_ivf_topk" -> ((s, d) => {
      val emb = table(s, d, "embeddings")
      Similarity.ivfTopK(emb.filter(col("vec_id") < 10), emb, k = 5, nlist = 16, nprobe = 2)
        .select(col("query_id"), col("vec_id"),
          round(col("cos_sim"), 6).as("cos_sim"), col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),

    // similarity — LSH-bucketed ANN (scale path; literal plane matrix)
    "q_lsh_topk" -> ((s, d) => {
      val emb = table(s, d, "embeddings")
      Similarity.lshTopK(emb.filter(col("vec_id") < 10), emb, k = 5, numPlanes = 8)
        .select(col("query_id"), col("vec_id"),
          round(col("cos_sim"), 6).as("cos_sim"), col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),

    // similarity — recall@k of the LSH index vs the brute-force truth:
    // the figure of merit for tuning planes/probes before committing an
    // index shape at scale. Joins two k·|queries| frames; never rescans
    // the corpus.
    "q_ann_recall" -> ((s, d) => {
      val emb = table(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
      Similarity.recallAtK(
          Similarity.lshTopK(queries, emb, k = 5, numPlanes = 8),
          Similarity.bruteForceTopK(queries, emb, k = 5))
        .select(col("query_id"), col("n_exact"), col("n_hit"),
          round(col("recall"), 6).as("recall"))
        .orderBy("query_id")
    }),

    // similarity — IVF with a TRAINED coarse quantizer (k-means codebook
    // instead of a raw sample; balanced cells → better recall per probe)
    "q_ivf_kmeans" -> ((s, d) => {
      val emb = table(s, d, "embeddings")
      Similarity.ivfTopKTrained(emb.filter(col("vec_id") < 10), emb,
          k = 5, nlist = 8, nprobe = 2, iters = 2,
          cacheKey = Some(s"$d/embeddings"))
        .select(col("query_id"), col("vec_id"),
          round(col("cos_sim"), 6).as("cos_sim"), col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),

    // curation — cluster-balanced diversity sample (kmeans cells +
    // deterministic per-cluster hash-rate membership; no top-N window)
    "q_diversity_sample" -> ((s, d) => {
      Curation.diversitySample(table(s, d, "embeddings"), "vec_id", "embedding",
          k = 8, iters = 2, perCluster = 16,
          cacheKey = Some(s"$d/embeddings"))
        .select(col("id").as("vec_id"), col("cluster"), col("keep"))
        .orderBy("vec_id")
    }),

    // curation — temperature-scaled source-mixing weights (w ∝ share^α):
    // how much of each source the training mix should sample
    "q_mix_weights" -> ((s, d) => {
      Curation.mixWeights(table(s, d, "documents"), "source", "text", alpha = 0.5)
        .select(col("source"), col("n_tokens"), col("n_docs"),
          round(col("share"), 6).as("share"), round(col("weight"), 6).as("weight"))
        .orderBy("source")
    }),

    // curation — realize the alpha=0.5 mixture as an actual deterministic
    // sample under a 10k-token budget (rate = budget×weight/actual per
    // source, hash-score membership)
    "q_mix_apply" -> ((s, d) => {
      val docs = table(s, d, "documents")
      val w = Curation.mixWeights(docs, "source", "text", alpha = 0.5)
      Curation.applyMixWeights(docs, "doc_id", "source", w,
          tokenBudget = 10000L, "text", salt = "mix")
        .select(col("id").as("doc_id"), col("source"), col("n_tokens"),
          round(col("rate"), 6).as("rate"))
        .orderBy("doc_id")
    }),

    // curation — epoch-aware mixture: under-budget sources repeat
    // (floor(rate) copies + fractional hash extra), oversized sources
    // downsample exactly like q_mix_apply
    "q_mix_epochs" -> ((s, d) => {
      val docs = table(s, d, "documents")
      val w = Curation.mixWeights(docs, "source", "text", alpha = 0.5)
      Curation.mixEpochs(docs, "doc_id", "source", w,
          tokenBudget = 60000L, "text", salt = "mix")
        .select(col("id").as("doc_id"), col("source"), col("n_tokens"),
          round(col("rate"), 6).as("rate"), col("copies"))
        .orderBy("doc_id")
    }),

    // curation — unigram-LM self-perplexity (statistical quality score;
    // vocabulary joined, never assumed broadcast-able)
    "q_perplexity" -> ((s, d) => {
      TextAnalysis.perplexity(table(s, d, "documents"), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_tokens"),
          round(col("avg_nll"), 6).as("avg_nll"), round(col("ppl"), 6).as("ppl"))
        .orderBy("doc_id")
    }),

    // text analysis — bigram LM perplexity (add-1 smoothed conditional
    // NLL; the order-sensitive quality signal unigram perplexity misses)
    "q_bigram_ppl" -> ((s, d) => {
      TextAnalysis.bigramPerplexity(table(s, d, "documents"), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_bigrams"),
          round(col("avg_nll"), 6).as("avg_nll"), round(col("ppl"), 6).as("ppl"))
        .orderBy("doc_id")
    }),

    // text analysis — top-k PMI collocations over the shared bigram
    // stage (glued word pairs vs merely frequent; Church-Hanks minCount)
    "q_pmi_pairs" -> ((s, d) => {
      TextAnalysis.pmiPairs(table(s, d, "documents"), "doc_id", "text",
          k = 50, minCount = 5)
        .select(col("prev"), col("cur"), col("n"), round(col("pmi"), 6).as("pmi"))
        .orderBy(col("pmi").desc, col("prev"), col("cur"))
    }),

    // curation — per-language length-decile binning (broadcast quantile
    // cutpoints; never a global ntile, which cannot scale past one
    // partition)
    "q_quality_bins" -> ((s, d) => {
      Curation.quantileBins(table(s, d, "documents"), "lang", "n_chars", k = 10, exact = true)
        .select(col("doc_id"), col("lang"), col("n_chars"), col("bin"))
        .orderBy("doc_id")
    }),

    // curation — per-domain cap (at most `cap` docs per source, best by
    // length): exact two-phase salted top-N, never a whole-domain window
    "q_domain_cap" -> ((s, d) => {
      Curation.capPerDomain(table(s, d, "documents"), "source", "doc_id", "n_chars", cap = 10)
        .select(col("doc_id"), col("source"), col("n_chars"), col("rank"))
        .orderBy("doc_id")
    }),

    // DSIR (Xie et al. 2023): importance scores of every corpus doc
    // against a target distribution (here: the doc_id%7==0 slice standing
    // in for a trusted corpus), hashed uni+bigram features, micro-unit
    // deterministic aggregation
    "q_dsir_scores" -> ((s, d) => {
      val docs = table(s, d, "documents")
      Curation.dsirScores(docs, docs.filter(col("doc_id") % 7 === 0),
          "doc_id", "text", numBuckets = 4096)
        .select(col("doc_id"), col("n_features"),
          round(col("score"), 6).as("score"))
        .orderBy("doc_id")
    }),

    // Gumbel-top-k importance resampling over the DSIR scores —
    // deterministic (hash-derived noise), ∝ exp(score) without replacement
    "q_dsir_sample" -> ((s, d) => {
      val docs = table(s, d, "documents")
      val scored = Curation.dsirScores(docs, docs.filter(col("doc_id") % 7 === 0),
        "doc_id", "text", numBuckets = 4096)
      Curation.dsirSample(scored, "doc_id", "score", n = 100)
        .select(col("doc_id"), round(col("score"), 6).as("score"),
          round(col("gumbel_key"), 6).as("gumbel_key"))
        .orderBy("doc_id")
    }),

    // clustering — deterministic k-means over embeddings (Lloyd's, 2
    // iterations, md5-seeded init, quantized centroids)
    "q_kmeans" -> ((s, d) => {
      Clustering.kmeans(table(s, d, "embeddings"), "vec_id", "embedding", k = 8, iters = 2,
          cacheKey = Some(s"$d/embeddings"))
        .select(col("id").as("vec_id"), col("cluster"), col("dist"))
        .orderBy("vec_id")
    }),

    // clustering — per-cluster quality diagnostics (size share = balance,
    // inertia = Lloyd's objective, mean/max squared distance = compactness)
    "q_kmeans_inertia" -> ((s, d) => {
      Clustering.clusterMetrics(
          Clustering.kmeans(table(s, d, "embeddings"), "vec_id", "embedding", k = 8, iters = 2,
            cacheKey = Some(s"$d/embeddings")))
        .select(col("cluster"), col("n_points"), round(col("share"), 6).as("share"),
          round(col("inertia"), 6).as("inertia"),
          round(col("mean_sqdist"), 6).as("mean_sqdist"), col("max_sqdist"))
        .orderBy("cluster")
    }),

    // similarity — trained-IVF ANN on the int8-quantized column: the
    // codebook, cells, probes, and cosine all run in the quantized space
    "q_ivf_int8" -> ((s, d) => {
      val emb = table(s, d, "embeddings")
      Similarity.ivfTopKInt8(emb.filter(col("vec_id") < 10), emb,
          k = 5, nlist = 8, nprobe = 2, iters = 2,
          cacheKey = Some(s"$d/embeddings"))
        .select(col("query_id"), col("vec_id"),
          round(col("cos_sim"), 6).as("cos_sim"), col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),

    // similarity — LSH ANN on the int8-quantized column only (scales
    // cancel in cosine, so scoring is integer-vector cosine; 4x less
    // scan I/O than the float path)
    "q_lsh_int8" -> ((s, d) => {
      val emb = table(s, d, "embeddings")
      Similarity.lshTopKInt8(emb.filter(col("vec_id") < 10), emb,
          k = 5, numPlanes = 8)
        .select(col("query_id"), col("vec_id"),
          round(col("cos_sim"), 6).as("cos_sim"), col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),

    // similarity — FAISS-style two-stage search: int8 LSH candidate
    // generation (4x less scan I/O, quantization-error scores) + exact
    // float re-rank of the 10-deep shortlist (restores exact ordering,
    // reading float vectors only for shortlist rows)
    "q_ann_rerank" -> ((s, d) => {
      val emb = table(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
      val shortlist = Similarity.lshTopKInt8(queries, emb, k = 10, numPlanes = 8)
      Similarity.rerankExact(shortlist, queries, emb, k = 5)
        .select(col("query_id"), col("vec_id"),
          round(col("cos_sim"), 6).as("cos_sim"), col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),

    // similarity — symmetric int8 embedding quantization (ANN storage
    // trim), exploded per dimension so the oracle compares scalars
    // exact upper-triangle embedding covariance (PCA/whitening input):
    // per-row generated products, micro-unit decimal sums — the only
    // data-side statistic PCA needs (the eigen solve is d×d, driver-side)
    "q_embed_cov" -> ((s, d) => {
      Similarity.embeddingCovariance(table(s, d, "embeddings"), "vec_id", "embedding",
          cacheKey = Some(s"$d/embeddings"))
        .select(col("i"), col("j"), col("n"), round(col("cov"), 9).as("cov"))
        .orderBy("i", "j")
    }),

    // similarity — the PCA path exercised END-TO-END: exact covariance →
    // driver-side Jacobi basis (top-48 of 64: 86% variance on the
    // near-isotropic synthetic fixture; real text embeddings are low-rank
    // and would reduce much harder) → literal-array projection → exact
    // top-k in the reduced space. The DuckDB twin receives the computed
    // basis as literal CTE rows (the eigen solve is not SQL-expressible,
    // but everything downstream of it is) and replays projection +
    // reduced-space top-k — so the oracle hash-checks the whole data
    // path, and the eigen solve itself is pinned by PipelineSpec:
    // full-basis rotation preserves the exact top-k, recall grows with
    // retained variance, ≥0.5 at this k, and everything is
    // bit-deterministic (exact covariance → same basis every run).
    // Cosine in the projected space is basis-sign-invariant (a flipped
    // eigenvector negates that coordinate of BOTH sides).
    "q_pca_topk" -> ((s, d) => {
      val emb = table(s, d, "embeddings")
      val basis = pipeline.ModelCache.getOrFit(s"pcabasis:$d/embeddings:k48") {
        val cov = Similarity.embeddingCovariance(emb, "vec_id", "embedding",
          cacheKey = Some(s"$d/embeddings"))
        Similarity.pcaBasis(cov, 48)._2
      }
      // publish the computed basis so oracleSql can emit it as literal
      // rows — DuckDB then replays projection + reduced-space top-k and
      // only the (law-tested) eigen solve itself is trusted
      lastPcaBasis = Some(basis)
      val proj = Similarity.projectEmbeddings(emb, "vec_id", "embedding", basis)
      Similarity.bruteForceTopK(proj.filter(col("vec_id") < 10), proj,
          vecCol = "proj", k = 5)
        .select(col("query_id"), col("vec_id"),
          round(col("cos_sim"), 6).as("cos_sim"), col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),

    "q_quantize_embed" -> ((s, d) => {
      Similarity.quantizeInt8(table(s, d, "embeddings"), "vec_id", "embedding")
        .select(col("id").as("vec_id"), round(col("scale"), 9).as("scale"),
          posexplode(col("qvec")).as(Seq("pos", "qval")))
        .select(col("vec_id"), (col("pos") + 1).cast("long").as("dim"),
          col("qval").cast("long").as("qval"), col("scale"))
        .orderBy("vec_id", "dim")
    }),

    // similarity — multi-probe LSH ANN: each query also probes its
    // numProbes-1 lowest-margin bit-flip buckets (recall boost, no extra
    // hash tables; corpus still hashed once)
    "q_lsh_multiprobe" -> ((s, d) => {
      val emb = table(s, d, "embeddings")
      Similarity.lshTopKMultiProbe(emb.filter(col("vec_id") < 10), emb,
          k = 5, numPlanes = 8, numProbes = 3)
        .select(col("query_id"), col("vec_id"),
          round(col("cos_sim"), 6).as("cos_sim"), col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),

    // W4 — TimeseriesStore facade lifecycle: batch set → replace →
    // read-back. The one write-path operator whose full lifecycle is
    // observable as a result set, so it gets a real oracle: users 0-2
    // each get a daily 'view' series in ONE setManyTs batch write
    // (set_many_ts parity, chunk_timeserie_store.py:419-449); user 1 is
    // then REPLACED by a doubled 'purchase' series; the read-back shows
    // old data for users 0/2 and ONLY the new data for user 1 (replace
    // tombstones nothing here — non-chunked whole-series swap,
    // timeserie_store.py:126-133).
    "q_store_replace" -> ((s, d) => {
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      val dir = java.nio.file.Files.createTempDirectory("graft_tstore_").toString
      val st = new graft.store.TimeseriesStore(s, dir,
        StructType(Seq(StructField("user_id", LongType))))
      // one events scan feeds every write: the store's write jobs
      // (normalize/duplicate-probe/stage) re-read the materialized
      // shared-stage aggregate, not the events table. LAZY mat (not
      // matHot): the consumers are SEQUENTIAL actions (setManyTs's
      // checkpoint job builds the stage inline, setTs and the read-back
      // then reuse it), and each plan references the stage once — no
      // concurrent-rebuild race, so the eager count would be a pure
      // extra scheduler round-trip per run.
      val daily = events(s, d)
        .filter(col("user_id") < 3 && col("event_type").isin("view", "purchase"))
        .groupBy(col("user_id"), col("event_type"), date_trunc("day", col("ts")).as("ts"))
        .agg(avg(col("value")).as("avg_v"))
        .pipe(graft.StageCache.mat)
      st.setManyTs(daily.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), round(col("avg_v"), 6).as("value")))
      val purchases = daily
        .filter(col("user_id") === 1 && col("event_type") === "purchase")
        .select(col("ts"), round(col("avg_v") * 2.0, 6).as("value"))
      st.setTs(Map("user_id" -> 1L), purchases, replace = true)
      st.getTs().orderBy("user_id", "ts")
    }),

    // W4 — TimeseriesStore facade UPDATE path: combine-on-write. Same
    // batch baseline as q_store_replace, but user 1 gets
    // setTs(update = true): new.combine_first(existing)
    // (timeserie_store.py:126-128) — purchase days overwrite view days
    // they overlap, view days with no purchase survive, purchase-only
    // days append. The facade's write-side merge is thereby oracle-pinned
    // end-to-end (not just via the Combine unit laws).
    "q_store_update" -> ((s, d) => {
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      val dir = java.nio.file.Files.createTempDirectory("graft_tstore_u_").toString
      val st = new graft.store.TimeseriesStore(s, dir,
        StructType(Seq(StructField("user_id", LongType))))
      val daily = events(s, d)
        .filter(col("user_id") < 3 && col("event_type").isin("view", "purchase"))
        .groupBy(col("user_id"), col("event_type"), date_trunc("day", col("ts")).as("ts"))
        .agg(avg(col("value")).as("avg_v"))
        .pipe(graft.StageCache.mat) // lazy: sequential consumers (see q_store_replace)
      st.setManyTs(daily.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), round(col("avg_v"), 6).as("value")))
      val upd = daily
        .filter(col("user_id") === 1 && col("event_type") === "purchase")
        .select(col("ts"), round(col("avg_v") * 3.0, 6).as("value"))
      st.setTs(Map("user_id" -> 1L), upd, update = true)
      st.getTs().orderBy("user_id", "ts")
    }),

    // §2.10 wire parity, oracle-pinned as lossless round-trips: the blob
    // codecs are bijective on dense series, so encode∘decode must be the
    // identity and the DuckDB twin is the plain selection. Any drift in
    // byte layout, ts unit conversion, or value ordering breaks the hash.
    // (NaN/null hole handling is pinned separately in FeatherBlobSpec /
    // Lz4BlobSpec against real pandas-generated fixture bytes.)

    // Feather-v2 whole-series blob (hostore.py:347-353): series -> Arrow
    // IPC file with LZ4-frame buffers -> series. Exercises the codec
    // distributed (one blob per user series, encoded on executors).
    "q_feather_roundtrip" -> ((s, d) => {
      import graft.functions.FeatherBlob._
      val pts = events(s, d).filter(col("user_id") < 8)
        .groupBy("user_id")
        .agg(sort_array(collect_list(struct(col("ts"), col("value")))).as("points"))
      pts.select(col("user_id"),
          feather_decode(feather_encode(concat(lit("prm_"), col("user_id")), col("points"))).as("d"))
        .select(col("user_id"), col("d.name").as("name"), explode(col("d.points")).as("p"))
        .select(col("user_id"), col("name"), col("p.ts").as("ts"),
          round(col("p.value"), 4).as("value"))
        .orderBy("user_id", "ts")
    }),

    // LZ4-frame chunk payload (chunk_timeserie_store.py:255-258): values
    // -> numpy-layout float64 bytes -> LZ4 frame -> values.
    "q_blob_roundtrip" -> ((s, d) => {
      import graft.functions.Lz4Blob._
      val pts = events(s, d).filter(col("user_id") < 8)
        .groupBy("user_id")
        .agg(sort_array(collect_list(struct(col("ts"), col("value")))).as("points"))
      pts.select(col("user_id"),
          explode(arrays_zip(
            col("points.ts").as("ts"),
            chunk_values(chunk_payload(col("points.value"))).as("value"))).as("p"))
        .select(col("user_id"), col("p.ts").as("ts"), round(col("p.value"), 4).as("value"))
        .orderBy("user_id", "ts")
    })
  )

  // ---- DuckDB oracle twins --------------------------------------------

  /** Shared CTE chain (no leading WITH) reproducing the MinHash-LSH
    * pipeline end-to-end in DuckDB SQL, ending at `sims(id_a, id_b,
    * sig_sim)` — used by both `q_minhash_lsh` (pairs) and
    * `q_dup_clusters` (recursive-CTE connected components over the same
    * pairs).
    *
    * The multiply-referenced CTEs are MATERIALIZED: DuckDB otherwise
    * re-evaluates a CTE per reference, so `sig` (referenced by all 8 band
    * branches) and everything downstream of the recursive closure was
    * re-running the whole minhash pipeline many times over — measured 44x
    * on q_dedup_best (19.2s -> 0.4s at sf0.01, identical rows). Purely an
    * evaluation-strategy hint; the relation is unchanged.
    *
    * `bok` mirrors [[graft.pipeline.Dedup.minhashLshPairs]]'s hot-band
    * cap (maxBandDf = 1000): band buckets above the cap generate no
    * candidates in EITHER engine.
    */
  private lazy val minhashSimsCtes: String = {
    import graft.functions.PortableHash.{P, permConsts, sqlHashMod}
    val consts = permConsts(32)
    val minCols = consts.zipWithIndex.map { case ((a, b), i) =>
      s"min((b*$a + $b) % $P) AS h$i" }.mkString(",\n                  ")
    val sigList = (0 until 32).map(i => s"h$i").mkString("[", ", ", "]")
    val bandRows = (0 until 8).map { bb =>
      s"SELECT doc_id, sig, $bb AS band, md5(array_to_string(sig[${bb * 4 + 1}:${bb * 4 + 4}], ',')) AS bh FROM sig"
    }.mkString("\n           UNION ALL ")
    s"""d0 AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
           FROM documents),
         d AS MATERIALIZED (
           SELECT doc_id,
                  list_distinct(list_transform(range(1, len(toks) - 1),
                    i -> array_to_string(toks[i:i+2], ' '))) AS sh
           FROM d0),
         ex AS (SELECT doc_id, unnest(sh) AS shingle FROM d WHERE len(sh) > 0),
         hx AS (SELECT doc_id, ${sqlHashMod("shingle")} AS b FROM ex),
         mh AS (SELECT doc_id,
                  $minCols
                FROM hx GROUP BY doc_id),
         sig AS MATERIALIZED (SELECT doc_id, $sigList AS sig FROM mh),
         bands AS MATERIALIZED (
           $bandRows),
         bok AS (
           SELECT band, bh FROM bands GROUP BY band, bh HAVING count(*) <= 1000),
         cand AS (
           SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sig AS sa, b.sig AS sb
           FROM bands a JOIN bok ON a.band = bok.band AND a.bh = bok.bh
                JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
         sims AS MATERIALIZED (
           SELECT id_a, id_b,
                  CAST(list_sum(list_transform(range(1, 33),
                    i -> CASE WHEN sa[i] = sb[i] THEN 1 ELSE 0 END)) AS DOUBLE) / 32 AS sig_sim
           FROM cand)"""
  }

  /** Hoisted hyperplane lists for the sign-LSH oracle twins: ONE
    * MATERIALIZED single-row CTE of pre-divided DOUBLE lists (`pl.pN`),
    * cross-joined onto the scan that projects. Inlining each plane as a
    * list literal inside the projection lambda makes DuckDB re-construct
    * the 256-int list PER LAMBDA INVOCATION — measured 250x slower
    * (7.8s -> 0.03s on q_lsh_topk at sf0.01, identical rows). The
    * per-element arithmetic is unchanged (CAST(x AS DOUBLE) / 1000001.0
    * precomputed once per plane element, same sequential list_sum), so
    * the projections are bit-identical.
    */
  private def planesCte(pls: Array[Array[Long]]): String =
    pls.zipWithIndex.map { case (ks, p) =>
      s"list_transform(${ks.mkString("[", ", ", "]")}, x -> CAST(x AS DOUBLE) / 1000001.0) AS p$p"
    }.mkString("pl AS MATERIALIZED (SELECT ", ",\n             ", ")")

  /** The Jacobi basis the last q_pca_topk evaluation computed, published
    * for [[oracleSql]] — Verify runs every query BEFORE dumping the
    * oracle map, so the dump carries the basis for exactly the dataset
    * the results came from. None (e.g. a filtered Verify run that skips
    * q_pca_topk) degrades to the old rows-only check by omitting the
    * entry.
    */
  @volatile private var lastPcaBasis: Option[Array[Array[Double]]] = None

  /** q_pca_topk's DuckDB twin, built around the published basis: the 48
    * eigenvectors become literal list rows, projection is the same
    * left-to-right Σ x_i·b_ki fold, and the reduced-space exact top-k
    * mirrors q_cosine_topk's CTE shape. Only the eigen SOLVE is trusted
    * (PipelineSpec laws + the q_embed_cov-pinned covariance); every
    * data-touching stage downstream hash-checks.
    */
  private def pcaTopkOracle: Map[String, String] = lastPcaBasis match {
    case None => Map.empty
    case Some(basis) =>
      val rows = basis.zipWithIndex.map { case (b, k) =>
        b.mkString(s"($k, [", ", ", "])")
      }.mkString(",\n           ")
      Map("q_pca_topk" ->
        s"""WITH basis(comp, bv) AS (VALUES
           $rows),
         bl AS (SELECT list(bv ORDER BY comp) AS bs FROM basis),
         p AS MATERIALIZED (
           SELECT vec_id,
                  list_transform(bl.bs, bv ->
                    list_sum(list_transform(range(1, len(embedding) + 1),
                      i -> CAST(embedding[i] AS DOUBLE) * bv[i]))) AS pv
           FROM embeddings CROSS JOIN bl),
         q AS (SELECT vec_id AS query_id, pv AS qv FROM p WHERE vec_id < 10),
         s AS (
           SELECT query_id, vec_id,
             list_sum(list_transform(range(1, len(qv) + 1),
               i -> qv[i] * pv[i]))
             / (sqrt(list_sum(list_transform(range(1, len(qv) + 1),
                  i -> qv[i] * qv[i])))
              * sqrt(list_sum(list_transform(range(1, len(pv) + 1),
                  i -> pv[i] * pv[i])))) AS cos
           FROM p CROSS JOIN q WHERE vec_id <> query_id),
         r AS (
           SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
           FROM s)
         SELECT query_id, vec_id, round(cos, 6) AS cos_sim, CAST(rank AS BIGINT) AS rank
         FROM r WHERE rank <= 5 ORDER BY query_id, rank""")
  }

  def oracleSql: Map[String, String] = pcaTopkOracle ++ Map(
    "q_scan_filter" ->
      """SELECT event_id, ts, value FROM events
         WHERE user_id = 7 AND event_type = 'view'
           AND ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-20'
         ORDER BY event_id""",

    "q_lookup_filter" ->
      """SELECT user_id, count(*) AS n, round(sum(value), 4) AS sum_value
         FROM events
         WHERE user_id IN (1, 5, 9, 23)
           AND ts BETWEEN TIMESTAMP '2024-01-10' AND TIMESTAMP '2024-02-20'
           AND event_type LIKE 'vi%' AND value < 50.0
         GROUP BY 1 ORDER BY 1""",

    "q_chunk_prune" ->
      """SELECT CAST(year(ts)*12 + month(ts) - 1 AS INTEGER) AS chunk_index,
                count(*) AS n, round(sum(value), 4) AS sum_value
         FROM events
         WHERE year(ts)*12 + month(ts) - 1 BETWEEN 24288 AND 24289
         GROUP BY 1 ORDER BY 1""",

    "q_grid_reindex" ->
      """WITH spine AS (
           SELECT unnest(generate_series(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-08', INTERVAL 1 HOUR)) AS ts),
         users AS (SELECT DISTINCT user_id FROM events WHERE user_id < 10),
         vals AS (
           SELECT user_id, date_trunc('hour', ts) AS ts, round(avg(value), 4) AS value_avg
           FROM events WHERE user_id < 10 GROUP BY 1, 2)
         SELECT u.user_id, s.ts, v.value_avg
         FROM users u CROSS JOIN spine s
         LEFT JOIN vals v ON v.user_id = u.user_id AND v.ts = s.ts
         ORDER BY u.user_id, s.ts""",

    "q_combine_first" ->
      """WITH uniq AS (
           SELECT l_orderkey, l_shipdate AS ts, l_linenumber,
                  max(CASE WHEN l_discount < 0.02 THEN NULL ELSE l_quantity END) AS val
           FROM lineitem GROUP BY 1, 2, 3)
         SELECT l_orderkey, ts,
                arg_min(val, l_linenumber) FILTER (WHERE val IS NOT NULL) AS value
         FROM uniq GROUP BY 1, 2""",

    "q_version_combine" ->
      """WITH uniq AS (
           SELECT l_orderkey, l_linenumber, l_shipdate AS ts,
                  max(CASE WHEN l_tax > 0.06 THEN NULL ELSE l_extendedprice END) AS val
           FROM lineitem GROUP BY 1, 2, 3)
         SELECT l_orderkey, ts,
                arg_max(val, l_linenumber) FILTER (WHERE val IS NOT NULL) AS value
         FROM uniq GROUP BY 1, 2""",

    "q_version_select" ->
      """WITH uniq AS (
           SELECT l_orderkey, l_linenumber, l_shipdate AS ts,
                  max(CASE WHEN l_tax > 0.06 THEN NULL ELSE l_extendedprice END) AS val
           FROM lineitem WHERE l_linenumber >= 2 GROUP BY 1, 2, 3)
         SELECT l_orderkey, ts,
                arg_min(val, l_linenumber) FILTER (WHERE val IS NOT NULL) AS value
         FROM uniq GROUP BY 1, 2""",

    "q_update_merge" ->
      """WITH newd AS (
           SELECT l_orderkey, l_linenumber, l_shipdate AS ts, max(l_quantity*2) AS v, 0 AS p
           FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-01' GROUP BY 1, 2, 3),
         oldd AS (
           SELECT l_orderkey, l_linenumber, l_shipdate AS ts, max(l_quantity) AS v, 1 AS p
           FROM lineitem GROUP BY 1, 2, 3),
         u AS (SELECT * FROM newd UNION ALL SELECT * FROM oldd)
         SELECT l_orderkey, l_linenumber, ts,
                arg_min(v, p) FILTER (WHERE v IS NOT NULL) AS value
         FROM u GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",

    "q_islands" ->
      """WITH f AS (
           SELECT user_id, ts, event_id, event_type AS value,
                  CASE WHEN event_type IS NOT DISTINCT FROM
                            lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       THEN 0 ELSE 1 END AS chg
           FROM events),
         g AS (
           SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS grp
           FROM f)
         SELECT user_id, min(ts) AS run_start, max(ts) AS run_end,
                min(value) AS value, count(*) AS run_len
         FROM g GROUP BY user_id, grp ORDER BY user_id, run_start""",

    // identical semantics to q_islands — the split form must reproduce the
    // whole-series window's islands exactly
    "q_islands_split" ->
      """WITH f AS (
           SELECT user_id, ts, event_id, event_type AS value,
                  CASE WHEN event_type IS NOT DISTINCT FROM
                            lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       THEN 0 ELSE 1 END AS chg
           FROM events),
         g AS (
           SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS grp
           FROM f)
         SELECT user_id, min(ts) AS run_start, max(ts) AS run_end,
                min(value) AS value, count(*) AS run_len
         FROM g GROUP BY user_id, grp ORDER BY user_id, run_start""",

    "q_holes" ->
      """WITH spine AS (
           SELECT unnest(generate_series(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-30', INTERVAL 1 DAY)) AS ts),
         users AS (SELECT range AS user_id FROM range(20)),
         vals AS (
           SELECT user_id, date_trunc('day', ts) AS ts, CAST(count(*) AS DOUBLE) AS v
           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
         dense AS (
           SELECT u.user_id, s.ts, v.v
           FROM users u CROSS JOIN spine s
           LEFT JOIN vals v ON v.user_id = u.user_id AND v.ts = s.ts),
         f AS (
           SELECT *, CASE WHEN (v IS NULL) IS NOT DISTINCT FROM
                               lag(v IS NULL) OVER (PARTITION BY user_id ORDER BY ts)
                          THEN 0 ELSE 1 END AS chg
           FROM dense),
         g AS (
           SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS grp
           FROM f)
         SELECT user_id, min(ts) AS hole_start, max(ts) AS hole_end
         FROM g WHERE v IS NULL GROUP BY user_id, grp ORDER BY user_id, hole_start""",

    "q_holes_mindelta" ->
      """WITH spine AS (
           SELECT unnest(generate_series(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-30', INTERVAL 1 DAY)) AS ts),
         users AS (SELECT range AS user_id FROM range(20)),
         vals AS (
           SELECT user_id, date_trunc('day', ts) AS ts, CAST(count(*) AS DOUBLE) AS v
           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
         dense AS (
           SELECT u.user_id, s.ts, v.v
           FROM users u CROSS JOIN spine s
           LEFT JOIN vals v ON v.user_id = u.user_id AND v.ts = s.ts),
         f AS (
           SELECT *, CASE WHEN (v IS NULL) IS NOT DISTINCT FROM
                               lag(v IS NULL) OVER (PARTITION BY user_id ORDER BY ts)
                          THEN 0 ELSE 1 END AS chg
           FROM dense),
         g AS (
           SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS grp
           FROM f),
         h AS (
           SELECT user_id, min(ts) AS hole_start, max(ts) AS hole_end
           FROM g WHERE v IS NULL GROUP BY user_id, grp)
         SELECT user_id, hole_start, hole_end FROM h
         WHERE (hole_start = TIMESTAMP '2024-01-01' AND hole_end = TIMESTAMP '2024-01-30')
            OR (hole_start <> TIMESTAMP '2024-01-01' AND hole_end <> TIMESTAMP '2024-01-30')
            OR (date_diff('second', hole_start, hole_end) + 86400 >= 259200)
         ORDER BY user_id, hole_start""",

    "q_interval_union" ->
      """WITH iv AS (
           SELECT o_custkey, o_orderdate AS s, o_orderdate + INTERVAL 30 DAY AS e FROM orders),
         f AS (
           SELECT *, max(e) OVER (PARTITION BY o_custkey ORDER BY s, e
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
           FROM iv),
         g AS (SELECT *, CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS nw FROM f),
         h AS (
           SELECT *, sum(nw) OVER (PARTITION BY o_custkey ORDER BY s, e
                                   ROWS UNBOUNDED PRECEDING) AS isl
           FROM g)
         SELECT o_custkey, min(s) AS merged_start, max(e) AS merged_end, count(*) AS n_merged
         FROM h GROUP BY o_custkey, isl ORDER BY o_custkey, merged_start""",

    "q_find_groups" ->
      """WITH spine AS (
           SELECT unnest(generate_series(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-15', INTERVAL 1 DAY)) AS ts),
         users AS (SELECT range AS user_id FROM range(30)),
         vals AS (
           SELECT user_id, date_trunc('day', ts) AS ts, CAST(count(*) AS DOUBLE) AS v
           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
         dense AS (
           SELECT u.user_id, s.ts, v.v
           FROM users u CROSS JOIN spine s
           LEFT JOIN vals v ON v.user_id = u.user_id AND v.ts = s.ts),
         f AS (
           SELECT *, CASE WHEN (v IS NULL) IS NOT DISTINCT FROM
                               lag(v IS NULL) OVER (PARTITION BY user_id ORDER BY ts)
                          THEN 0 ELSE 1 END AS chg
           FROM dense),
         g AS (
           SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS grp
           FROM f),
         holes AS (
           SELECT user_id, min(ts) AS hole_start, max(ts) AS hole_end
           FROM g WHERE v IS NULL GROUP BY user_id, grp),
         sigs AS (
           SELECT u.user_id,
                  coalesce(string_agg(CAST(h.hole_start AS VARCHAR) || '~' || CAST(h.hole_end AS VARCHAR),
                                      ';' ORDER BY h.hole_start), '') AS missing_sig
           FROM users u LEFT JOIN holes h USING (user_id) GROUP BY u.user_id)
         SELECT missing_sig,
                string_agg(CAST(user_id AS VARCHAR), ',' ORDER BY user_id) AS member_keys,
                count(*) AS n_keys
         FROM sigs GROUP BY 1 ORDER BY 1""",

    "q_embed_dedup" ->
      """WITH a AS (SELECT vec_id AS id_a, embedding AS va, label FROM embeddings),
         b AS (SELECT vec_id AS id_b, embedding AS vb, label FROM embeddings),
         p AS (
           SELECT id_a, id_b,
             list_sum(list_transform(range(1, len(va) + 1),
               i -> CAST(va[i] AS DOUBLE) * CAST(vb[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(range(1, len(va) + 1),
                  i -> CAST(va[i] AS DOUBLE) * CAST(va[i] AS DOUBLE))))
              * sqrt(list_sum(list_transform(range(1, len(vb) + 1),
                  i -> CAST(vb[i] AS DOUBLE) * CAST(vb[i] AS DOUBLE))))) AS cos
           FROM a JOIN b USING (label) WHERE id_a < id_b)
         SELECT id_a, id_b, round(cos, 6) AS cos_sim
         FROM p WHERE cos >= 0.35 ORDER BY id_a, id_b""",

    "q_trim_bounds" ->
      """WITH e AS (
           SELECT user_id, event_id, ts,
                  CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value
           FROM events),
         b AS (
           SELECT *,
                  min(CASE WHEN value IS NOT NULL THEN ts END) OVER (PARTITION BY user_id) AS lo,
                  max(CASE WHEN value IS NOT NULL THEN ts END) OVER (PARTITION BY user_id) AS hi
           FROM e)
         SELECT user_id, event_id, ts, value FROM b
         WHERE ts >= lo AND ts <= hi ORDER BY user_id, event_id""",

    "q_delay_slice" ->
      """WITH m AS (
           SELECT *, min(ts) OVER (PARTITION BY user_id) AS min_ts FROM events)
         SELECT user_id, count(*) AS n, round(sum(value), 4) AS sum_value
         FROM m WHERE ts >= min_ts + INTERVAL 72 HOUR
         GROUP BY user_id ORDER BY user_id""",

    "q_normalize" ->
      """WITH b AS (
           SELECT event_id, user_id, value,
                  min(value) OVER (PARTITION BY user_id) AS lo,
                  max(value) OVER (PARTITION BY user_id) AS hi
           FROM events)
         SELECT event_id, user_id,
                round(CASE WHEN hi > lo THEN (value - lo) / (hi - lo) END, 6) AS value_norm
         FROM b ORDER BY event_id""",

    "q_min_freq" ->
      """WITH s AS (
           SELECT user_id,
                  epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS step
           FROM events)
         SELECT user_id, min(step) AS min_step_us FROM s GROUP BY 1 ORDER BY 1""",

    // same sequential fold as Spark's aggregate(): acc starts at the first
    // (ts-ordered, value tie-break) value, then acc*0.7 + x*0.3 per step
    "q_ewma" ->
      """WITH s AS (
           SELECT user_id, list(CAST(value AS DOUBLE) ORDER BY ts, value) AS vs
           FROM events WHERE user_id < 40 GROUP BY 1)
         SELECT user_id, CAST(len(vs) AS BIGINT) AS n,
                round(CAST(list_reduce(vs, (acc, x) -> acc * 0.7 + x * 0.3) AS DOUBLE), 6) AS ewma
         FROM s ORDER BY user_id""",

    "q_winsorize" ->
      """WITH b AS (
           SELECT user_id,
                  quantile_cont(value, 0.05) AS lo, quantile_cont(value, 0.95) AS hi
           FROM events WHERE user_id < 10 GROUP BY 1)
         SELECT e.event_id, e.user_id,
                round(least(greatest(e.value, b.lo), b.hi), 6) AS value_clipped
         FROM events e JOIN b USING (user_id)
         WHERE e.user_id < 10 ORDER BY e.event_id""",

    "q_histogram" ->
      """WITH binned AS (
           SELECT user_id,
                  CAST(least(greatest(floor(value / 5.0), 0), 19) AS BIGINT) AS bin
           FROM events WHERE user_id < 10)
         SELECT user_id, bin, round(bin * 5.0, 6) AS bin_lo,
                CAST(count(*) AS BIGINT) AS n
         FROM binned GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_mad_outliers" ->
      """WITH med AS (
           SELECT user_id, quantile_cont(value, 0.5) AS m
           FROM events WHERE user_id < 20 GROUP BY 1),
         mad AS (
           SELECT e.user_id, quantile_cont(abs(e.value - med.m), 0.5) AS d,
                  any_value(med.m) AS m
           FROM events e JOIN med USING (user_id)
           WHERE e.user_id < 20 GROUP BY e.user_id)
         SELECT e.event_id, e.user_id, round(e.value, 6) AS value
         FROM events e JOIN mad USING (user_id)
         WHERE e.user_id < 20
           AND abs(e.value - mad.m) > 3.5 * 1.4826 * mad.d
         ORDER BY e.event_id""",

    "q_ohlc" ->
      """WITH b AS (
           SELECT user_id, date_trunc('hour', ts) AS period, ts, value
           FROM events WHERE user_id < 50 AND value IS NOT NULL),
         g AS (
           SELECT user_id, period,
                  list(value ORDER BY ts, value) AS vs,
                  max(value) AS high, min(value) AS low,
                  count(*) AS n
           FROM b GROUP BY 1, 2)
         SELECT user_id, period,
                round(vs[1], 6) AS open, round(high, 6) AS high,
                round(low, 6) AS low, round(vs[len(vs)], 6) AS close,
                CAST(n AS BIGINT) AS n
         FROM g ORDER BY user_id, period""",

    "q_counter_delta" ->
      """WITH w AS (
           SELECT user_id, event_id, ts, value,
                  lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events WHERE user_id < 20)
         SELECT user_id, event_id, ts, round(value, 6) AS value,
                round(CASE WHEN prev IS NULL THEN NULL
                           WHEN value < prev THEN value
                           ELSE value - prev END, 6) AS delta,
                (prev IS NOT NULL AND value < prev) AS is_reset
         FROM w ORDER BY user_id, event_id""",

    // CUSUM: HUGEINT window sums mirror Spark's decimal(38,0) — every
    // drift term is n·x − Σx − n·slack in integer micro-units; the one
    // float division per row comes last, in the same fixed op order
    "q_cusum" ->
      """WITH b AS (
           SELECT user_id, ts, value,
                  CAST(round(value * 1e6) AS HUGEINT) AS xq
           FROM events WHERE user_id < 20),
         s1 AS (
           SELECT user_id, ts, value, xq,
                  count(*) OVER (PARTITION BY user_id) AS n,
                  sum(xq) OVER (PARTITION BY user_id) AS sq
           FROM b),
         s2 AS (
           SELECT *, xq * n - sq - 25000000 * n AS ehi,
                     sq - xq * n - 25000000 * n AS elo
           FROM s1),
         s3 AS (
           SELECT *, sum(ehi) OVER w AS phi, sum(elo) OVER w AS plo
           FROM s2
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, value ROWS UNBOUNDED PRECEDING)),
         s4 AS (
           SELECT *, least(min(phi) OVER w, 0) AS mhi, least(min(plo) OVER w, 0) AS mlo
           FROM s3
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, value ROWS UNBOUNDED PRECEDING))
         SELECT user_id, ts, value,
                CAST(((phi - mhi) * 2 + n) // (n * 2) AS DOUBLE) / 1e6 AS cusum_hi,
                CAST(((plo - mlo) * 2 + n) // (n * 2) AS DOUBLE) / 1e6 AS cusum_lo,
                (phi - mhi > 200000000 * n OR plo - mlo > 200000000 * n) AS alarm
         FROM s4 ORDER BY user_id, ts, value""",

    "q_deseasonalize" ->
      """WITH prof AS (
           SELECT user_id, dayofweek(ts) AS dow, hour(ts) AS hod,
                  avg(value) AS profile_mean
           FROM events WHERE user_id < 5 GROUP BY 1, 2, 3)
         SELECT e.event_id, e.user_id,
                round(p.profile_mean, 6) AS profile_mean,
                round(e.value - p.profile_mean, 6) AS residual
         FROM events e
         JOIN prof p ON p.user_id = e.user_id
           AND p.dow = dayofweek(e.ts) AND p.hod = hour(e.ts)
         WHERE e.user_id < 5 ORDER BY e.event_id""",

    "q_max_horodate" ->
      """SELECT r.user_id, m.max_horodate
         FROM (SELECT range AS user_id FROM range(160)) r
         LEFT JOIN (SELECT user_id, max(ts) AS max_horodate FROM events
                    WHERE event_type <> 'error' GROUP BY 1) m USING (user_id)
         ORDER BY r.user_id""",

    "q_last_updated" ->
      """SELECT r.user_id, coalesce(m.mx, TIMESTAMP '2000-01-01') AS last_updated
         FROM (SELECT range AS user_id FROM range(20)) r
         LEFT JOIN (SELECT user_id, max(ts) AS mx FROM events
                    WHERE event_type = 'signup' GROUP BY 1) m USING (user_id)
         ORDER BY r.user_id""",

    "q_counts" ->
      """SELECT event_type, count(*) AS n_events,
                count(DISTINCT user_id) AS n_users, max(event_id) AS max_event_id
         FROM events GROUP BY 1 ORDER BY 1""",

    "q_ffill" ->
      """WITH spine AS (
           SELECT unnest(generate_series(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-07 23:00:00', INTERVAL 1 HOUR)) AS ts),
         vals AS (
           SELECT user_id, date_trunc('hour', ts) AS ts, round(avg(value), 4) AS value_avg
           FROM events
           WHERE user_id < 5 AND ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
           GROUP BY 1, 2),
         users AS (SELECT DISTINCT user_id FROM vals),
         dense AS (
           SELECT u.user_id, s.ts, v.value_avg
           FROM users u CROSS JOIN spine s
           LEFT JOIN vals v ON v.user_id = u.user_id AND v.ts = s.ts)
         SELECT user_id, ts,
                last_value(value_avg IGNORE NULLS) OVER (
                  PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS value_ffill
         FROM dense ORDER BY user_id, ts""",

    "q_interpolate" ->
      """WITH spine AS (
           SELECT unnest(generate_series(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-07 23:00:00', INTERVAL 1 HOUR)) AS ts),
         vals AS (
           SELECT user_id, date_trunc('hour', ts) AS ts, round(avg(value), 4) AS value_avg
           FROM events
           WHERE user_id < 5 AND ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
           GROUP BY 1, 2),
         users AS (SELECT DISTINCT user_id FROM vals),
         dense AS (
           SELECT u.user_id, s.ts, v.value_avg
           FROM users u CROSS JOIN spine s
           LEFT JOIN vals v ON v.user_id = u.user_id AND v.ts = s.ts),
         brk AS (
           SELECT user_id, ts, value_avg,
                  last_value(value_avg IGNORE NULLS) OVER (
                    PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS pv,
                  last_value(CASE WHEN value_avg IS NOT NULL THEN epoch_us(ts) END IGNORE NULLS) OVER (
                    PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS pt,
                  first_value(value_avg IGNORE NULLS) OVER (
                    PARTITION BY user_id ORDER BY ts ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
                  first_value(CASE WHEN value_avg IS NOT NULL THEN epoch_us(ts) END IGNORE NULLS) OVER (
                    PARTITION BY user_id ORDER BY ts ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
           FROM dense)
         SELECT user_id, ts,
                round(CASE WHEN value_avg IS NOT NULL THEN value_avg
                      WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                        pv + (nv - pv) * (CAST(epoch_us(ts) - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE))
                      END, 6) AS value_interp
         FROM brk ORDER BY user_id, ts""",

    "q_rolling_median" ->
      """SELECT event_id, user_id,
                round(quantile_cont(value, 0.5) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 23 PRECEDING AND CURRENT ROW), 6) AS roll_med
         FROM events WHERE user_id < 5 ORDER BY event_id""",

    "q_peak_offpeak" ->
      """WITH t AS (
           SELECT user_id, value,
                  dayofweek(ts) NOT IN (0, 6)
                    AND hour(ts) >= 8 AND hour(ts) < 20 AS is_peak
           FROM events WHERE user_id < 40)
         SELECT user_id, is_peak, round(sum(value), 4) AS energy,
                CAST(count(*) AS BIGINT) AS n
         FROM t GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_load_factor" ->
      """SELECT user_id, date_trunc('day', ts) AS day,
                round(CASE WHEN max(value) > 0 THEN avg(value) / max(value) END, 6) AS load_factor
         FROM events WHERE user_id < 10
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_autocorr" ->
      """WITH lagged AS (
           SELECT user_id, value,
                  lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pv
           FROM events WHERE user_id < 40)
         SELECT user_id,
                CAST(count(CASE WHEN value IS NOT NULL AND pv IS NOT NULL THEN 1 END) AS BIGINT) AS n_pairs,
                round(corr(value, pv), 6) AS acf
         FROM lagged GROUP BY 1 ORDER BY 1""",

    "q_upsample" ->
      """WITH spine AS (
           SELECT unnest(generate_series(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-07 23:00:00', INTERVAL 1 HOUR)) AS ts),
         users AS (SELECT range AS user_id FROM range(3)),
         ref AS (SELECT date_trunc('hour', ts) AS ts, round(sum(value), 4) AS r FROM events GROUP BY 1),
         feat AS (
           SELECT user_id, date_trunc('day', ts) AS day, round(sum(value), 4) AS f
           FROM events WHERE user_id < 3 GROUP BY 1, 2),
         dense AS (
           SELECT u.user_id, s.ts, date_trunc('day', s.ts) AS day,
                  coalesce(ref.r, 0) AS ref, feat.f AS feat
           FROM users u CROSS JOIN spine s
           LEFT JOIN ref ON ref.ts = s.ts
           LEFT JOIN feat ON feat.user_id = u.user_id AND feat.day = date_trunc('day', s.ts)),
         g AS (
           SELECT user_id, day, sum(ref) AS sum_ref, count(ref) AS cnt_ref,
                  arg_min(ref, ts) AS first_ref, min(ts) AS min_ts
           FROM dense GROUP BY 1, 2),
         g2 AS (
           SELECT *, lead(first_ref) OVER (PARTITION BY user_id ORDER BY min_ts) AS next_ref
           FROM g),
         m AS (
           SELECT d.*,
                  CASE WHEN g2.cnt_ref + CASE WHEN g2.next_ref IS NOT NULL THEN 1 ELSE 0 END = 0
                       THEN NULL
                       ELSE (coalesce(g2.sum_ref, 0) + coalesce(g2.next_ref, 0)) /
                            (g2.cnt_ref + CASE WHEN g2.next_ref IS NOT NULL THEN 1 ELSE 0 END)
                  END AS mr
           FROM dense d JOIN g2 ON g2.user_id = d.user_id AND g2.day = d.day)
         SELECT user_id, ts,
                round(CASE WHEN mr = 0 THEN feat ELSE feat*ref/mr END, 4) AS value_up
         FROM m ORDER BY user_id, ts""",

    "q_sync_updates" ->
      """SELECT user_id, date_trunc('day', ts) AS chunk_day, max(ts) AS updated_at
         FROM events GROUP BY 1, 2
         HAVING max(ts) >= TIMESTAMP '2024-01-15'
         ORDER BY updated_at, user_id, chunk_day
         LIMIT 100 OFFSET 50""",

    "q_absent_keys" ->
      """SELECT range AS user_id FROM range(200)
         EXCEPT SELECT DISTINCT user_id FROM events
         ORDER BY user_id""",

    "q_tombstone_filter" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_value
         FROM events WHERE event_id % 7 <> 0
         GROUP BY 1 ORDER BY 1""",

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
                count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
         FROM lineitem
         GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",

    "q_sessionize" ->
      """WITH g AS (
           SELECT user_id, ts, value, event_id,
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events),
         f AS (
           SELECT *, CASE WHEN prev IS NULL
                            OR epoch_us(ts) - epoch_us(prev) > 1800 * 1000000 THEN 1 ELSE 0 END AS nw
           FROM g),
         h AS (
           SELECT *, sum(nw) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_id
           FROM f)
         SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                min(ts) AS session_start, max(ts) AS session_end,
                count(*) AS n_events, round(sum(value), 4) AS sum_value
         FROM h GROUP BY 1, 2 ORDER BY user_id, session_start""",

    "q_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
                round(sum(l_quantity), 2) AS sum_qty,
                round(sum(l_extendedprice), 2) AS sum_base_price,
                round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                round(avg(l_quantity), 4) AS avg_qty,
                round(avg(l_extendedprice), 4) AS avg_price,
                round(avg(l_discount), 4) AS avg_disc,
                count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_revenue_join" ->
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
         GROUP BY 1 ORDER BY 1""",

    "q_top_customers" ->
      """SELECT o_custkey, round(rev_raw, 2) AS revenue
         FROM (SELECT o_custkey, sum(o_totalprice) AS rev_raw FROM orders GROUP BY 1)
         ORDER BY rev_raw DESC, o_custkey LIMIT 10""",

    "q_dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_docs
         FROM documents GROUP BY 1 ORDER BY 1""",

    "q_dedup_norm" ->
      """SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS content_hash,
                min(doc_id) AS keep_id, count(*) AS n_docs
         FROM documents GROUP BY 1 ORDER BY 1""",

    "q_dedup_drop" ->
      """SELECT doc_id, content_hash FROM (
           SELECT doc_id, md5(text) AS content_hash,
                  row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
           FROM documents)
         WHERE rn > 1 ORDER BY doc_id""",

    "q_ngram_jaccard" ->
      """WITH d0 AS (
           SELECT doc_id, lang, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
           FROM documents),
         d AS (
           SELECT doc_id, lang,
                  list_distinct(list_transform(range(1, len(toks) - 1),
                    i -> array_to_string(toks[i:i+2], ' '))) AS sh
           FROM d0),
         dd AS (SELECT doc_id, lang, sh, len(sh) AS n FROM d WHERE len(sh) > 0),
         -- ex is BOTH sides of the self-join: materialize or DuckDB runs
         -- the shingle extraction twice (13.7s -> 3.6s at sf0.1)
         ex AS MATERIALIZED (SELECT doc_id, lang, n, unnest(sh) AS shingle FROM dd),
         p AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb, count(*) AS n_shared
           FROM ex a JOIN ex b
             ON a.shingle = b.shingle AND a.lang = b.lang AND a.doc_id < b.doc_id
           GROUP BY 1, 2, 3, 4)
         SELECT id_a, id_b,
                round(CAST(n_shared AS DOUBLE) / (na + nb - n_shared), 6) AS jaccard
         FROM p WHERE CAST(n_shared AS DOUBLE) / (na + nb - n_shared) >= 0.5
         ORDER BY id_a, id_b""",

    "q_lang_scores" -> {
      val langs = TextAnalysis.StopwordsByLang.toSeq.sortBy(_._1)
      val cols = langs.map { case (lang, stops) =>
        val parts = stops.map(w =>
          s"len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), w -> w = '$w'))").mkString(" + ")
        s"CAST($parts AS BIGINT) AS score_$lang"
      }.mkString(",\n                ")
      s"""SELECT doc_id, lang,
                $cols
         FROM documents ORDER BY doc_id"""
    },

    "q_contamination" -> {
      import graft.functions.PortableHash.sqlHashMod
      s"""WITH d0 AS (
           SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
           FROM documents),
         d AS (
           SELECT doc_id,
                  list_distinct(list_transform(range(1, len(toks) - 1),
                    i -> array_to_string(toks[i:i+2], ' '))) AS sh
           FROM d0),
         ex AS (SELECT doc_id, unnest(sh) AS shingle FROM d WHERE len(sh) > 0),
         -- hx feeds BOTH join sides: materialize or DuckDB re-runs the
         -- whole shingle+hash pipeline twice (7.1s -> 3.5s at sf0.1)
         hx AS MATERIALIZED (SELECT doc_id, ${sqlHashMod("shingle")} AS h FROM ex),
         ev AS (SELECT DISTINCT h FROM hx WHERE doc_id % 97 = 0),
         co AS (SELECT doc_id, h FROM hx WHERE doc_id % 97 <> 0)
         SELECT doc_id, count(*) AS n_shared
         FROM co JOIN ev USING (h)
         GROUP BY doc_id HAVING count(*) >= 3 ORDER BY doc_id"""
    },

    "q_repetition" -> {
      import graft.functions.PortableHash.sqlHashMod
      s"""WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
         g AS (SELECT doc_id, unnest(list_transform(
                 range(1, len(ws) - 1), i -> array_to_string(ws[i:i+2], ' '))) AS gram
               FROM w),
         h AS (SELECT doc_id, ${sqlHashMod("gram")} AS hh FROM g),
         c AS (SELECT doc_id, hh, count(*) AS c FROM h GROUP BY 1, 2)
         SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_ngrams,
                CAST(max(c) AS BIGINT) AS top_ngram_count,
                round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS rep_ratio
         FROM c GROUP BY doc_id ORDER BY doc_id"""
    },

    // Gopher repetition: per n, gram counts + char lengths; top = lexi-max
    // (count, chars) like Spark's max(struct); dup = Σ count·chars at c>=2
    "q_gopher_rep" -> {
      def gramsCte(n: Int, tag: String): String =
        s"""g$tag AS (
           SELECT doc_id, unnest(list_transform(
             range(1, len(ws) - ${n - 2}), i -> array_to_string(ws[i:i+${n - 1}], ' '))) AS g
           FROM w WHERE len(ws) >= $n),
         c$tag AS (
           SELECT doc_id, g, count(*) AS c,
                  CAST(length(replace(g, ' ', '')) AS BIGINT) AS ch
           FROM g$tag GROUP BY 1, 2)"""
      def topCte(tag: String): String =
        s"""m$tag AS (SELECT doc_id, max(c) AS mc FROM c$tag GROUP BY 1),
         t$tag AS (
           SELECT c.doc_id, any_value(m.mc) * max(c.ch) AS chars
           FROM c$tag c JOIN m$tag m ON c.doc_id = m.doc_id AND c.c = m.mc
           GROUP BY c.doc_id)"""
      s"""WITH w AS (
           SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
         tot AS (
           SELECT doc_id,
                  CAST(coalesce(list_sum(list_transform(ws, x -> length(x))), 0) AS BIGINT) AS total_chars
           FROM w),
         ${gramsCte(2, "2")},
         ${topCte("2")},
         ${gramsCte(3, "3")},
         ${topCte("3")},
         ${gramsCte(5, "5")},
         d5 AS (
           SELECT doc_id, sum(c * ch) AS chars FROM c5 WHERE c >= 2 GROUP BY 1)
         SELECT tot.doc_id, tot.total_chars,
                round(CASE WHEN tot.total_chars = 0 THEN 0.0
                      ELSE CAST(coalesce(t2.chars, 0) AS DOUBLE) / tot.total_chars END, 6) AS top_2gram_char_frac,
                round(CASE WHEN tot.total_chars = 0 THEN 0.0
                      ELSE CAST(coalesce(t3.chars, 0) AS DOUBLE) / tot.total_chars END, 6) AS top_3gram_char_frac,
                round(CASE WHEN tot.total_chars = 0 THEN 0.0
                      ELSE CAST(coalesce(d5.chars, 0) AS DOUBLE) / tot.total_chars END, 6) AS dup_5gram_char_frac
         FROM tot
         LEFT JOIN t2 ON t2.doc_id = tot.doc_id
         LEFT JOIN t3 ON t3.doc_id = tot.doc_id
         LEFT JOIN d5 ON d5.doc_id = tot.doc_id
         ORDER BY tot.doc_id"""
    },

    "q_c4_filters" ->
      """WITH t AS (
           SELECT doc_id, regexp_replace(text, ' (a|the) ', chr(10), 'g') AS text
           FROM documents),
         a AS (
           SELECT doc_id,
                  list_filter(list_transform(string_split(coalesce(text, ''), chr(10)),
                                x -> trim(x)), x -> x <> '') AS lines,
                  contains(lower(coalesce(text, '')), 'lorem ipsum') AS has_lorem,
                  contains(coalesce(text, ''), '{') AS has_brace
           FROM t),
         b AS (
           SELECT doc_id, lines, has_lorem, has_brace,
                  list_filter(lines, l ->
                    regexp_matches(l, '[.!?"]$')
                    AND len(list_filter(string_split(l, ' '), w -> w <> '')) >= 5
                    AND NOT contains(lower(l), 'javascript')) AS kept
           FROM a)
         SELECT doc_id,
                CAST(len(lines) AS BIGINT) AS total_lines,
                CAST(len(kept) AS BIGINT) AS kept_lines,
                has_lorem, has_brace,
                (len(kept) >= 3 AND NOT has_lorem AND NOT has_brace) AS keep_doc,
                coalesce(array_to_string(kept, chr(10)), '') AS kept_text
         FROM b ORDER BY doc_id""",

    // the trained classifier, replayed: the full 12 unrolled GD
    // iterations with the identical exact-integer arithmetic (HUGEINT
    // gradient sums, micro-unit weights, 6-dp sigmoids) — w0=0 makes
    // iteration 1's probabilities exactly 0.5
    "q_logreg_train" ->
      s"""WITH ${logregCtes(iters = 12, lr = 3.0)}
         SELECT r.range AS bucket,
                CAST(coalesce(wf.w, 0) AS BIGINT) AS w_micro,
                CAST(coalesce(wf.w, 0) AS DOUBLE) / 1e6 AS weight
         FROM range(257) r LEFT JOIN wf ON wf.b = r.range
         ORDER BY bucket""",

    "q_logreg_score" ->
      s"""WITH ${logregCtes(iters = 12, lr = 3.0)},
         mf AS (
           SELECT pd.doc_id,
                  CAST(sum(CAST(pd.cnt AS HUGEINT) * coalesce(wf.w, 0)) AS DOUBLE) / 1e6 AS m
           FROM pd LEFT JOIN wf USING (b) GROUP BY pd.doc_id)
         SELECT d.doc_id,
                coalesce(mf.m, 0.0) AS margin,
                round(1.0 / (1.0 + exp(-(coalesce(mf.m, 0.0)))), 6) AS p,
                (round(1.0 / (1.0 + exp(-(coalesce(mf.m, 0.0)))), 6) >= 0.5) AS predicted,
                (d.n_chars >= 250) AS label
         FROM documents d LEFT JOIN mf USING (doc_id)
         ORDER BY d.doc_id""",

    // context chunking: k-th chunk = toks[k·s+1 : k·s+w] (1-based
    // end-inclusive slice); chunk count 1 + ceil((n−w)⁺/s) via integer
    // floor-div, zero for empty docs
    "q_chunk_docs" ->
      """WITH d0 AS (
           SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9]+') AS toks
           FROM documents),
         d1 AS (
           SELECT doc_id, toks,
                  CASE WHEN len(toks) = 0 THEN 0
                       ELSE 1 + (GREATEST(len(toks) - 40, 0) + 29) // 30 END AS nc
           FROM d0),
         ex AS (
           SELECT doc_id, toks, unnest(range(0, nc)) AS k FROM d1)
         SELECT doc_id, CAST(k AS BIGINT) AS chunk_idx,
                CAST(len(toks[k*30+1 : k*30+40]) AS BIGINT) AS n_tokens,
                array_to_string(toks[k*30+1 : k*30+40], ' ') AS chunk_text
         FROM ex ORDER BY doc_id, chunk_idx""",

    "q_split_leakage" -> {
      import graft.functions.PortableHash.sqlHashMod
      val shard = s"(${sqlHashMod("('split:' || CAST(doc_id AS VARCHAR))")} % 10)"
      s"""WITH $minhashSimsCtes,
         p AS (SELECT id_a, id_b FROM sims WHERE sig_sim >= 0.5),
         sp AS (
           SELECT doc_id,
                  CASE WHEN $shard < 8 THEN 'train'
                       WHEN $shard = 8 THEN 'valid'
                       ELSE 'test' END AS split
           FROM documents),
         x AS (
           SELECT sa.split AS s_a, sb.split AS s_b
           FROM p JOIN sp sa ON sa.doc_id = p.id_a
                  JOIN sp sb ON sb.doc_id = p.id_b
           WHERE sa.split <> sb.split)
         SELECT least(s_a, s_b) AS split_a, greatest(s_a, s_b) AS split_b,
                count(*) AS n_pairs
         FROM x GROUP BY 1, 2 ORDER BY split_a, split_b"""
    },

    // Zipf fit: exact integer micro-unit regression sums (HUGEINT covers
    // the decimal(38,0) Spark side), then the identical fixed chain of
    // double ops — ln() quantized per vocab row before any summation
    "q_zipf" ->
      """WITH tk AS (
           SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
           FROM documents),
         f AS (SELECT tok, count(*) AS freq FROM tk GROUP BY tok),
         r AS (SELECT tok, freq,
                      row_number() OVER (ORDER BY freq DESC, tok ASC) AS rnk
               FROM f),
         q AS (SELECT freq,
                      CAST(round(ln(CAST(rnk AS DOUBLE)) * 1e6) AS BIGINT) AS x,
                      CAST(round(ln(CAST(freq AS DOUBLE)) * 1e6) AS BIGINT) AS y
               FROM r),
         a AS (SELECT CAST(count(*) AS BIGINT) AS vocab_size,
                      CAST(sum(freq) AS BIGINT) AS total_tokens,
                      CAST(sum(x) AS DOUBLE) / 1e6 AS sx,
                      CAST(sum(y) AS DOUBLE) / 1e6 AS sy,
                      CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) / 1e12 AS sxy,
                      CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) / 1e12 AS sxx
               FROM q),
         s AS (SELECT vocab_size, total_tokens, sx, sy,
                      (vocab_size * sxy - sx * sy)
                        / (vocab_size * sxx - sx * sx) AS slope
               FROM a)
         SELECT vocab_size, total_tokens,
                round(slope, 6) AS slope,
                round((sy - slope * sx) / vocab_size, 6) AS intercept
         FROM s""",

    "q_novelty" ->
      """WITH d0 AS (
           SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
           FROM documents),
         d AS (
           SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
                    i -> array_to_string(toks[i:i+2], ' '))) AS sh
           FROM d0),
         dd AS MATERIALIZED (
           SELECT doc_id, sh, CAST(len(sh) AS BIGINT) AS n_shingles
           FROM d WHERE len(sh) > 0),
         ex AS (SELECT doc_id, unnest(sh) AS shingle FROM dd),
         s AS (SELECT shingle, count(*) AS dfc, min(doc_id) AS only_doc
               FROM ex GROUP BY 1),
         nv AS (SELECT only_doc AS doc_id, CAST(count(*) AS BIGINT) AS n_novel
               FROM s WHERE dfc = 1 GROUP BY 1)
         SELECT dd.doc_id, dd.n_shingles,
                CAST(coalesce(nv.n_novel, 0) AS BIGINT) AS n_novel,
                round(CAST(coalesce(nv.n_novel, 0) AS DOUBLE) / dd.n_shingles, 6) AS novelty
         FROM dd LEFT JOIN nv USING (doc_id) ORDER BY doc_id""",

    // exact top-k + Count-Min Sketch replay: the sketch rows are the
    // same universal-hash family over the portable md5 base hash, so
    // both engines compute identical bucket sums and identical minima
    "q_heavy_hitters" -> {
      import graft.functions.PortableHash.{P, permConsts, sqlHashMod}
      val consts = permConsts(4).zipWithIndex
      def bucket(e: String, a: Long, b: Long): String =
        s"(((${sqlHashMod(e)} * $a) + $b) % $P) % 1024"
      val cmsCtes = consts.map { case ((a, b), i) =>
        s"cms$i AS (SELECT ${bucket("term", a, b)} AS b, CAST(sum(n_exact) AS BIGINT) AS s FROM c GROUP BY 1)"
      }.mkString(",\n         ")
      val joins = consts.map { case ((a, b), i) =>
        s"JOIN cms$i s$i ON ${bucket("tk.term", a, b)} = s$i.b"
      }.mkString("\n              ")
      val leastArgs = (0 until 4).map(i => s"s$i.s").mkString(", ")
      s"""WITH t AS (
           SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
           FROM documents),
         c AS MATERIALIZED (
           SELECT term, CAST(count(*) AS BIGINT) AS n_exact FROM t GROUP BY 1),
         tk AS (SELECT term, n_exact FROM c ORDER BY n_exact DESC, term LIMIT 50),
         $cmsCtes
         SELECT tk.term, tk.n_exact, least($leastArgs) AS cms_est
         FROM tk $joins
         ORDER BY n_exact DESC, term"""
    },

    // first-merge BPE pair statistics: vocabulary aggregate, then
    // per-distinct-word adjacent pairs weighted by word frequency.
    // DuckDB range(1, n) EXCLUDES n == Spark sequence(1, n-1) INCLUSIVE
    "q_bpe_pairs" ->
      """WITH w AS (
           SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
           FROM documents),
         v AS (SELECT word, CAST(count(*) AS BIGINT) AS wn FROM w GROUP BY 1),
         v2 AS (SELECT * FROM v WHERE length(word) >= 2),
         p AS (SELECT unnest(list_transform(range(1, length(word)),
                 i -> substr(word, CAST(i AS INTEGER), 2))) AS pair, wn
               FROM v2),
         g AS (SELECT pair, CAST(sum(wn) AS BIGINT) AS n FROM p GROUP BY 1)
         SELECT pair, n FROM g ORDER BY n DESC, pair LIMIT 50""",

    // largest-remainder replay: identical hash order (bucket, hash, id),
    // identical floor/remainder arithmetic on IEEE doubles
    "q_stratified_split" -> {
      import graft.functions.PortableHash.sqlHashMod
      val h = sqlHashMod("('strat:' || CAST(doc_id AS VARCHAR))")
      s"""WITH b AS (
           SELECT doc_id, lang, $h AS h FROM documents),
         r AS (SELECT doc_id, lang,
                      row_number() OVER (PARTITION BY lang ORDER BY h % 64, h, doc_id) - 1 AS rnk
               FROM b),
         t AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1),
         tg AS (SELECT lang, n,
                  CAST(floor(n * 0.8) AS BIGINT) AS fl0, n * 0.8 - floor(n * 0.8) AS rem0,
                  CAST(floor(n * 0.1) AS BIGINT) AS fl1, n * 0.1 - floor(n * 0.1) AS rem1,
                  CAST(floor(n * 0.1) AS BIGINT) AS fl2, n * 0.1 - floor(n * 0.1) AS rem2
                FROM t),
         bonus AS (SELECT lang, n, fl0, fl1, fl2,
                  n - (fl0 + fl1 + fl2) AS leftover,
                  (CASE WHEN rem1 > rem0 THEN 1 ELSE 0 END +
                   CASE WHEN rem2 > rem0 THEN 1 ELSE 0 END) AS rk0,
                  (CASE WHEN rem0 >= rem1 THEN 1 ELSE 0 END +
                   CASE WHEN rem2 > rem1 THEN 1 ELSE 0 END) AS rk1,
                  (CASE WHEN rem0 >= rem2 THEN 1 ELSE 0 END +
                   CASE WHEN rem1 >= rem2 THEN 1 ELSE 0 END) AS rk2
                FROM tg),
         th AS (SELECT lang,
                  fl0 + CASE WHEN rk0 < leftover THEN 1 ELSE 0 END AS t0,
                  fl1 + CASE WHEN rk1 < leftover THEN 1 ELSE 0 END AS t1
                FROM bonus)
         SELECT r.doc_id, r.lang,
                CASE WHEN rnk < t0 THEN 'train'
                     WHEN rnk < t0 + t1 THEN 'valid'
                     ELSE 'test' END AS split
         FROM r JOIN th ON r.lang = th.lang ORDER BY doc_id"""
    },

    // the pairwise-distance identity replayed on exact integer sums —
    // HUGEINT squares of dimension sums, same half-up 6-dp division
    "q_embed_dispersion" ->
      """WITH e AS (
           SELECT label, list_transform(embedding,
                    x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
           FROM embeddings WHERE embedding IS NOT NULL),
         r AS (SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
                      sum(CAST(list_sum(list_transform(q, x -> x * x)) AS HUGEINT)) AS s2
               FROM e GROUP BY 1),
         dx AS (SELECT label, unnest(range(0, len(q))) AS d, unnest(q) AS qx FROM e),
         ds AS (SELECT label, d, sum(qx) AS sd FROM dx GROUP BY 1, 2),
         ss AS (SELECT label, sum(CAST(sd AS HUGEINT) * CAST(sd AS HUGEINT)) AS ssq
                FROM ds GROUP BY 1),
         j AS (SELECT r.label, n_vecs,
                      (CAST(n_vecs AS HUGEINT) * coalesce(s2, 0) - coalesce(ssq, 0)) * 2 AS num,
                      CAST(n_vecs AS HUGEINT) * (n_vecs - 1) * 1000000000000 AS den
               FROM r LEFT JOIN ss ON r.label = ss.label)
         SELECT label, n_vecs,
                CASE WHEN n_vecs > 1
                     THEN CAST((num * 1000000 * 2 + den) // (den * 2) AS DOUBLE) / 1000000
                     ELSE NULL END AS dispersion
         FROM j ORDER BY label""",

    // per-source union MinHash: min over the whole sub-corpus of each
    // permuted shingle hash == the signature of the union shingle set
    "q_source_sim" -> {
      import graft.functions.PortableHash.{P, permConsts, sqlHashMod}
      val consts = permConsts(32)
      val minCols = consts.zipWithIndex.map { case ((a, b), i) =>
        s"min((b*$a + $b) % $P) AS h$i" }.mkString(",\n                  ")
      val sigList = (0 until 32).map(i => s"h$i").mkString("[", ", ", "]")
      s"""WITH d0 AS (
           SELECT source, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
           FROM documents),
         d AS (
           SELECT source, list_transform(range(1, len(toks) - 1),
                    i -> array_to_string(toks[i:i+2], ' ')) AS sh
           FROM d0),
         ex AS (SELECT source, unnest(sh) AS shingle FROM d WHERE len(sh) > 0),
         hx AS (SELECT source, ${sqlHashMod("shingle")} AS b FROM ex),
         mh AS (SELECT source,
                  $minCols
                FROM hx GROUP BY source),
         sig AS MATERIALIZED (SELECT source, $sigList AS sig FROM mh)
         SELECT a.source AS grp_a, b.source AS grp_b,
                round(CAST(list_sum(list_transform(range(1, 33),
                  i -> CASE WHEN a.sig[i] = b.sig[i] THEN 1 ELSE 0 END)) AS DOUBLE) / 32, 6) AS est_jaccard
         FROM sig a JOIN sig b ON a.source < b.source
         ORDER BY grp_a, grp_b"""
    },

    "q_gopher_lines" ->
      """WITH t AS (
           SELECT doc_id, regexp_replace(text, ' (a|the) ', chr(10), 'g') AS text
           FROM documents),
         l AS (
           SELECT doc_id, trim(u.x) AS line
           FROM t, unnest(string_split(coalesce(t.text, ''), chr(10))) AS u(x)),
         c AS (
           SELECT doc_id, line, count(*) AS c, CAST(length(line) AS BIGINT) AS ch
           FROM l WHERE line <> '' GROUP BY 1, 2),
         agg AS (
           SELECT doc_id,
                  CAST(sum(c) AS BIGINT) AS total_lines,
                  CAST(sum(c * ch) AS BIGINT) AS total_chars,
                  CAST(coalesce(sum(c) FILTER (WHERE c >= 2), 0) AS BIGINT) AS dup,
                  CAST(coalesce(sum(c * ch) FILTER (WHERE c >= 2), 0) AS BIGINT) AS dupch,
                  CAST(coalesce(sum(c) FILTER (WHERE ends_with(line, '...') OR ends_with(line, chr(8230))), 0) AS BIGINT) AS ell,
                  CAST(coalesce(sum(c) FILTER (WHERE regexp_matches(line, '^[-*' || chr(8226) || '] ')), 0) AS BIGINT) AS bul
           FROM c GROUP BY 1)
         SELECT d.doc_id,
                CAST(coalesce(a.total_lines, 0) AS BIGINT) AS total_lines,
                CAST(coalesce(a.total_chars, 0) AS BIGINT) AS total_chars,
                round(CASE WHEN coalesce(a.total_lines, 0) = 0 THEN 0.0
                      ELSE CAST(a.dup AS DOUBLE) / a.total_lines END, 6) AS dup_line_frac,
                round(CASE WHEN coalesce(a.total_chars, 0) = 0 THEN 0.0
                      ELSE CAST(a.dupch AS DOUBLE) / a.total_chars END, 6) AS dup_line_char_frac,
                round(CASE WHEN coalesce(a.total_lines, 0) = 0 THEN 0.0
                      ELSE CAST(a.ell AS DOUBLE) / a.total_lines END, 6) AS ellipsis_line_frac,
                round(CASE WHEN coalesce(a.total_lines, 0) = 0 THEN 0.0
                      ELSE CAST(a.bul AS DOUBLE) / a.total_lines END, 6) AS bullet_line_frac
         FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
         ORDER BY d.doc_id""",

    "q_redact" ->
      """SELECT doc_id,
                regexp_replace(regexp_replace(text,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                  '[0-9]+', '<NUM>', 'g') AS redacted
         FROM documents ORDER BY doc_id""",

    "q_length_quantiles" ->
      """SELECT lang,
                round(quantile_cont(n_chars, 0.25), 4) AS p25,
                round(quantile_cont(n_chars, 0.5), 4) AS p50,
                round(quantile_cont(n_chars, 0.75), 4) AS p75,
                round(quantile_cont(n_chars, 0.95), 4) AS p95,
                count(*) AS n_docs,
                round(avg(n_chars), 4) AS mean
         FROM documents GROUP BY lang ORDER BY lang""",

    "q_quality" ->
      """SELECT doc_id,
                CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens,
                CAST(length(text) AS BIGINT) AS n_chars_m,
                round(CASE WHEN len(regexp_extract_all(text, '[A-Za-z0-9]+')) > 0 THEN
                  CAST(list_sum(list_transform(regexp_extract_all(text, '[A-Za-z0-9]+'),
                       t -> length(t))) AS DOUBLE)
                  / len(regexp_extract_all(text, '[A-Za-z0-9]+')) END, 4) AS avg_token_len,
                round(CASE WHEN len(regexp_extract_all(text, '[A-Za-z0-9]+')) > 0 THEN
                  CAST(len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), w -> w = 'the'))
                     + len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), w -> w = 'and'))
                     + len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), w -> w = 'of'))
                     + len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), w -> w = 'to'))
                     + len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), w -> w = 'is')) AS DOUBLE)
                  / len(regexp_extract_all(text, '[A-Za-z0-9]+')) END, 4) AS stopword_ratio
         FROM documents ORDER BY doc_id""",

    "q_tfidf" ->
      """WITH tok AS (
           SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
           FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
         idf AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
         n AS (SELECT count(*) AS n_docs FROM documents),
         s AS (
           SELECT doc_id, term, tf * ln((n_docs + 1.0) / (df + 1.0)) AS tfidf
           FROM tf JOIN idf USING (term) CROSS JOIN n),
         r AS (
           SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
           FROM s)
         SELECT doc_id, term, round(tfidf, 6) AS tfidf, CAST(rank AS BIGINT) AS rank
         FROM r WHERE rank <= 3 ORDER BY doc_id, rank""",

    "q_moving_avg" ->
      """SELECT user_id, event_id, ts,
                round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS ma5
         FROM events ORDER BY user_id, event_id""",

    "q_range_join" ->
      """WITH ev AS (
           SELECT user_id, event_id, event_type,
                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
           FROM events),
         p AS (SELECT user_id, event_id, ts_us FROM ev WHERE event_type = 'purchase'),
         v AS (SELECT user_id, event_id AS view_id, ts_us AS start_us,
                      ts_us + 7200000000 AS end_us
               FROM ev WHERE event_type = 'view')
         SELECT p.user_id, p.event_id, v.view_id
         FROM p JOIN v
           ON p.user_id = v.user_id AND p.ts_us BETWEEN v.start_us AND v.end_us
         ORDER BY 1, 2, 3""",

    // DuckDB has a native ASOF LEFT JOIN; ts is cast to TIMESTAMP so both
    // engines compare the same microsecond values regardless of the
    // fixture's physical timestamp type (events() is schema-adaptive)
    "q_asof_join" ->
      """WITH ev AS (
           SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
         clicks AS (SELECT user_id, event_id, ts FROM ev WHERE event_type = 'click'),
         views AS (
           SELECT user_id, ts, max(value) AS view_value
           FROM ev WHERE event_type = 'view' GROUP BY 1, 2)
         SELECT c.user_id, c.event_id, c.ts,
                CASE WHEN v.ts IS NOT NULL AND c.ts <= v.ts + INTERVAL 6 HOUR
                     THEN round(v.view_value, 6) END AS view_value
         FROM clicks c ASOF LEFT JOIN views v
           ON c.user_id = v.user_id AND c.ts >= v.ts
         ORDER BY c.user_id, c.event_id""",

    // same oracle as q_asof_join — the split form must be observationally
    // identical to the direct window
    "q_asof_split" ->
      """WITH ev AS (
           SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
         clicks AS (SELECT user_id, event_id, ts FROM ev WHERE event_type = 'click'),
         views AS (
           SELECT user_id, ts, max(value) AS view_value
           FROM ev WHERE event_type = 'view' GROUP BY 1, 2)
         SELECT c.user_id, c.event_id, c.ts,
                CASE WHEN v.ts IS NOT NULL AND c.ts <= v.ts + INTERVAL 6 HOUR
                     THEN round(v.view_value, 6) END AS view_value
         FROM clicks c ASOF LEFT JOIN views v
           ON c.user_id = v.user_id AND c.ts >= v.ts
         ORDER BY c.user_id, c.event_id""",

    "q_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
         c AS (SELECT vec_id, embedding AS cv FROM embeddings),
         s AS (
           SELECT query_id, vec_id,
             list_sum(list_transform(range(1, len(qv) + 1),
               i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(range(1, len(qv) + 1),
                  i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
              * sqrt(list_sum(list_transform(range(1, len(cv) + 1),
                  i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE))))) AS cos
           FROM c CROSS JOIN q WHERE vec_id <> query_id),
         r AS (
           SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
           FROM s)
         SELECT query_id, vec_id, round(cos, 6) AS cos_sim, CAST(rank AS BIGINT) AS rank
         FROM r WHERE rank <= 5 ORDER BY query_id, rank""",

    "q_multimodal_features" ->
      """SELECT doc_id AS media_id,
                CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                CAST(32 AS INTEGER) AS n_bytes,
                round(list_sum(list_transform(range(1, 33),
                  i -> (strpos('0123456789abcdef', substr(h, 2*i-1, 1)) - 1) * 16.0
                     + (strpos('0123456789abcdef', substr(h, 2*i, 1)) - 1))) / 32.0, 4) AS byte_mean
         FROM (SELECT doc_id, lower(sha256(CAST(doc_id AS VARCHAR))) AS h FROM documents)
         ORDER BY media_id""",

    // ---- portable-hash pipelines: the oracle reproduces the md5-based
    // hashing (graft.functions.PortableHash) end-to-end in SQL ----

    "q_minhash_lsh" ->
      s"""WITH $minhashSimsCtes
         SELECT id_a, id_b, round(sig_sim, 6) AS sig_sim
         FROM sims WHERE sig_sim >= 0.5 ORDER BY id_a, id_b""",

    // connected components over the minhash pairs: transitive closure by
    // recursive CTE (min reachable label per node = component id)
    // containment replay: anchor-shingle candidates (each doc's 4
    // rarest df-capped shingles joined to the inverted lists),
    // verification by exact hash-set intersection over min-cardinality
    "q_containment_pairs" -> {
      import graft.functions.PortableHash.sqlHashMod
      s"""WITH d0 AS (
           SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
           FROM documents),
         d AS (
           SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
                    i -> array_to_string(toks[i:i+2], ' '))) AS sh
           FROM d0),
         ex AS (SELECT doc_id, unnest(sh) AS shingle FROM d WHERE len(sh) > 0),
         -- DISTINCT on (doc_id, b): per-doc shingle STRINGS are already
         -- distinct, but a within-doc hash collision would otherwise make
         -- the oracle count rows where Spark counts distinct HASHES
         -- (collect_set semantics) — both engines use hash-set cardinality
         hx AS MATERIALIZED (SELECT DISTINCT doc_id, ${sqlHashMod("shingle")} AS b FROM ex),
         dfc AS (SELECT b, count(*) AS c FROM hx GROUP BY 1),
         wd AS MATERIALIZED (
           SELECT doc_id, hx.b, dfc.c FROM hx JOIN dfc ON hx.b = dfc.b),
         anch AS (
           SELECT doc_id, b FROM (
             SELECT doc_id, b, c,
                    row_number() OVER (PARTITION BY doc_id ORDER BY c, b) AS rn
             FROM wd)
           WHERE rn <= 4 AND c <= 1000),
         mem AS (SELECT doc_id, b FROM wd WHERE c <= 1000),
         pr AS (SELECT DISTINCT least(a.doc_id, m.doc_id) AS id_a,
                       greatest(a.doc_id, m.doc_id) AS id_b
                FROM anch a JOIN mem m ON a.b = m.b AND a.doc_id <> m.doc_id),
         nsh AS (SELECT doc_id, count(*) AS n FROM hx GROUP BY 1),
         inter AS (SELECT pr.id_a, pr.id_b, count(*) AS ni
                   FROM pr JOIN hx xa ON xa.doc_id = pr.id_a
                        JOIN hx xb ON xb.doc_id = pr.id_b AND xb.b = xa.b
                   GROUP BY 1, 2)
         SELECT i.id_a, i.id_b,
                round(CAST(ni AS DOUBLE) / least(a.n, b.n), 6) AS containment
         FROM inter i JOIN nsh a ON a.doc_id = i.id_a JOIN nsh b ON b.doc_id = i.id_b
         WHERE CAST(ni AS DOUBLE) / least(a.n, b.n) >= 0.6
         ORDER BY id_a, id_b"""
    },

    "q_dup_clusters" ->
      s"""WITH RECURSIVE $minhashSimsCtes,
         p AS (SELECT id_a, id_b FROM sims WHERE sig_sim >= 0.5),
         e AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM p
               UNION ALL SELECT id_b AS a, id_a AS b FROM p),
         reach(id, lbl) AS (
           SELECT a, a FROM (SELECT DISTINCT a FROM e)
           UNION
           SELECT e.b, r.lbl FROM reach r JOIN e ON e.a = r.id),
         comp AS MATERIALIZED (SELECT id, min(lbl) AS component FROM reach GROUP BY id)
         SELECT d.doc_id AS id,
                coalesce(c.component, d.doc_id) AS component,
                coalesce(c.component, d.doc_id) = d.doc_id AS is_canonical
         FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
         ORDER BY id""",

    "q_dedup_best" ->
      s"""WITH RECURSIVE $minhashSimsCtes,
         p AS (SELECT id_a, id_b FROM sims WHERE sig_sim >= 0.5),
         e AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM p
               UNION ALL SELECT id_b AS a, id_a AS b FROM p),
         reach(id, lbl) AS (
           SELECT a, a FROM (SELECT DISTINCT a FROM e)
           UNION
           SELECT e.b, r.lbl FROM reach r JOIN e ON e.a = r.id),
         comp AS MATERIALIZED (SELECT id, min(lbl) AS component FROM reach GROUP BY id),
         allc AS MATERIALIZED (
           SELECT d.doc_id AS id,
                  coalesce(c.component, d.doc_id) AS component,
                  CAST(d.n_chars AS DOUBLE) AS score
           FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
         ms AS (SELECT component, max(score) AS m FROM allc GROUP BY 1),
         best AS (
           SELECT a.component, min(a.id) AS best
           FROM allc a JOIN ms ON a.component = ms.component AND a.score = ms.m
           GROUP BY a.component)
         SELECT a.id, a.component, a.id = b.best AS keep
         FROM allc a JOIN best b ON a.component = b.component
         ORDER BY a.id""",

    "q_simhash_pairs" -> {
      import graft.functions.PortableHash.sqlHash60
      val bandRows = (0 until 4).map { bb =>
        s"SELECT id, sig, $bb AS band, (sig >> ${bb * 15}) & 32767 AS bb FROM sigs"
      }.mkString("\n           UNION ALL ")
      s"""WITH tok AS (
           SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
           FROM documents),
         hx AS (SELECT doc_id, ${sqlHash60("t")} AS h FROM tok),
         bits AS (
           SELECT doc_id, CAST(r.i AS INTEGER) AS i,
                  sum((h >> CAST(r.i AS INTEGER)) & 1) AS ones, count(*) AS n
           FROM hx CROSS JOIN range(60) r(i) GROUP BY 1, 2),
         sig0 AS (
           SELECT doc_id, CAST(sum(CASE WHEN ones*2 > n THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS sig
           FROM bits GROUP BY 1),
         sigs AS (
           SELECT d.doc_id AS id, coalesce(s.sig, 0) AS sig
           FROM documents d LEFT JOIN sig0 s USING (doc_id)),
         bands AS (
           $bandRows),
         cand AS (
           SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.sig AS sa, b.sig AS sb
           FROM bands a JOIN bands b ON a.band = b.band AND a.bb = b.bb AND a.id < b.id)
         SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
         FROM cand WHERE bit_count(xor(sa, sb)) <= 3 ORDER BY id_a, id_b"""
    },

    "q_sample_shard" -> {
      import graft.functions.PortableHash.sqlHashMod
      val score = Sampling.sqlHashScore("doc_id", "sample")
      s"""SELECT doc_id, lang,
                (${sqlHashMod("('shard:' || CAST(doc_id AS VARCHAR))")} % 8) AS shard
         FROM documents
         WHERE $score < CASE WHEN lang = 'en' THEN 0.5 ELSE 0.2 END
         ORDER BY doc_id"""
    },

    "q_curate_diverse" -> {
      import graft.functions.PortableHash.sqlHashMod
      val divScore = Sampling.sqlHashScore("af.vec_id", "curate-div")
      val packScore = Sampling.sqlHashScore("doc_id", "curate-pack")
      val dvCte =
        """base AS (
           SELECT doc_id, lang,
                  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens,
                  md5(text) AS h
           FROM documents),
         g AS (SELECT * FROM base WHERE n_tokens >= 5),
         dd AS (SELECT doc_id, lang, n_tokens FROM (
                  SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn FROM g)
                WHERE rn = 1),
         dv AS (SELECT e.vec_id, list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS v
                FROM embeddings e JOIN dd ON dd.doc_id = e.vec_id)"""
      s"""WITH ${kmeansCtes(4, 2, 64, dvCte)},
         ${kmeansAssign("af", "c2", 64)},
         sz AS (SELECT cl, count(*) AS n FROM af GROUP BY cl),
         kept AS (
           SELECT af.vec_id AS doc_id, af.cl AS cluster
           FROM af JOIN sz ON sz.cl = af.cl
           WHERE $divScore < least(1.0, 32.0 / sz.n)),
         kd AS (SELECT k.doc_id, k.cluster, dd.lang, dd.n_tokens
                FROM kept k JOIN dd ON dd.doc_id = k.doc_id),
         sh AS (SELECT doc_id, cluster, lang, n_tokens,
                  (${sqlHashMod("('curate-pack:' || CAST(doc_id AS VARCHAR))")} % 4) AS shard,
                  $packScore AS pscore
                FROM kd),
         w AS (SELECT doc_id, cluster, lang, n_tokens, shard,
                  CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY shard
                    ORDER BY pscore, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
               FROM sh)
         SELECT doc_id, lang, n_tokens, cluster, shard, start_off,
                CAST(start_off // 512 AS BIGINT) AS pack_first,
                CAST((start_off + n_tokens - 1) // 512 AS BIGINT) AS pack_last
         FROM w ORDER BY doc_id"""
    },

    "q_curation_pipeline" -> {
      import graft.functions.PortableHash.sqlHashMod
      val sampleScore = Sampling.sqlHashScore("doc_id", "curate")
      val packScore = Sampling.sqlHashScore("doc_id", "curate-pack")
      s"""WITH t AS (
           SELECT doc_id, lang, text,
                  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens
           FROM documents),
         q AS (SELECT * FROM t WHERE n_tokens >= 5),
         k AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(text)),
         dd AS (SELECT q.* FROM q JOIN k USING (doc_id)),
         sm AS (SELECT * FROM dd
                WHERE $sampleScore < CASE WHEN lang = 'en' THEN 0.6 ELSE 0.4 END),
         sh AS (SELECT doc_id, lang, n_tokens,
                  (${sqlHashMod("('curate-pack:' || CAST(doc_id AS VARCHAR))")} % 4) AS shard,
                  $packScore AS pscore
                FROM sm),
         w AS (SELECT doc_id, lang, n_tokens, shard,
                  CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY shard
                    ORDER BY pscore, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
               FROM sh)
         SELECT doc_id, lang, n_tokens, shard, start_off,
                CAST(start_off // 512 AS BIGINT) AS pack_first,
                CAST((start_off + n_tokens - 1) // 512 AS BIGINT) AS pack_last
         FROM w ORDER BY doc_id"""
    },

    "q_pack_sequences" -> {
      import graft.functions.PortableHash.sqlHashMod
      val score = Sampling.sqlHashScore("doc_id", "pack")
      s"""WITH t AS (
           SELECT doc_id,
                  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens,
                  (${sqlHashMod("('pack:' || CAST(doc_id AS VARCHAR))")} % 4) AS shard,
                  $score AS score
           FROM documents),
         w AS (
           SELECT doc_id, shard, n_tokens,
                  CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY shard
                    ORDER BY score, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
           FROM t WHERE n_tokens > 0)
         SELECT doc_id, shard, n_tokens, start_off,
                CAST(start_off // 512 AS BIGINT) AS pack_first,
                CAST((start_off + n_tokens - 1) // 512 AS BIGINT) AS pack_last
         FROM w ORDER BY doc_id"""
    },

    "q_winnow" -> {
      import graft.functions.PortableHash.sqlHashMod
      val w = 5; val k = 4; val pb = 1L << 32 // TextAnalysis.winnow PosBits
      s"""WITH t AS (
           SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
           FROM documents),
         px AS (
           SELECT doc_id, ws, unnest(range(1, len(ws) - $w + 2)) AS pos FROM t),
         win AS (
           SELECT doc_id, pos,
                  ${sqlHashMod(s"array_to_string(ws[pos:pos+${w - 1}], ' ')")} AS h
           FROM px),
         keyed AS (
           SELECT doc_id, pos, h * $pb + pos AS key FROM win WHERE pos < $pb),
         sel AS (
           SELECT doc_id, pos,
                  count(*) OVER (PARTITION BY doc_id) AS n,
                  min(key) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN CURRENT ROW AND ${k - 1} FOLLOWING) AS wmin
           FROM keyed),
         f AS (
           SELECT DISTINCT doc_id, wmin % $pb AS fpos, wmin // $pb AS fp
           FROM sel WHERE pos <= greatest(1, n - ${k - 1}))
         SELECT doc_id, CAST(fpos AS BIGINT) AS pos, CAST(fp AS BIGINT) AS fp
         FROM f ORDER BY doc_id, pos, fp"""
    },

    "q_winnow_pairs" -> {
      import graft.functions.PortableHash.sqlHashMod
      val w = 5; val k = 4; val pb = 1L << 32 // TextAnalysis.winnow PosBits
      s"""WITH t AS (
           SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
           FROM documents),
         px AS (
           SELECT doc_id, ws, unnest(range(1, len(ws) - $w + 2)) AS pos FROM t),
         win AS (
           SELECT doc_id, pos,
                  ${sqlHashMod(s"array_to_string(ws[pos:pos+${w - 1}], ' ')")} AS h
           FROM px),
         keyed AS (
           SELECT doc_id, pos, h * $pb + pos AS key FROM win WHERE pos < $pb),
         sel AS (
           SELECT doc_id, pos,
                  count(*) OVER (PARTITION BY doc_id) AS n,
                  min(key) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN CURRENT ROW AND ${k - 1} FOLLOWING) AS wmin
           FROM keyed),
         f AS (
           SELECT DISTINCT doc_id, wmin // $pb AS fp
           FROM sel WHERE pos <= greatest(1, n - ${k - 1})),
         rare AS (SELECT fp FROM f GROUP BY fp HAVING count(*) <= 100),
         kept AS (SELECT doc_id, fp FROM f JOIN rare USING (fp)),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
           FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT id_a, id_b, CAST(n_shared AS BIGINT) AS n_shared
         FROM pairs WHERE n_shared >= 2 ORDER BY id_a, id_b"""
    },

    "q_fingerprint" -> {
      import graft.functions.PortableHash.{P, sqlHashMod}
      s"""SELECT doc_id,
                list_reduce(
                  list_prepend(CAST(1299709 AS BIGINT),
                    list_transform(regexp_extract_all(text, '[A-Za-z0-9]+'),
                      t -> ${sqlHashMod("t")})),
                  (acc, x) -> (acc * 31 + x) % $P) AS fp
         FROM documents ORDER BY doc_id"""
    },

    "q_ivf_topk" ->
      """WITH dotv AS (
           SELECT vec_id, embedding AS v,
                  sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
                    i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS n
           FROM embeddings),
         cents AS (
           SELECT CAST(vec_id AS VARCHAR) AS cid, v AS cent, n AS cn0
           FROM dotv WHERE n > 0
           ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 16),
         cscore AS (
           SELECT d.vec_id, c.cid AS cell,
                  row_number() OVER (PARTITION BY d.vec_id ORDER BY
                    list_sum(list_transform(range(1, len(d.v) + 1),
                      i -> CAST(d.v[i] AS DOUBLE) * CAST(c.cent[i] AS DOUBLE))) / (d.n * c.cn0) DESC,
                    c.cid) AS r
           FROM dotv d CROSS JOIN cents c),
         cassign AS (SELECT vec_id, cell FROM cscore WHERE r = 1),
         qscore AS (
           SELECT d.vec_id AS query_id, c.cid AS cell,
                  row_number() OVER (PARTITION BY d.vec_id ORDER BY
                    list_sum(list_transform(range(1, len(d.v) + 1),
                      i -> CAST(d.v[i] AS DOUBLE) * CAST(c.cent[i] AS DOUBLE))) / (d.n * c.cn0) DESC,
                    c.cid) AS r
           FROM dotv d CROSS JOIN cents c WHERE d.vec_id < 10),
         qcells AS (SELECT query_id, cell FROM qscore WHERE r <= 2),
         cand AS (
           SELECT q.query_id, ca.vec_id
           FROM qcells q JOIN cassign ca ON ca.cell = q.cell
           WHERE ca.vec_id <> q.query_id),
         scored AS (
           SELECT cand.query_id, cand.vec_id,
                  list_sum(list_transform(range(1, len(qd.v) + 1),
                    i -> CAST(qd.v[i] AS DOUBLE) * CAST(cd.v[i] AS DOUBLE))) / (qd.n * cd.n) AS cos
           FROM cand
           JOIN dotv qd ON qd.vec_id = cand.query_id
           JOIN dotv cd ON cd.vec_id = cand.vec_id),
         r AS (
           SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
           FROM scored)
         SELECT query_id, vec_id, round(cos, 6) AS cos_sim, CAST(rank AS BIGINT) AS rank
         FROM r WHERE rank <= 5 ORDER BY query_id, rank""",

    "q_lsh_topk" -> {
      import graft.functions.PortableHash.planeInts
      // Same plane width as the Spark side (Similarity.MaxDim, sliced to
      // the vector length by list_transform's range) — a narrower
      // hardcoded width would silently truncate the projection for
      // wider-than-64-dim embeddings and diverge from Spark.
      val pls = planeInts(8, graft.pipeline.Similarity.MaxDim)
      def proj(p: Int): String =
        s"list_sum(list_transform(range(1, len(v) + 1), i -> CAST(v[i] AS DOUBLE) * pl.p$p[i]))"
      val bucketExpr = (0 until 8).map { p =>
        s"CASE WHEN ${proj(p)} >= 0 THEN ${1L << p} ELSE 0 END"
      }.mkString("(", "\n                + ", ")")
      s"""WITH ${planesCte(pls)},
         cb AS MATERIALIZED (
           SELECT vec_id, embedding AS v,
                  CAST($bucketExpr AS BIGINT) AS bucket
           FROM embeddings, pl),
         q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM cb WHERE vec_id < 10),
         s AS (
           SELECT query_id, c.vec_id,
             list_sum(list_transform(range(1, len(qv) + 1),
               i -> CAST(qv[i] AS DOUBLE) * CAST(c.v[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(range(1, len(qv) + 1),
                  i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
              * sqrt(list_sum(list_transform(range(1, len(c.v) + 1),
                  i -> CAST(c.v[i] AS DOUBLE) * CAST(c.v[i] AS DOUBLE))))) AS cos
           FROM cb c JOIN q USING (bucket) WHERE c.vec_id <> query_id),
         r AS (
           SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
           FROM s)
         SELECT query_id, vec_id, round(cos, 6) AS cos_sim, CAST(rank AS BIGINT) AS rank
         FROM r WHERE rank <= 5 ORDER BY query_id, rank"""
    },

    // recall@k = |lsh top-5 ∩ exact top-5| / 5 per query: composes the
    // q_lsh_topk and q_cosine_topk chains (both hash-matched on their own)
    "q_ann_recall" -> {
      import graft.functions.PortableHash.planeInts
      val pls = planeInts(8, graft.pipeline.Similarity.MaxDim)
      def proj(p: Int): String =
        s"list_sum(list_transform(range(1, len(v) + 1), i -> CAST(v[i] AS DOUBLE) * pl.p$p[i]))"
      val bucketExpr = (0 until 8).map { p =>
        s"CASE WHEN ${proj(p)} >= 0 THEN ${1L << p} ELSE 0 END"
      }.mkString("(", "\n                + ", ")")
      s"""WITH ${planesCte(pls)},
         cb AS MATERIALIZED (
           SELECT vec_id, embedding AS v,
                  CAST($bucketExpr AS BIGINT) AS bucket
           FROM embeddings, pl),
         lq AS (SELECT vec_id AS query_id, v AS qv, bucket FROM cb WHERE vec_id < 10),
         ls AS (
           SELECT query_id, c.vec_id,
             list_sum(list_transform(range(1, len(qv) + 1),
               i -> CAST(qv[i] AS DOUBLE) * CAST(c.v[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(range(1, len(qv) + 1),
                  i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
              * sqrt(list_sum(list_transform(range(1, len(c.v) + 1),
                  i -> CAST(c.v[i] AS DOUBLE) * CAST(c.v[i] AS DOUBLE))))) AS cos
           FROM cb c JOIN lq USING (bucket) WHERE c.vec_id <> query_id),
         lr AS (
           SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
           FROM ls),
         approx AS (SELECT query_id, vec_id FROM lr WHERE rank <= 5),
         eq AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
         es AS (
           SELECT query_id, c.vec_id,
             list_sum(list_transform(range(1, len(qv) + 1),
               i -> CAST(qv[i] AS DOUBLE) * CAST(c.v[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(range(1, len(qv) + 1),
                  i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
              * sqrt(list_sum(list_transform(range(1, len(c.v) + 1),
                  i -> CAST(c.v[i] AS DOUBLE) * CAST(c.v[i] AS DOUBLE))))) AS cos
           FROM cb c CROSS JOIN eq WHERE c.vec_id <> query_id),
         er AS (
           SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
           FROM es),
         exact AS (SELECT query_id, vec_id FROM er WHERE rank <= 5)
         SELECT e.query_id,
                CAST(count(*) AS BIGINT) AS n_exact,
                CAST(count(a.vec_id) AS BIGINT) AS n_hit,
                round(CAST(count(a.vec_id) AS DOUBLE) / count(*), 6) AS recall
         FROM exact e LEFT JOIN approx a
           ON a.query_id = e.query_id AND a.vec_id = e.vec_id
         GROUP BY e.query_id ORDER BY e.query_id"""
    },

    "q_mix_weights" ->
      """WITH g AS (
           SELECT source,
                  CAST(sum(len(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS BIGINT) AS n_tokens,
                  count(*) AS n_docs
           FROM documents GROUP BY source),
         s AS (
           SELECT source, n_tokens, n_docs,
                  CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER () AS share
           FROM g),
         r AS (SELECT *, pow(share, 0.5) AS raw FROM s)
         SELECT source, n_tokens, n_docs, round(share, 6) AS share,
                round(raw / sum(raw) OVER (), 6) AS weight
         FROM r ORDER BY source""",

    "q_mix_apply" -> {
      val score = Sampling.sqlHashScore("d.doc_id", "mix")
      s"""WITH g AS (
           SELECT source,
                  CAST(sum(len(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS BIGINT) AS n_tokens,
                  count(*) AS n_docs
           FROM documents GROUP BY source),
         s AS (
           SELECT source, n_tokens,
                  CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER () AS share
           FROM g),
         r AS (SELECT *, pow(share, 0.5) AS raw FROM s),
         w AS (SELECT source, n_tokens AS actual, raw / sum(raw) OVER () AS weight FROM r),
         rates AS (
           SELECT source,
                  CASE WHEN actual = 0 THEN 1.0
                       ELSE least(1.0, 10000.0 * weight / actual) END AS rate
           FROM w)
         SELECT d.doc_id, d.source,
                CAST(len(regexp_extract_all(d.text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens,
                round(rates.rate, 6) AS rate
         FROM documents d JOIN rates USING (source)
         WHERE $score < rates.rate
         ORDER BY d.doc_id"""
    },

    "q_mix_epochs" -> {
      val score = Sampling.sqlHashScore("doc_id", "mix")
      s"""WITH g AS (
           SELECT source,
                  CAST(sum(len(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS BIGINT) AS n_tokens,
                  count(*) AS n_docs
           FROM documents GROUP BY source),
         s AS (
           SELECT source, n_tokens,
                  CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER () AS share
           FROM g),
         r AS (SELECT *, pow(share, 0.5) AS raw FROM s),
         w AS (SELECT source, n_tokens AS actual, raw / sum(raw) OVER () AS weight FROM r),
         rates AS (
           SELECT source,
                  CASE WHEN actual = 0 THEN 1.0
                       ELSE 60000.0 * weight / actual END AS rate
           FROM w),
         c AS (
           SELECT d.doc_id, d.source,
                  CAST(len(regexp_extract_all(d.text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens,
                  rates.rate,
                  CAST(floor(rates.rate) AS BIGINT) +
                    CASE WHEN $score < rates.rate - floor(rates.rate) THEN 1 ELSE 0 END AS copies
           FROM documents d JOIN rates USING (source))
         SELECT doc_id, source, n_tokens, round(rate, 6) AS rate, copies
         FROM c WHERE copies >= 1
         ORDER BY doc_id"""
    },

    "q_perplexity" ->
      """WITH tok AS (
           SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
           FROM documents),
         v AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
         n AS (SELECT count(*) AS n FROM tok)
         SELECT doc_id, count(*) AS n_tokens,
                round(avg(-ln(CAST(c AS DOUBLE) / n)), 6) AS avg_nll,
                round(exp(avg(-ln(CAST(c AS DOUBLE) / n))), 6) AS ppl
         FROM tok JOIN v USING (term) CROSS JOIN n
         GROUP BY doc_id ORDER BY doc_id""",

    "q_bigram_ppl" ->
      """WITH d0 AS (
           SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
           FROM documents),
         bg AS MATERIALIZED (
           SELECT doc_id, unnest(toks[1:-2]) AS prev, unnest(toks[2:-1]) AS cur
           FROM d0 WHERE len(toks) >= 2),
         bc AS (SELECT prev, cur, count(*) AS cb FROM bg GROUP BY 1, 2),
         uc AS (SELECT prev, count(*) AS cu FROM bg GROUP BY 1),
         v AS (SELECT count(DISTINCT term) AS v
               FROM (SELECT unnest(toks) AS term FROM d0)),
         nll AS (
           SELECT doc_id,
                  -ln((cb + 1.0) / (cu + 1.0 * v)) AS x
           FROM bg JOIN bc USING (prev, cur) JOIN uc USING (prev) CROSS JOIN v)
         SELECT doc_id, count(*) AS n_bigrams,
                round(avg(x), 6) AS avg_nll,
                round(exp(avg(x)), 6) AS ppl
         FROM nll GROUP BY doc_id ORDER BY doc_id""",

    "q_pmi_pairs" ->
      """WITH d0 AS (
           SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
           FROM documents),
         bg AS MATERIALIZED (
           SELECT doc_id, unnest(toks[1:-2]) AS prev, unnest(toks[2:-1]) AS cur
           FROM d0 WHERE len(toks) >= 2),
         bc AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS n
                FROM bg GROUP BY 1, 2 HAVING count(*) >= 5),
         pc AS (SELECT prev, count(*) AS cp FROM bg GROUP BY 1),
         cc AS (SELECT cur, count(*) AS ccn FROM bg GROUP BY 1),
         t AS (SELECT count(*) AS nt FROM bg)
         SELECT prev, cur, n,
                round(ln(CAST(n AS DOUBLE) * nt / (cp * ccn)), 6) AS pmi
         FROM bc JOIN pc USING (prev) JOIN cc USING (cur) CROSS JOIN t
         ORDER BY ln(CAST(n AS DOUBLE) * nt / (cp * ccn)) DESC, prev, cur
         LIMIT 50""",

    "q_quality_bins" ->
      """WITH c AS (
           SELECT lang,
                  quantile_cont(n_chars, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS cuts
           FROM documents GROUP BY lang)
         SELECT d.doc_id, d.lang, d.n_chars,
                CAST(1 + list_sum(list_transform(c.cuts,
                  t -> CASE WHEN CAST(d.n_chars AS DOUBLE) > t THEN 1 ELSE 0 END)) AS BIGINT) AS bin
         FROM documents d JOIN c USING (lang)
         ORDER BY d.doc_id""",

    "q_domain_cap" ->
      """SELECT doc_id, source, n_chars, rank FROM (
           SELECT doc_id, source, n_chars,
                  row_number() OVER (PARTITION BY source
                                     ORDER BY n_chars DESC, doc_id) AS rank
           FROM documents)
         WHERE rank <= 10 ORDER BY doc_id""",

    // DSIR twins share the hashed-feature + micro-unit-λ CTE chain; the
    // per-doc score is an integer sum (order-independent, engine-exact),
    // only the final projection divides back to a double
    "q_dsir_scores" -> {
      import graft.functions.PortableHash.sqlHash60
      s"""WITH $dsirCtes
         SELECT d.doc_id,
                CAST(coalesce(nf, 0) AS BIGINT) AS n_features,
                round(CAST(coalesce(s_micro, 0) AS DOUBLE) / 1000000.0, 6) AS score
         FROM documents d LEFT JOIN sc USING (doc_id)
         ORDER BY doc_id"""
    },

    "q_dsir_sample" -> {
      import graft.functions.PortableHash.sqlHashMod
      s"""WITH $dsirCtes,
         keyed AS (
           SELECT d.doc_id,
                  CAST(coalesce(s_micro, 0) AS DOUBLE) / 1000000.0 AS sc0,
                  CAST(coalesce(s_micro, 0) AS DOUBLE) / 1000000.0
                    - ln(-ln(CAST(${sqlHashMod("'dsir:' || CAST(doc_id AS VARCHAR)")} + 1 AS DOUBLE)
                             / 2147483648.0)) AS k
           FROM documents d LEFT JOIN sc USING (doc_id)),
         top AS (SELECT * FROM keyed ORDER BY k DESC, doc_id LIMIT 100)
         SELECT doc_id, round(sc0, 6) AS score, round(k, 6) AS gumbel_key
         FROM top ORDER BY doc_id"""
    },

    "q_kmeans" -> kmeansOracleSql(k = 8, iters = 2, dim = 64),

    "q_kmeans_inertia" ->
      s"""WITH ${kmeansCtes(8, 2, 64)},
         ${kmeansAssign("af", "c2", 64)},
         g AS (
           -- sum in integer micro-units: exact and order-independent, the
           -- same construction as Clustering.clusterMetrics — a float sum
           -- can land one ulp either side of a rounding boundary depending
           -- on partial-aggregation order
           SELECT cl AS cluster, count(*) AS n_points,
                  sum(CAST(round(round(dist, 6) * 1000000) AS BIGINT)) AS micro,
                  max(round(dist, 6)) AS max_sqdist
           FROM af GROUP BY 1)
         SELECT cluster, n_points,
                round(CAST(n_points AS DOUBLE) / sum(n_points) OVER (), 6) AS share,
                round(CAST(micro AS DOUBLE) / 1000000.0, 6) AS inertia,
                round(CAST(micro AS DOUBLE) / 1000000.0 / n_points, 6) AS mean_sqdist,
                max_sqdist
         FROM g ORDER BY cluster""",

    "q_lsh_int8" -> {
      import graft.functions.PortableHash.planeInts
      val pls = planeInts(8, graft.pipeline.Similarity.MaxDim)
      def proj(p: Int): String =
        s"list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * pl.p$p[i]))"
      val bucketExpr = (0 until 8).map { p =>
        s"CASE WHEN ${proj(p)} >= 0 THEN ${1L << p} ELSE 0 END"
      }.mkString("(", "\n                + ", ")")
      s"""WITH ${planesCte(pls)},
         dv AS (
           SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS ma FROM dv),
         qz AS (
           SELECT vec_id,
                  CASE WHEN ma > 0
                       THEN list_transform(v, x -> round(x / (ma / 127)))
                       ELSE list_transform(v, x -> 0.0) END AS qv
           FROM m),
         cb AS MATERIALIZED (SELECT vec_id, qv, CAST($bucketExpr AS BIGINT) AS bucket FROM qz, pl),
         q AS (SELECT vec_id AS query_id, qv AS qq, bucket FROM cb WHERE vec_id < 10),
         s AS (
           SELECT query_id, c.vec_id,
             list_sum(list_transform(range(1, len(qq) + 1), i -> qq[i] * c.qv[i]))
             / (sqrt(list_sum(list_transform(range(1, len(qq) + 1), i -> qq[i] * qq[i])))
              * sqrt(list_sum(list_transform(range(1, len(c.qv) + 1), i -> c.qv[i] * c.qv[i])))) AS cos
           FROM cb c JOIN q USING (bucket) WHERE c.vec_id <> query_id),
         r AS (
           SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
           FROM s)
         SELECT query_id, vec_id, round(cos, 6) AS cos_sim, CAST(rank AS BIGINT) AS rank
         FROM r WHERE rank <= 5 ORDER BY query_id, rank"""
    },

    "q_ann_rerank" -> {
      // int8 LSH shortlist (rank <= 10; q_lsh_int8's machinery) re-scored
      // with exact float cosine, top-5 per query in exact order
      import graft.functions.PortableHash.planeInts
      val pls = planeInts(8, graft.pipeline.Similarity.MaxDim)
      def proj(p: Int): String =
        s"list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * pl.p$p[i]))"
      val bucketExpr = (0 until 8).map { p =>
        s"CASE WHEN ${proj(p)} >= 0 THEN ${1L << p} ELSE 0 END"
      }.mkString("(", "\n                + ", ")")
      s"""WITH ${planesCte(pls)},
         dv AS MATERIALIZED (
           SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS ma FROM dv),
         qz AS (
           SELECT vec_id,
                  CASE WHEN ma > 0
                       THEN list_transform(v, x -> round(x / (ma / 127)))
                       ELSE list_transform(v, x -> 0.0) END AS qv
           FROM m),
         cb AS MATERIALIZED (SELECT vec_id, qv, CAST($bucketExpr AS BIGINT) AS bucket FROM qz, pl),
         q AS (SELECT vec_id AS query_id, qv AS qq, bucket FROM cb WHERE vec_id < 10),
         s AS (
           SELECT query_id, c.vec_id,
             list_sum(list_transform(range(1, len(qq) + 1), i -> qq[i] * c.qv[i]))
             / (sqrt(list_sum(list_transform(range(1, len(qq) + 1), i -> qq[i] * qq[i])))
              * sqrt(list_sum(list_transform(range(1, len(c.qv) + 1), i -> c.qv[i] * c.qv[i])))) AS cos
           FROM cb c JOIN q USING (bucket) WHERE c.vec_id <> query_id),
         r AS (
           SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
           FROM s),
         short AS (SELECT query_id, vec_id FROM r WHERE rank <= 10),
         fv AS (
           SELECT vec_id, v,
                  sqrt(list_sum(list_transform(range(1, len(v) + 1), i -> v[i] * v[i]))) AS n
           FROM dv),
         rescored AS (
           SELECT sh.query_id, sh.vec_id,
                  list_sum(list_transform(range(1, len(qf.v) + 1),
                    i -> qf.v[i] * cf.v[i])) / (qf.n * cf.n) AS cos
           FROM short sh
           JOIN fv qf ON qf.vec_id = sh.query_id
           JOIN fv cf ON cf.vec_id = sh.vec_id),
         rr AS (
           SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
           FROM rescored)
         SELECT query_id, vec_id, round(cos, 6) AS cos_sim, CAST(rank AS BIGINT) AS rank
         FROM rr WHERE rank <= 5 ORDER BY query_id, rank"""
    },

    "q_embed_cov" ->
      """WITH e AS (
           SELECT vec_id,
                  list_transform(embedding,
                    x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
           FROM embeddings),
         d1 AS (
           SELECT i, sum(qx) AS sx
           FROM (SELECT unnest(range(0, len(q))) AS i, unnest(q) AS qx FROM e)
           GROUP BY i),
         -- pure-long-array hot path; (i, j) decoded from the flattened
         -- position (exact: IEEE sqrt of perfect squares) — mirrors
         -- Similarity.embeddingCovariance
         p AS (
           SELECT unnest(range(0, len(q) * (len(q) + 1) // 2)) AS pos,
                  unnest(flatten(list_transform(range(0, len(q)), i ->
                    list_transform(range(i, len(q)), j -> q[i+1] * q[j+1])))) AS qxy
           FROM e),
         g AS (SELECT pos, count(*) AS n, sum(qxy) AS sxy FROM p GROUP BY pos),
         t AS (SELECT max(pos) + 1 AS T FROM g),
         ix AS (
           SELECT pos, n, sxy, T,
                  T - 1 - pos AS rev,
                  CAST(floor((sqrt(CAST(T - 1 - pos AS DOUBLE) * 8 + 1) - 1) / 2) AS BIGINT) AS r,
                  CAST(floor((sqrt(CAST(T AS DOUBLE) * 8 + 1) - 1) / 2) AS BIGINT) AS d
           FROM g CROSS JOIN t),
         f AS (
           SELECT d - 1 - r AS i,
                  d - 1 - (rev - CAST(r * (r + 1) / 2 AS BIGINT)) AS j,
                  n, sxy
           FROM ix)
         SELECT CAST(f.i AS BIGINT) AS i, CAST(f.j AS BIGINT) AS j, CAST(n AS BIGINT) AS n,
                round((CAST(sxy AS DOUBLE) / 1000000000000.0
                      - (CAST(a.sx AS DOUBLE) / 1000000.0) * (CAST(b.sx AS DOUBLE) / 1000000.0)
                        / n) / n, 9) AS cov
         FROM f JOIN d1 a ON f.i = a.i JOIN d1 b ON f.j = b.i
         ORDER BY i, j""",

    "q_quantize_embed" ->
      """WITH dv AS (
           SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS ma FROM dv),
         q AS (
           SELECT vec_id, round(ma / 127, 9) AS scale,
                  CASE WHEN ma > 0
                       THEN list_transform(v, x -> CAST(round(x / (ma / 127)) AS BIGINT))
                       ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS qv
           FROM m),
         e AS (SELECT vec_id, scale, qv, unnest(range(1, len(qv) + 1)) AS dim FROM q)
         SELECT vec_id, CAST(dim AS BIGINT) AS dim, qv[dim] AS qval, scale
         FROM e ORDER BY vec_id, dim""",

    // bloom prune + exact confirm == plain anti-join (no false negatives;
    // false positives recovered by the confirm join)
    "q_bloom_dedup" ->
      """WITH newd AS (
           SELECT doc_id, md5(text) AS content_hash FROM documents WHERE doc_id % 3 <> 0),
         seen AS (
           SELECT DISTINCT md5(text) AS content_hash FROM documents WHERE doc_id % 3 = 0),
         fresh AS (
           SELECT doc_id, content_hash FROM newd
           WHERE NOT EXISTS (
             SELECT 1 FROM seen s WHERE s.content_hash = newd.content_hash))
         SELECT min(doc_id) AS doc_id, content_hash
         FROM fresh GROUP BY content_hash ORDER BY 1""",

    "q_incremental_dedup" ->
      """WITH newd AS (
           SELECT doc_id, md5(text) AS content_hash FROM documents WHERE doc_id % 2 = 1),
         seen AS (
           SELECT DISTINCT md5(text) AS content_hash FROM documents WHERE doc_id % 2 = 0),
         fresh AS (
           -- NOT EXISTS with equality, not NOT IN: a NULL hash on the
           -- seen side must not empty the result, and a NULL-hash new
           -- doc survives — exactly Spark's left_anti null semantics
           SELECT doc_id, content_hash FROM newd
           WHERE NOT EXISTS (
             SELECT 1 FROM seen s WHERE s.content_hash = newd.content_hash))
         SELECT min(doc_id) AS doc_id, content_hash
         FROM fresh GROUP BY content_hash ORDER BY doc_id""",

    "q_semantic_dedup" -> {
      // mirrors Dedup.semanticDedup(k=8, iters=2, tau=0.4, subPlanes=8,
      // subProbes=2): block key = (cluster, sign-LSH bucket); the
      // lower-id side probes base + 1 lowest-margin flip (multi-probe)
      val dim = 64
      val subPlanes = 8
      val subProbes = 2
      import graft.functions.PortableHash.planeInts
      val pls = planeInts(subPlanes, graft.pipeline.Similarity.MaxDim)
      def proj(p: Int): String =
        s"list_sum(list_transform(range(1, len(v) + 1), i -> CAST(v[i] AS DOUBLE) * pl.p$p[i]))"
      val bucketExpr = (0 until subPlanes).map { p =>
        s"CASE WHEN ${proj(p)} >= 0 THEN ${1L << p} ELSE 0 END"
      }.mkString("(", "\n                + ", ")")
      val projUnion = (0 until subPlanes).map { p =>
        s"SELECT vec_id, $p AS j, ${proj(p)} AS pr FROM n, pl"
      }.mkString("\n           UNION ALL ")
      def norm(v: String) =
        s"sqrt(list_sum(list_transform(range(1, ${dim + 1}), i -> $v[i] * $v[i])))"
      s"""WITH ${planesCte(pls)},
         ${kmeansCtes(8, 2, dim)},
         ${kmeansAssign("af", "c2", dim)},
         n AS MATERIALIZED (SELECT vec_id, v, cl, ${norm("v")} AS nrm,
                      CAST($bucketExpr AS BIGINT) AS bucket
               FROM af, pl),
         pj AS ($projUnion),
         fl AS (
           SELECT vec_id, j,
                  row_number() OVER (PARTITION BY vec_id ORDER BY abs(pr), j) AS r
           FROM pj),
         ap AS (
           SELECT vec_id, v, cl, nrm, bucket FROM n
           UNION ALL
           SELECT n.vec_id, n.v, n.cl, n.nrm,
                  xor(n.bucket, CAST(pow(2, f.j) AS BIGINT)) AS bucket
           FROM n JOIN fl f ON f.vec_id = n.vec_id WHERE f.r <= ${subProbes - 1}),
         dups AS (
           SELECT b.vec_id, min(a.vec_id) AS dup_of
           FROM ap a JOIN n b
             ON a.cl = b.cl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
           WHERE a.nrm > 0 AND b.nrm > 0
             AND list_sum(list_transform(range(1, ${dim + 1}),
                   i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm) > 0.4
           GROUP BY b.vec_id)
         SELECT n.vec_id, n.cl AS cluster, d.dup_of, (d.dup_of IS NULL) AS keep
         FROM n LEFT JOIN dups d ON d.vec_id = n.vec_id
         ORDER BY n.vec_id"""
    },

    "q_ivf_kmeans" -> ivfKmeansOracleSql(k = 5, nlist = 8, nprobe = 2, iters = 2, dim = 64),

    "q_ivf_int8" -> ivfKmeansOracleSql(k = 5, nlist = 8, nprobe = 2, iters = 2, dim = 64, int8DvCte),

    "q_diversity_sample" -> {
      val score = graft.pipeline.Sampling.sqlHashScore("vec_id", "diversity")
      s"""WITH ${kmeansCtes(8, 2, 64)},
         ${kmeansAssign("af", "c2", 64)},
         sz AS (SELECT cl, count(*) AS n FROM af GROUP BY cl)
         SELECT af.vec_id, af.cl AS cluster,
                ($score < least(1.0, 16.0 / sz.n)) AS keep
         FROM af JOIN sz ON sz.cl = af.cl
         ORDER BY af.vec_id"""
    },

    "q_token_counts" -> {
      val bpe = graft.pipeline.TextAnalysis.BpePretokenPattern.replace("'", "''")
      s"""SELECT doc_id,
                CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS n_ws,
                CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_alnum,
                CAST(len(regexp_extract_all(text, '$bpe')) AS BIGINT) AS n_bpe
         FROM documents ORDER BY doc_id"""
    },

    "q_dup_spans" -> {
      import graft.functions.PortableHash.sqlHashMod
      val w = 5
      s"""WITH t AS (
           SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
           FROM documents),
         px AS (
           SELECT doc_id, ws, unnest(range(1, len(ws) - $w + 2)) AS pos FROM t),
         win AS (
           SELECT doc_id, pos,
                  ${sqlHashMod(s"array_to_string(ws[pos:pos+${w - 1}], ' ')")} AS h
           FROM px),
         dup AS (SELECT h FROM win GROUP BY h HAVING count(*) >= 2),
         dw AS (SELECT doc_id, pos FROM win JOIN dup USING (h)),
         isl AS (
           SELECT doc_id, pos,
                  CASE WHEN pos <= max(pos) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + $w
                       THEN 0 ELSE 1 END AS brk
           FROM dw),
         g AS (SELECT doc_id, pos,
                      sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
               FROM isl)
         SELECT doc_id, min(pos) AS span_start, max(pos) + ${w - 1} AS span_end,
                CAST(count(*) AS BIGINT) AS n_windows
         FROM g GROUP BY doc_id, grp ORDER BY doc_id, span_start"""
    },

    "q_lsh_multiprobe" -> {
      import graft.functions.PortableHash.planeInts
      val nPlanes = 8
      val nProbes = 3
      val pls = planeInts(nPlanes, graft.pipeline.Similarity.MaxDim)
      def proj(p: Int): String =
        s"list_sum(list_transform(range(1, len(v) + 1), i -> CAST(v[i] AS DOUBLE) * pl.p$p[i]))"
      val bucketExpr = (0 until nPlanes).map { p =>
        s"CASE WHEN ${proj(p)} >= 0 THEN ${1L << p} ELSE 0 END"
      }.mkString("(", "\n                + ", ")")
      // per-plane projections of the QUERY vectors only, long form — the
      // row_number over (abs(proj), bit) is the flip order
      val projUnion = (0 until nPlanes).map { p =>
        s"SELECT vec_id, $p AS j, ${proj(p)} AS pr FROM eb, pl WHERE vec_id < 10"
      }.mkString("\n           UNION ALL ")
      s"""WITH ${planesCte(pls)},
         eb AS (SELECT vec_id, embedding AS v FROM embeddings),
         cb AS MATERIALIZED (SELECT vec_id, v, CAST($bucketExpr AS BIGINT) AS bucket FROM eb, pl),
         q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM cb WHERE vec_id < 10),
         pj AS ($projUnion),
         fl AS (
           SELECT vec_id, j,
                  row_number() OVER (PARTITION BY vec_id ORDER BY abs(pr), j) AS r
           FROM pj),
         qp AS (
           SELECT query_id, qv, bucket FROM q
           UNION ALL
           SELECT q.query_id, q.qv, xor(q.bucket, CAST(pow(2, f.j) AS BIGINT)) AS bucket
           FROM q JOIN fl f ON f.vec_id = q.query_id WHERE f.r <= ${nProbes - 1}),
         s AS (
           SELECT query_id, c.vec_id,
             list_sum(list_transform(range(1, len(qv) + 1),
               i -> CAST(qv[i] AS DOUBLE) * CAST(c.v[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(range(1, len(qv) + 1),
                  i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
              * sqrt(list_sum(list_transform(range(1, len(c.v) + 1),
                  i -> CAST(c.v[i] AS DOUBLE) * CAST(c.v[i] AS DOUBLE))))) AS cos
           FROM cb c JOIN qp USING (bucket) WHERE c.vec_id <> query_id),
         r AS (
           SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
           FROM s)
         SELECT query_id, vec_id, round(cos, 6) AS cos_sim, CAST(rank AS BIGINT) AS rank
         FROM r WHERE rank <= 5 ORDER BY query_id, rank"""
    },

    "q_store_replace" ->
      """WITH oldv AS (
           SELECT user_id, date_trunc('day', ts) AS ts, round(avg(value), 6) AS value
           FROM events WHERE user_id IN (0, 2) AND event_type = 'view' GROUP BY 1, 2),
         newv AS (
           SELECT user_id, date_trunc('day', ts) AS ts, round(avg(value) * 2, 6) AS value
           FROM events WHERE user_id = 1 AND event_type = 'purchase' GROUP BY 1, 2)
         SELECT user_id, ts, value FROM oldv
         UNION ALL SELECT user_id, ts, value FROM newv
         ORDER BY user_id, ts""",

    "q_store_update" ->
      """WITH oldv AS (
           SELECT user_id, date_trunc('day', ts) AS ts, round(avg(value), 6) AS value
           FROM events WHERE user_id IN (0, 1, 2) AND event_type = 'view' GROUP BY 1, 2),
         newv AS (
           SELECT date_trunc('day', ts) AS ts, round(avg(value) * 3, 6) AS value
           FROM events WHERE user_id = 1 AND event_type = 'purchase' GROUP BY 1),
         -- update = new.combine_first(existing) on user 1: new wins on
         -- overlapping days, old fills elsewhere, new-only days append
         u1 AS (
           SELECT 1 AS user_id, COALESCE(n.ts, o.ts) AS ts,
                  COALESCE(n.value, o.value) AS value
           FROM (SELECT ts, value FROM oldv WHERE user_id = 1) o
           FULL JOIN newv n ON n.ts = o.ts)
         SELECT user_id, ts, value FROM oldv WHERE user_id <> 1
         UNION ALL SELECT CAST(user_id AS BIGINT) AS user_id, ts, value FROM u1
         ORDER BY user_id, ts""",

    // wire-parity round-trips are lossless, so the oracle is the identity
    "q_feather_roundtrip" ->
      """SELECT user_id, 'prm_' || user_id AS name, ts, round(value, 4) AS value
         FROM events WHERE user_id < 8
         ORDER BY user_id, ts""",

    "q_blob_roundtrip" ->
      """SELECT user_id, ts, round(value, 4) AS value
         FROM events WHERE user_id < 8
         ORDER BY user_id, ts"""
  )

  /** Nearest-centroid assignment CTE (squared euclidean, (dist, cl)
    * tie-break): `keep = 1` is k-means/corpus cell assignment, `keep > 1`
    * is the IVF probe ranking; `where` filters the assigned side.
    */
  private def kmeansAssign(
      name: String, cents: String, dim: Int, keep: Int = 1, where: String = ""): String =
    s"""$name AS (
         SELECT vec_id, v, cl, dist FROM (
           SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS r FROM (
             SELECT d.vec_id, d.v, c.cl,
                    list_sum(list_transform(range(1, ${dim + 1}),
                      i -> (d.v[i] - c.cent[i]) * (d.v[i] - c.cent[i]))) AS dist
             FROM dv d CROSS JOIN $cents c$where))
         WHERE r <= $keep)"""

  /** Unrolled Lloyd's-iteration CTE chain (no leading WITH) — mirrors
    * [[graft.pipeline.Clustering.kmeansCentroids]] exactly: md5-ordered
    * init, squared-euclidean argmin with cluster-id tie-break,
    * per-dimension means rounded to 6 decimals, empty clusters keeping
    * their previous centroid. Ends at centroid table `c<iters>(cl, cent)`
    * — shared by the `q_kmeans` and `q_ivf_kmeans` oracles.
    */
  /** Default `dv` CTE: double-cast float embeddings. */
  private val floatDvCte: String =
    """dv AS (
           SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings)"""

  /** `dv` CTE for the int8-quantized space ([[graft.pipeline.Similarity.quantizeInt8]]
    * twin): the kmeans chain and everything downstream then run on the
    * integer-valued vectors, mirroring the `ivfTopKInt8` composition.
    */
  private val int8DvCte: String =
    """qz_dv AS (
           SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v0
           FROM embeddings),
         qz_ma AS (SELECT vec_id, v0, list_max(list_transform(v0, x -> abs(x))) AS ma FROM qz_dv),
         dv AS (
           SELECT vec_id,
                  CASE WHEN ma > 0 THEN list_transform(v0, x -> round(x / (ma / 127)))
                       ELSE list_transform(v0, x -> 0.0) END AS v
           FROM qz_ma)"""

  /** Shared CTE chain of the DSIR twins (q_dsir_scores / q_dsir_sample):
    * hashed uni+bigram feature buckets (MATERIALIZED — feeds the raw
    * counts, target counts, totals, AND per-doc counts), Laplace-smoothed
    * per-bucket log-ratios quantized to integer micro-units, per-doc
    * integer score sums. Mirrors Curation.featureBuckets/dsirLogRatios/
    * dsirScores with target = the doc_id%7==0 slice and B = 4096.
    */
  /** Unrolled logistic-regression training (Classifier.trainLogReg
    * twin): hashed uni+bigram buckets (B=256, the DSIR feature
    * machinery) plus the intercept bucket 256 (hit once per doc),
    * per-doc residuals quantized to integer micro-units, HUGEINT
    * gradient sums, weight updates rounded to micro-units — the same
    * exact-integer arithmetic Spark runs, so the learned weights match
    * bit for bit. `iters` GD steps are emitted as unrolled CTE blocks;
    * the final weights CTE is always `wf`.
    */
  private def logregCtes(iters: Int, lr: Double, B: Int = 256): String = {
    import graft.functions.PortableHash.{sqlHashMod, P}
    val header = s"""d0 AS (
           SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
           FROM documents),
         h0 AS (
           SELECT doc_id, list_transform(toks, t -> ${sqlHashMod("t")}) AS hs
           FROM d0),
         f0 AS (
           SELECT doc_id,
                  list_concat(hs,
                    CASE WHEN len(hs) >= 2
                         THEN list_transform(range(1, len(hs)),
                                i -> (hs[i] * 31 + hs[i + 1]) % $P)
                         ELSE CAST([] AS BIGINT[]) END) AS feats
           FROM h0),
         fb AS (SELECT doc_id, (f % $B) AS b
                FROM (SELECT doc_id, unnest(feats) AS f FROM f0)),
         -- bucket $B is the intercept: one hit per document
         pd AS MATERIALIZED (
           SELECT doc_id, b, count(*) AS cnt FROM fb GROUP BY 1, 2
           UNION ALL SELECT doc_id, $B AS b, 1 AS cnt FROM documents),
         lab AS (SELECT doc_id, CASE WHEN n_chars >= 250 THEN 1.0 ELSE 0.0 END AS y
                 FROM documents),
         nn AS (SELECT count(*) AS n FROM documents)"""
    val steps = (1 to iters).map { k =>
      val resid =
        if (k == 1)
          s"""r1 AS (SELECT doc_id, CAST(round((0.5 - y) * 1e6) AS BIGINT) AS rm FROM lab)"""
        else
          s"""m$k AS (SELECT pd.doc_id,
                       CAST(sum(CAST(pd.cnt AS HUGEINT) * w${k - 1}.w) AS DOUBLE) / 1e6 AS m
                FROM pd JOIN w${k - 1} USING (b) GROUP BY pd.doc_id),
         r$k AS (SELECT lab.doc_id,
                       CAST(round((round(1.0 / (1.0 + exp(-(coalesce(m, 0.0)))), 6) - y)
                                  * 1e6) AS BIGINT) AS rm
                FROM lab LEFT JOIN m$k ON m$k.doc_id = lab.doc_id)"""
      val update =
        if (k == 1)
          s"""w1 AS MATERIALIZED (
           SELECT b, 0 - CAST(round($lr * CAST(g AS DOUBLE) / n) AS BIGINT) AS w
           FROM g1 CROSS JOIN nn)"""
        else
          s"""w$k AS MATERIALIZED (
           SELECT w${k - 1}.b, w${k - 1}.w - CAST(round($lr * CAST(g$k.g AS DOUBLE) / n) AS BIGINT) AS w
           FROM w${k - 1} JOIN g$k ON w${k - 1}.b = g$k.b CROSS JOIN nn)"""
      s"""$resid,
         g$k AS (SELECT b, sum(CAST(pd.cnt AS HUGEINT) * rm) AS g
                FROM pd JOIN r$k USING (doc_id) GROUP BY b),
         $update"""
    }.mkString(",\n         ")
    s"""$header,
         $steps,
         wf AS (SELECT * FROM w$iters)"""
  }

  private lazy val dsirCtes: String = {
    import graft.functions.PortableHash.{sqlHashMod, P}
    s"""d0 AS (
           SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
           FROM documents),
         -- ONE md5 per token; the bigram hash derives arithmetically
         -- ((h1*31 + h2) mod P), mirroring Curation.featureBuckets
         h0 AS (
           SELECT doc_id, list_transform(toks, t -> ${sqlHashMod("t")}) AS hs
           FROM d0),
         f0 AS (
           SELECT doc_id,
                  list_concat(hs,
                    CASE WHEN len(hs) >= 2
                         THEN list_transform(range(1, len(hs)),
                                i -> (hs[i] * 31 + hs[i + 1]) % $P)
                         ELSE CAST([] AS BIGINT[]) END) AS feats
           FROM h0),
         fb AS MATERIALIZED (
           SELECT doc_id, (f % 4096) AS b
           FROM (SELECT doc_id, unnest(feats) AS f FROM f0)),
         cc AS (SELECT b, count(*) AS cq FROM fb GROUP BY b),
         tc AS (SELECT b, count(*) AS cp FROM fb WHERE doc_id % 7 = 0 GROUP BY b),
         tot AS (SELECT (SELECT count(*) FROM fb) AS tq,
                        (SELECT count(*) FROM fb WHERE doc_id % 7 = 0) AS tp),
         lam AS (
           SELECT cc.b,
                  CAST(round((ln(CAST(coalesce(cp, 0) + 1 AS DOUBLE) / (tp + 4096))
                            - ln(CAST(cq + 1 AS DOUBLE) / (tq + 4096))) * 1000000.0) AS BIGINT)
                    AS lam_micro
           FROM cc LEFT JOIN tc ON cc.b = tc.b CROSS JOIN tot),
         pd AS (SELECT doc_id, b, count(*) AS n FROM fb GROUP BY 1, 2),
         sc AS (
           SELECT doc_id, sum(n * lam_micro) AS s_micro, sum(n) AS nf
           FROM pd JOIN lam ON pd.b = lam.b GROUP BY doc_id)"""
  }

  private def kmeansCtes(k: Int, iters: Int, dim: Int): String =
    kmeansCtes(k, iters, dim, floatDvCte)

  private def kmeansCtes(k: Int, iters: Int, dim: Int, dvCte: String): String = {
    def update(aName: String, prevC: String, mName: String, cName: String): String = {
      val meanCols = (1 to dim).map(i => s"round(avg(v[$i]), 6) AS d$i").mkString(", ")
      val centList = (1 to dim).map(i => s"m.d$i").mkString("[", ", ", "]")
      s"""$mName AS (SELECT cl, $meanCols FROM $aName GROUP BY cl),
         $cName AS (
           SELECT c.cl, CASE WHEN m.cl IS NULL THEN c.cent ELSE $centList END AS cent
           FROM $prevC c LEFT JOIN $mName m ON m.cl = c.cl)"""
    }
    val iterCtes = (0 until iters).map { i =>
      kmeansAssign(s"a$i", s"c$i", dim) + ",\n         " +
        update(s"a$i", s"c$i", s"m$i", s"c${i + 1}")
    }.mkString(",\n         ")
    s"""$dvCte,
         c0 AS (
           SELECT CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS BIGINT) AS cl,
                  v AS cent
           FROM (SELECT vec_id, v FROM dv
                 ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $k)),
         $iterCtes"""
  }

  private def kmeansOracleSql(k: Int, iters: Int, dim: Int): String =
    s"""WITH ${kmeansCtes(k, iters, dim)},
         ${kmeansAssign("af", s"c$iters", dim)}
         SELECT vec_id, cl AS cluster, round(dist, 6) AS dist
         FROM af ORDER BY vec_id"""

  /** Trained-IVF oracle: k-means codebook CTEs + corpus cell assignment
    * + nprobe query cells + exact cosine inside probed cells — mirrors
    * [[graft.pipeline.Similarity.ivfTopKTrained]].
    */
  private def ivfKmeansOracleSql(
      k: Int, nlist: Int, nprobe: Int, iters: Int, dim: Int): String =
    ivfKmeansOracleSql(k, nlist, nprobe, iters, dim, floatDvCte)

  private def ivfKmeansOracleSql(
      k: Int, nlist: Int, nprobe: Int, iters: Int, dim: Int, dvCte: String): String = {
    def norm(v: String) =
      s"sqrt(list_sum(list_transform(range(1, ${dim + 1}), i -> $v[i] * $v[i])))"
    s"""WITH ${kmeansCtes(nlist, iters, dim, dvCte)},
         ${kmeansAssign("ca", s"c$iters", dim)},
         cn AS (SELECT vec_id, v, cl AS cell, ${norm("v")} AS n FROM ca),
         ${kmeansAssign("qa", s"c$iters", dim, keep = nprobe, where = " WHERE d.vec_id < 10")},
         qn AS (SELECT vec_id AS query_id, v AS qv, cl AS cell, ${norm("v")} AS qn FROM qa),
         scored AS (
           SELECT q.query_id, c.vec_id,
                  list_sum(list_transform(range(1, ${dim + 1}),
                    i -> q.qv[i] * c.v[i])) / (q.qn * c.n) AS cos
           FROM cn c JOIN qn q USING (cell)
           WHERE c.vec_id <> q.query_id),
         r AS (
           SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
           FROM scored)
         SELECT query_id, vec_id, round(cos, 6) AS cos_sim, CAST(rank AS BIGINT) AS rank
         FROM r WHERE rank <= $k ORDER BY query_id, rank"""
  }
}
