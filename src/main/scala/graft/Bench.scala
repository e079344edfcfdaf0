package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query seconds at
  * SPARK_GRAFT_SF_DIR. Noise discipline (this VM shows 6x wall-clock
  * variance between identical runs): each query runs `SPARK_GRAFT_REPS`
  * times (default 3) and reports the MINIMUM — the min is the least
  * contention-biased estimator of true cost. Reps are INTERLEAVED
  * round-robin (rep 1 of every query, then rep 2, ...) so a multi-minute
  * contention burst on the host cannot cover all reps of any one query —
  * with back-to-back reps, round 3's driver run recorded min-of-3 times
  * 40x the quiet cost because one burst spanned the whole triple.
  * Failures are NOT swallowed:
  * a failing query is reported with value -1 in the JSON and the process
  * exits non-zero, so a broken query can never read as a fast pass.
  * A `floor_ms` host-sanity metric (median of 5 trivial 1M-row range
  * sums) is emitted so a contention-garbage run is recognizable from the
  * JSON alone.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
    // Harness runs LAZY stages (r17 lazy-demotion campaign): the eager
    // matHot counts that fixed the r15 cross-job AQE double-build now cost
    // more than the rebuilds they prevent — native one-pass expressions
    // made every stage cheap to build, so the A/B (GRAFT_STAGE_EAGER=1 vs
    // 0, full 121-query bench) read cold 54.1 vs 50.9 s and warm 43.2 vs
    // 41.6 s with zero per-query regressions. Eager mode remains opt-in
    // (GRAFT_STAGE_EAGER=1) for long-lived servers.
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      // AQE sizing over raw parallelism: the default parallelismFirst
      // splinters small shuffles into one tiny task per core, which at
      // bench scale is pure scheduler overhead and at cluster scale is
      // the anti-pattern the Spark tuning guide tells you to turn off
      // ("it's recommended to set this config to false and respect the
      // configured target size")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("GRAFT_AQE_PARALLELISM_FIRST", "false"))
      // (r17 A/B: shuffle/cache compression OFF measured no change at
      // sf0.1 — 52.56 vs 52.68 s cold — so the cluster defaults stay)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup: touch every table once (OS page cache + codegen/JIT paths)
    // so the first measured query doesn't pay session cold-start.
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => }
    }
    try SparkEntry.queries.head._2(spark, sfDir).count() catch { case _: Throwable => }

    def floorMs(): Double = {
      val samples = (0 until 5).map { _ =>
        val t0 = System.nanoTime()
        spark.range(1000000L).selectExpr("sum(id)").collect()
        (System.nanoTime() - t0) / 1e6
      }.sorted
      samples(2) // median
    }
    val floorBefore = floorMs()

    // Per-query shuffle-spill bytes (memory + disk), so a slow outlier in
    // the round artifact is diagnosable as contention (no spill) vs
    // memory pressure (spill) without re-running. Task-end events are
    // delivered async, so attribution is approximate at the rep boundary
    // (a tail task of query N can land in N+1's window) — fine for a
    // diagnostic; the reported number is the MAX across reps because
    // spill in any rep is the signal.
    val spillAcc = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) spillAcc.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      }
    })

    // optional subset (comma-separated names) for local stress runs
    // (SCALE.md sf1 exponents); the driver's full run leaves it unset
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val queries = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val samples = collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    val spills = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    // Row-stability guard (r17, the lazy-stage campaign): every query is
    // deterministic, so its row count must be IDENTICAL across reps. A
    // drifting count means a concurrency bug (the cross-thread lazy-cache
    // race Verify documents) leaked into this sequential harness — that
    // rep's time is a lie, so the query is marked failed, not just flaky.
    val rowCounts = collection.mutable.Map.empty[String, Long]
    val unstable = collection.mutable.Set.empty[String]
    (0 until reps).foreach { _ =>
      queries.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        val s0 = spillAcc.get()
        var cleaned = false
        try {
          val rows = fn(spark, sfDir).count()
          rowCounts.get(name) match {
            case Some(prev) if prev != rows =>
              unstable += name
              System.err.println(s"[bench] $name ROW COUNT UNSTABLE: $prev then $rows")
            case _ => rowCounts(name) = rows
          }
          // stage-cold discipline: with GRAFT_STAGE_CACHE=0 this drops
          // every stage the query persisted, INSIDE the timed window, so
          // the next query recomputes its stages and this query is
          // charged for its own cleanup; no-op in the default config
          StageCache.endQuery()
          cleaned = true
          samples(name) = ((System.nanoTime() - t0) / 1e9) :: samples(name)
          spills(name) = math.max(spills(name), spillAcc.get() - s0)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
        } finally {
          // a FAILED query must not leave its persisted stages behind to
          // silently warm the next query's cold window (this path is
          // untimed — the failure already voids the sample)
          if (!cleaned) try StageCache.endQuery() catch { case _: Throwable => () }
        }
      }
    }
    var failed = List.empty[String]
    var flaky  = List.empty[String] // succeeded at least once but not every rep
    var repOk  = Map.empty[String, Int]
    // keep declaration order (the ordered `queries` Seq) in the JSON so
    // run-to-run diffs of bench_last.json are stable, not hash-ordered
    val results = queries.map { case (name, _) =>
      val times = samples(name)
      repOk += name -> times.length
      if (times.isEmpty || unstable(name)) { failed ::= name; name -> -1.0 }
      else {
        // an intermittent failure must surface, not dissolve into the min
        if (times.length < reps) flaky ::= name
        name -> times.min
      }
    }
    // Floor re-check: a floor above ~150 ms means host contention was
    // active around the run. Retry once (the burst may have passed);
    // if it persists, stamp the artifact "noisy" so a contention-poisoned
    // run (like BENCH_r04's 40x outliers) can never masquerade as a code
    // regression in round-over-round comparison.
    val NoisyFloorMs = 150.0
    var floorAfter = floorMs()
    if (math.min(floorBefore, floorAfter) > NoisyFloorMs) {
      Thread.sleep(2000)
      floorAfter = floorMs()
    }
    val noisy = math.min(floorBefore, floorAfter) > NoisyFloorMs

    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val oks = queries.map { case (name, _) => s"\"" + name + "\":" + repOk(name) }
      .mkString("{", ",", "}")
    // only non-zero spills: the common all-zero case must not bloat the line
    val spillsJson = queries.collect { case (name, _) if spills(name) > 0 =>
      s"\"" + name + "\":" + spills(name)
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val rowsJson = queries.map { case (name, _) =>
      s"\"" + name + "\":" + rowCounts.getOrElse(name, -1L)
    }.mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"rep_ok":$oks,"rows":$rowsJson,"spill_bytes":$spillsJson,"sf":"$sfDir","reps":$reps,"n_queries":${queries.length},"floor_ms":${math.min(floorBefore, floorAfter)},"floor_ms_before":$floorBefore,"floor_ms_after":$floorAfter,"noisy":$noisy,"n_failed":${failed.length},"n_flaky":${flaky.length},"full":"bench_last.json"}"""
    // The SAME full line goes to the file and to stdout (r22, VERDICT r21
    // #2): the driver's parser recorded `parsed: null` for EVERY round —
    // including r20/r21 where the compact ~65-query line was fully
    // visible in the captured tail — so the truncated `queries` map (and
    // the sbt "[info] " logger prefix, removed via build.sbt's
    // run/outputStrategy := StdoutOutput) are the remaining parse
    // breakers. The machine-readable contract is ONE stdout line whose
    // `queries` carries ALL queries, schema-identical to
    // bench_last.json's `queries` map. Every historical key is kept
    // (floor_ms = min of before/after, as the compact line reported).
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_last.json"),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Throwable => }
    println(line)
    spark.stop()
    if (flaky.nonEmpty)
      System.err.println(s"[bench] ${flaky.length} queries passed only some reps: ${flaky.reverse.mkString(", ")}")
    if (failed.nonEmpty) {
      System.err.println(s"[bench] ${failed.length} queries FAILED: ${failed.reverse.mkString(", ")}")
      sys.exit(1)
    }
  }
}
