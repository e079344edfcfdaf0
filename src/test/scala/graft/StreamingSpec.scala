package graft

import graft.streaming.StreamIngest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def writeSource(): String = {
    val dir = java.nio.file.Files.createTempDirectory("stream-src").toString + "/data"
    val t0 = java.time.LocalDateTime.parse("2024-01-01T00:00")
    def ts(i: Int) = java.sql.Timestamp.valueOf(t0.plusMinutes(i.toLong))
    val rows = (0 until 120).map(i => ("k" + (i % 2), ts(i),
      if (i % 10 == 0) None else Some(i.toDouble))) :+
      (("k1", ts(5), Some(99.0))) // true duplicate of (k1, minute 5)
    rows.toDF("key", "ts", "value").write.parquet(dir)
    dir
  }

  // TimestampType, not NTZ — watermarks require TIMESTAMP event time.
  private val srcSchema = StructType(Seq(
    StructField("key", StringType), StructField("ts", TimestampType),
    StructField("value", DoubleType)))

  test("windowed stats over a parquet-backed stream (watermark + tumbling window)") {
    val dir = writeSource()
    val stream = spark.readStream.schema(srcSchema).parquet(dir)
    val agg = StreamIngest.windowedStats(stream, Seq("key"), "1 hour")
    val q = StreamIngest.runToMemory(agg, "win_stats")
    try {
      val out = spark.table("win_stats").orderBy("key", "window.start").collect()
      assert(out.length === 4) // 2 keys × 2 hours
      // k0 hour 0: even minutes 0..58 → 30 rows, minus nulls at 0,10,..,50 → 24
      val k0h0 = out.head
      assert(k0h0.getAs[Long]("n") === 24)
    } finally q.stop()
  }

  test("streaming dedup drops same-(key,ts) duplicates within the watermark") {
    val dir = writeSource()
    val stream = spark.readStream.schema(srcSchema).parquet(dir)
    val dd = StreamIngest.dedupStream(stream, Seq("key"))
    val q = StreamIngest.runToMemory(dd, "dedup_out", OutputMode.Append())
    try {
      val n = spark.table("dedup_out").count()
      assert(n === 120) // 121 rows in, 1 duplicate (key,ts) dropped
    } finally q.stop()
  }

  test("contentDedupStream drops re-crawls of the same body at different event times") {
    val dir = tmpDir("stream_cd")
    val t0 = java.time.LocalDateTime.parse("2024-01-01T00:00")
    def ts(i: Int) = java.sql.Timestamp.valueOf(t0.plusMinutes(i.toLong))
    // same text arrives at minutes 0, 3, 7 (inside the horizon) → 1 kept;
    // distinct texts at any time all survive
    Seq(
      ("a", ts(0), "the quick brown fox"),
      ("b", ts(3), "the quick brown fox"),
      ("c", ts(7), "the quick brown fox"),
      ("d", ts(1), "an entirely different doc"),
      ("e", ts(9), "a third body")).toDF("id", "ts", "text").write.parquet(dir)
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("ts", TimestampType),
      StructField("text", StringType)))
    val stream = spark.readStream.schema(schema).parquet(dir)
    val dd = StreamIngest.contentDedupStream(stream, "text", watermarkDelay = "10 minutes")
    val q = StreamIngest.runToMemory(dd, "content_dedup_out", OutputMode.Append())
    try {
      val out = spark.table("content_dedup_out").collect()
      assert(out.length === 3) // one per distinct body
      assert(out.map(_.getAs[String]("content_hash")).distinct.length === 3)
    } finally q.stop()
  }

  test("continuous ingest into a ChunkStore: batches merge, overlap upserts") {
    val dir = java.nio.file.Files.createTempDirectory("ingest-src").toString + "/data"
    val t0 = java.time.LocalDateTime.parse("2024-01-01T00:00")
    def ts(i: Int) = java.sql.Timestamp.valueOf(t0.plusHours(i.toLong))
    // batch 1: hours 0..5 value 1.0
    (0 until 6).map(i => ("s1", ts(i), 1.0)).toDF("kind", "ts", "value")
      .write.parquet(dir)
    val store = new graft.store.ChunkStore(spark, tmpDir("ingest-store"),
      StructType(Seq(StructField("kind", StringType))),
      graft.store.StoreConfig(freq = "1h", tz = "UTC", chunkAxis = graft.store.YearMonthAxis))
    val ckpt = java.nio.file.Files.createTempDirectory("ingest-ckpt").toString
    val schema = StructType(Seq(
      StructField("kind", StringType), StructField("ts", TimestampType),
      StructField("value", DoubleType)))
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = StreamIngest.ingestToStore(stream, store, ckpt)
    try {
      q.processAllAvailable()
      assert(store.getTs(Map("kind" -> "s1")).count() === 6)
      // batch 2 arrives: overlapping hours 3..8 value 2.0 → upsert wins
      (3 until 9).map(i => ("s1", ts(i), 2.0)).toDF("kind", "ts", "value")
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
      val out = store.getTs(Map("kind" -> "s1")).orderBy("ts").collect()
      assert(out.length === 9)
      assert(out.map(_.getDouble(1)).toSeq === Seq(1.0, 1.0, 1.0, 2.0, 2.0, 2.0, 2.0, 2.0, 2.0))
    } finally q.stop()
  }

  test("mapGroupsWithState running summary matches batch aggregate") {
    val dir = writeSource()
    val stream = spark.readStream.schema(srcSchema).parquet(dir)
    val pts = StreamIngest.normalize(stream).as[StreamIngest.Point]
    val q = StreamIngest.runToMemory(
      StreamIngest.runningSummary(pts).toDF(), "running", OutputMode.Update())
    try {
      // last update per key == full-batch aggregate
      val batch = spark.read.schema(srcSchema).parquet(dir)
        .filter(col("value").isNotNull)
        .groupBy("key").agg(count(lit(1)).as("n"), sum("value").as("sum"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      val streamed = spark.table("running").orderBy(col("n").desc).collect()
        .groupBy(_.getString(0)).map { case (k, rows) => k -> rows.head }
      streamed.foreach { case (k, row) =>
        assert(row.getLong(1) === batch(k)._1, s"count mismatch for $k")
        assert(math.abs(row.getDouble(2) - batch(k)._2) < 1e-9, s"sum mismatch for $k")
      }
    } finally q.stop()
  }

  test("flatMapGroupsWithState gap monitor flags deltas over the expected frequency") {
    // k0: points every 2 min with one 10-min hole; k1: regular, no holes
    val dir = java.nio.file.Files.createTempDirectory("gap-src").toString + "/data"
    val t0 = java.time.LocalDateTime.parse("2024-01-01T00:00")
    def ts(i: Int) = java.sql.Timestamp.valueOf(t0.plusMinutes(i.toLong))
    // duplicate ts(4) point: the monotonic-state guard must drop it, not
    // re-alert or stall the watermark timestamp
    val k0 = Seq(0, 2, 4, 4, 14, 16).map(i => ("k0", ts(i), Some(i.toDouble)))
    val k1 = (0 until 10).map(i => ("k1", ts(2 * i), Some(i.toDouble)))
    (k0 ++ k1).toDF("key", "ts", "value").write.parquet(dir)
    val stream = spark.readStream.schema(srcSchema).parquet(dir)
    val pts = StreamIngest.normalize(stream).as[StreamIngest.Point]
    val q = StreamIngest.runToMemory(
      StreamIngest.gapMonitor(pts, expectedEverySecs = 120L).toDF(),
      "gaps", OutputMode.Append())
    try {
      val alerts = spark.table("gaps").collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      assert(alerts.toSeq === Seq(("k0", ts(4), ts(14), 600L)))
    } finally q.stop()
  }

  test("session_window sessionization splits on event-time gaps") {
    val dir = java.nio.file.Files.createTempDirectory("sess-src").toString + "/data"
    val t0 = java.time.LocalDateTime.parse("2024-01-01T00:00")
    def ts(i: Int) = java.sql.Timestamp.valueOf(t0.plusMinutes(i.toLong))
    // k0: two sessions (0-10 contiguous, then a 60-min gap, then 70-75)
    val rows = Seq(0, 5, 10, 70, 75).map(i => ("k0", ts(i), Some(1.0)))
    rows.toDF("key", "ts", "value").write.parquet(dir)
    val stream = spark.readStream.schema(srcSchema).parquet(dir)
    val q = StreamIngest.runToMemory(
      StreamIngest.sessionStats(stream, Seq("key"), gap = "30 minutes"),
      "sessions")
    try {
      val sessions = spark.table("sessions").orderBy("session_start").collect()
        .map(r => (r.getTimestamp(1), r.getTimestamp(2), r.getLong(3), r.getDouble(4)))
      assert(sessions.length === 2)
      assert(sessions(0) === ((ts(0), new java.sql.Timestamp(ts(10).getTime + 30 * 60000), 3L, 3.0)))
      assert(sessions(1)._3 === 2L)
    } finally q.stop()
  }

  test("dupWindowMonitor: repeated content alerts from the second occurrence on") {
    val dir = java.nio.file.Files.createTempDirectory("dupwin-src").toString + "/data"
    val phrase = "alpha beta gamma delta epsilon zeta" // 6 tokens, w=5 -> 2 windows
    val t0 = java.time.LocalDateTime.parse("2024-01-01T00:00")
    def ts(i: Int) = java.sql.Timestamp.valueOf(t0.plusMinutes(i.toLong))
    // batch 1: the phrase once + an unrelated doc -> no alerts
    Seq((1L, ts(0), phrase), (2L, ts(1), "totally different words in here ok"))
      .toDF("doc_id", "ts", "text").write.parquet(dir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("ts", TimestampType),
      StructField("text", StringType)))
    val alerts = StreamIngest.dupWindowMonitor(
      spark.readStream.schema(schema).parquet(dir), w = 5)
    val q = StreamIngest.runToMemory(alerts.toDF(), "dupwin", OutputMode.Append())
    try {
      assert(spark.table("dupwin").count() === 0) // first occurrences are silent
      // batch 2: doc 3 repeats the phrase -> both its windows alert with nSeen=2
      Seq((3L, ts(2), phrase)).toDF("doc_id", "ts", "text")
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
      val got = spark.table("dupwin").orderBy("pos")
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(got.toSeq === Seq((3L, 1L, 2L), (3L, 2L, 2L)))
    } finally q.stop()
  }

  test("nearDupMonitor: alerts carry the batch signature estimate and are a subset of batch pairs") {
    val dir = java.nio.file.Files.createTempDirectory("neardup-src").toString + "/data"
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = base + " tail words"
    val unrel = "completely unrelated vocabulary nothing shared here at all ever"
    val t0 = java.time.LocalDateTime.parse("2024-01-01T00:00")
    def ts(i: Int) = java.sql.Timestamp.valueOf(t0.plusMinutes(i.toLong))
    Seq((1L, ts(0), base), (2L, ts(1), unrel))
      .toDF("doc_id", "ts", "text").write.parquet(dir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("ts", TimestampType),
      StructField("text", StringType)))
    val alerts = StreamIngest.nearDupMonitor(
      spark.readStream.schema(schema).parquet(dir),
      n = 3, numHashes = 32, bands = 8, rowsPerBand = 4)
    val q = StreamIngest.runToMemory(alerts.toDF(), "neardup", OutputMode.Append())
    try {
      assert(spark.table("neardup").count() === 0) // nothing repeated yet
      Seq((3L, ts(2), near)).toDF("doc_id", "ts", "text")
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
      val got = spark.table("neardup").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
      assert(got.nonEmpty)
      // the batch operator over the same corpus: every streaming alert
      // pair must be a batch candidate pair with the SAME sig estimate
      val batch = graft.pipeline.Dedup.minhashLshPairs(
          Seq((1L, base), (2L, unrel), (3L, near)).toDF("doc_id", "text"),
          "doc_id", "text", n = 3, bands = 8, rowsPerBand = 4,
          minSim = 0.0, maxBandDf = 1000L)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      got.foreach { case (a, b, est) =>
        val pair = (math.min(a, b), math.max(a, b))
        assert(batch.contains(pair), s"streaming pair $pair not a batch candidate")
        assert(math.abs(batch(pair) - est) < 1e-12, s"estimate drift on $pair")
      }
      // the near-dup pair is found, repeatedly (once per shared band)
      assert(got.exists { case (a, b, est) => Set(a, b) === Set(1L, 3L) && est > 0.4 })
      assert(!got.exists { case (a, b, _) => Set(a, b) === Set(1L, 2L) })
    } finally q.stop()
  }

  test("nearDupMonitor: a hot band bucket flips silent at the cap (batch hot-band analogue)") {
    val dir = java.nio.file.Files.createTempDirectory("neardup-hot").toString + "/data"
    val boiler = "identical boilerplate text repeated across many documents verbatim"
    val t0 = java.time.LocalDateTime.parse("2024-01-01T00:00")
    def ts(i: Int) = java.sql.Timestamp.valueOf(t0.plusMinutes(i.toLong))
    (1 to 10).map(i => (i.toLong, ts(i), boiler))
      .toDF("doc_id", "ts", "text").write.parquet(dir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("ts", TimestampType),
      StructField("text", StringType)))
    val alerts = StreamIngest.nearDupMonitor(
      spark.readStream.schema(schema).parquet(dir),
      n = 3, numHashes = 32, bands = 8, rowsPerBand = 4, maxBucket = 3)
    val q = StreamIngest.runToMemory(alerts.toDF(), "neardup_hot", OutputMode.Append())
    try {
      val got = spark.table("neardup_hot").collect().map(r => (r.getLong(0), r.getLong(1)))
      // identical text -> identical signature -> all 8 bands share one
      // bucket; docs 2..4 alert against the 1..3 already stored, doc 4
      // overflows the cap (3) so docs 5+ are silent: 8 x (1+2+3) alerts
      assert(got.length === 8 * 6, s"got ${got.length}")
      assert(got.map(_._1).max === 4L)
    } finally q.stop()
  }

  test("stream-static enrichment joins a snapshot; missing keys survive with NULL") {
    val dir = writeSource() // keys k0/k1
    val stream = spark.readStream.schema(srcSchema).parquet(dir)
    val snapshot = Seq(("k0", 100.0)).toDF("key", "ref_level") // k1 absent
    val enriched = StreamIngest.enrichWithSnapshot(
      StreamIngest.normalize(stream), snapshot, Seq("key"), Seq("ref_level"))
    val q = StreamIngest.runToMemory(enriched, "enriched", OutputMode.Append())
    try {
      val rows = spark.table("enriched")
        .groupBy("key").agg(count(lit(1)).as("n"), max("ref_level").as("ref"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), Option(r.get(2)))).toMap
      assert(rows("k0")._2 === Some(100.0))
      assert(rows("k1")._2 === None)   // left join keeps unmatched keys
      assert(rows("k0")._1 > 0 && rows("k1")._1 > 0)
    } finally q.stop()
  }

  test("heavy-hitters monitor: Misra-Gries bounds hold against exact batch counts") {
    // skewed corpus: "hot" dominates, a tail of rare terms churns the
    // summaries; stream it in several files (= several micro-batches)
    val dir = java.nio.file.Files.createTempDirectory("hh-src").toString + "/data"
    val docs = (0 until 60).map { i =>
      val tail = s"rare${i % 17} rare${(i * 7) % 23} x${i}"
      (i.toLong, ("hot " * 8) + ("warm " * 3) + tail)
    }
    docs.grouped(20).zipWithIndex.foreach { case (chunk, part) =>
      chunk.toDF("doc_id", "text").write.mode("append").parquet(dir)
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema).parquet(dir)
    val k = 8
    val numShards = 4
    val q = StreamIngest.runToMemory(
      StreamIngest.heavyHittersMonitor(stream, k = k, numShards = numShards).toDF(),
      "hh", OutputMode.Update())
    try {
      // exact per-term counts + each term's shard and per-shard totals
      import graft.functions.PortableHash
      val exactDf = spark.read.schema(schema).parquet(dir)
        .select(explode(graft.pipeline.TextAnalysis.tokens(lower(col("text")))).as("term"))
        .withColumn("shard", pmod(PortableHash.hashMod(col("term")), lit(numShards.toLong)).cast("int"))
      val exact = exactDf.groupBy("shard", "term").count().collect()
        .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
      val shardTotals = exact.groupBy(_._1._1).map { case (sh, m) => sh -> m.values.sum }
      // final summary = last update per (shard, term)
      val rows = spark.table("hh").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      val finalRows = rows.zipWithIndex
        .groupBy { case ((sh, t, _), _) => (sh, t) }
        .map { case (key, vs) => key -> vs.maxBy(_._2)._1._3 }
      finalRows.foreach { case ((sh, t), c) =>
        val f = exact((sh, t))
        val n = shardTotals(sh)
        assert(c <= f, s"MG overestimated $t in shard $sh: $c > $f")
        assert(c >= f - n / (k + 1) - 1, s"MG bound violated for $t in shard $sh")
      }
      // the frequent-items guarantee: any term with f > n_shard/(k+1)
      // must be resident in the final summary
      exact.foreach { case ((sh, t), f) =>
        if (f > shardTotals(sh) / (k + 1))
          assert(finalRows.contains((sh, t)), s"frequent term $t missing from shard $sh")
      }
      // the dominant term is present with a large count
      assert(finalRows.exists { case ((_, t), c) => t == "hot" && c > 0 })
    } finally q.stop()
  }

  test("cusum monitor: sustained shift alarms then resets; stable series stays quiet") {
    val dir = java.nio.file.Files.createTempDirectory("cusum-src").toString + "/data"
    val t0 = java.time.LocalDateTime.parse("2024-01-01T00:00")
    def ts(i: Int) = java.sql.Timestamp.valueOf(t0.plusMinutes(i.toLong))
    // k0: level 10 then a sustained shift to 14 (drift 3/pt after slack);
    // k1: stays at the reference level, never alarms
    val k0 = (0 until 5).map(i => ("k0", ts(i), Some(10.0))) ++
             (5 until 12).map(i => ("k0", ts(i), Some(14.0)))
    val k1 = (0 until 12).map(i => ("k1", ts(i), Some(10.0)))
    (k0 ++ k1).toDF("key", "ts", "value").write.parquet(dir)
    val stream = spark.readStream.schema(srcSchema).parquet(dir)
    val pts = StreamIngest.normalize(stream).as[StreamIngest.Point]
    val q = StreamIngest.runToMemory(
      StreamIngest.cusumMonitor(pts, mean = 10.0, slack = 1.0, threshold = 8.0).toDF(),
      "cusum_alerts", OutputMode.Append())
    try {
      val alerts = spark.table("cusum_alerts").collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getString(5)))
      // shift of +3/pt net: S = 3, 6, 9 -> alarm at the 3rd shifted point
      // (minute 7), reset, then again at minute 10
      assert(alerts.toSeq === Seq(("k0", ts(7), "hi"), ("k0", ts(10), "hi")))
    } finally q.stop()
  }
}
