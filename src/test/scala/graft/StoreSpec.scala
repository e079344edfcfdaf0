package graft

import graft.store._
import graft.sync.Sync
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ChunkStore / VersionedStore / Sync behavior matrix — the Scala analogue
  * of the reference's scenario-matrix tests
  * (hostore/tests/test_chunk_timeserie_store.py:73-401,
  * test_chunk_timeserie_sync.py:79-261, tests_basics.py).
  */
class ChunkStoreSpec extends SparkSpec {
  import spark.implicits._

  private val keySchema = StructType(Seq(
    StructField("version", IntegerType), StructField("kind", StringType)))

  private def hourly(start: String, hours: Int, f: Int => Option[Double]): DataFrame = {
    val t0 = java.time.LocalDateTime.parse(start)
    (0 until hours).map(i => (t0.plusHours(i), f(i))).toDF("ts", "value")
  }

  private def newStore(tz: String = "Europe/Paris", axis: ChunkAxis = YearMonthAxis,
      sync: Boolean = false): ChunkStore =
    new ChunkStore(spark, tmpDir("chunk"), keySchema,
      StoreConfig(freq = "1h", tz = tz, chunkAxis = axis, syncEnabled = sync))

  private val attrs = Map[String, Any]("version" -> 0, "kind" -> "k1")
  private val now0  = ldt("2024-06-01T00:00")

  // matrix: chunk axis × tz (reference test_chunk_timeserie_store.py:326-364)
  for (axis <- Seq(YearAxis, YearMonthAxis); tz <- Seq("Europe/Paris", "UTC")) {
    test(s"roundtrip $axis/$tz: write spanning chunk boundary, read back") {
      val st = newStore(tz, axis)
      val s = hourly("2024-01-30T00:00", 24 * 5, i => Some(i.toDouble)) // spans Jan→Feb
      assert(st.setTs(attrs, s, now = now0))
      val back = st.getTs(attrs).collect()
      assert(back.length === 24 * 5)
      assert(back.head.getDouble(1) === 0.0 && back.last.getDouble(1) === (24 * 5 - 1).toDouble)
      if (axis == YearMonthAxis) assert(st.maxChunkIndex().get === 2024 * 12 + 2 - 1)
    }
  }

  test("all-null series is skipped on write") {
    val st = newStore()
    assert(!st.setTs(attrs, hourly("2024-01-01T00:00", 5, _ => None), now = now0))
    assert(!st.exists(attrs))
  }

  test("dtype round-trip: int series reads back as ints, double stays double") {
    val st = newStore()
    val t0 = java.time.LocalDateTime.parse("2024-01-30T00:00")
    // long-typed input spanning a chunk boundary (Jan→Feb)
    val ints = (0 until 24 * 5).map(i => (t0.plusHours(i.toLong), i.toLong * 10)).toDF("ts", "value")
    assert(st.setTs(attrs, ints, now = now0))
    val back = st.getTs(attrs)
    assert(back.schema("value").dataType === org.apache.spark.sql.types.LongType)
    val rows = back.collect()
    assert(rows.head.getLong(1) === 0L && rows.last.getLong(1) === (24 * 5 - 1).toLong * 10)
    // a double series in the same store is untouched
    val attrs2 = Map[String, Any]("version" -> 0, "kind" -> "k2")
    assert(st.setTs(attrs2, hourly("2024-01-30T00:00", 5, i => Some(i + 0.5)), now = now0))
    assert(st.getTs(attrs2).schema("value").dataType ===
      org.apache.spark.sql.types.DoubleType)
    // update with a DOUBLE write flips the merged chunks' dtype: mixed
    // chunk dtypes fall back to double (one frame, one value type)
    val upd = Seq((t0.plusHours(1L), 99.5)).toDF("ts", "value")
    assert(st.setTs(attrs, upd, update = true, now = now0.plusHours(1)))
    assert(st.getTs(attrs).schema("value").dataType ===
      org.apache.spark.sql.types.DoubleType)
  }

  // ADVICE r10 (medium): a series mixing pre-dtype chunks (null dtype —
  // historically double data) with one typed chunk must NOT cast the whole
  // series to the typed chunk's dtype — that silently truncates fractional
  // legacy values. Null dtype counts as double, forcing the fallback.
  test("mixed legacy(null-dtype)/typed chunks fall back to double on read") {
    val st = newStore(tz = "UTC")
    val t0 = java.time.LocalDateTime.parse("2024-01-10T00:00")
    val ints = (0 until 24).map(i => (t0.plusHours(i.toLong), i.toLong)).toDF("ts", "value")
    assert(st.setTs(attrs, ints, now = now0)) // chunk 2024-01, dtype=bigint
    // simulate a pre-dtype store file: same series, February chunk,
    // fractional values, dtype null — appended the way a legacy writer
    // laid files out (partitioned by chunk_index, no dtype recorded)
    val t1 = java.time.LocalDateTime.parse("2024-02-10T00:00")
    val legacy = (0 until 24).map(i => (t1.plusHours(i.toLong), i + 0.5)).toDF("ts", "value")
      .withColumn("version", lit(0)).withColumn("kind", lit("k1"))
      .withColumn("chunk_index", lit(2024 * 12 + 1))
      .withColumn("ts", col("ts").cast(TimestampNTZType))
      .withColumn("dtype", lit(null).cast(StringType))
      .withColumn("is_deleted", lit(false))
      .withColumn("updated_at", lit(now0).cast(TimestampNTZType))
      .select(st.schema.fieldNames.map(col): _*)
    legacy.write.mode("append").partitionBy("chunk_index").parquet(st.path)
    val back = st.getTs(attrs)
    assert(back.schema("value").dataType === DoubleType)
    val vals = back.collect().map(_.getDouble(1))
    assert(vals.length === 48 && vals.takeRight(24).head === 0.5) // fractions intact
  }

  // Reference get_ts(drop_bounds_na=False) parity: the reference persists
  // each chunk NaN-padded over the full chunk calendar
  // (chunk_timeserie_store.py:730-741), so the undropped read returns the
  // dense store-freq grid over the stored chunk span. We store sparsely
  // and must reconstruct exactly that.
  test("getTs dropBoundsNa=false: dense chunk-span grid, NaN bounds as null rows") {
    val st = newStore(tz = "UTC")
    val t0 = java.time.LocalDateTime.parse("2024-01-15T00:00")
    val s = (0 until 24 * 10).map(i => (t0.plusHours(i.toLong), i.toDouble)).toDF("ts", "value")
    assert(st.setTs(attrs, s, now = now0)) // Jan 15 .. Jan 24 — one chunk (2024-01)
    val dense = st.getTs(attrs, dropBoundsNa = false).collect()
    assert(dense.length === 31 * 24) // full January grid
    assert(dense.head.getAs[java.time.LocalDateTime]("ts") === ldt("2024-01-01T00:00"))
    assert(dense.head.isNullAt(1) && dense.last.isNullAt(1)) // padded bounds
    assert(dense(14 * 24).getDouble(1) === 0.0)              // first written point
    // the default read is unchanged: sparse, trimmed
    assert(st.getTs(attrs).count() === 24 * 10)
    // inclusive slice applies on the dense grid (reference _finish_serie
    // slices AFTER the reindex)
    val z = java.time.ZoneOffset.UTC
    val sliced = st.getTs(attrs,
      start = Some(java.time.ZonedDateTime.of(2024, 1, 10, 0, 0, 0, 0, z)),
      end = Some(java.time.ZonedDateTime.of(2024, 1, 16, 0, 0, 0, 0, z)),
      dropBoundsNa = false).collect()
    assert(sliced.length === 6 * 24 + 1) // inclusive both ends
    assert(sliced.head.isNullAt(1) && sliced.last.getDouble(1) === 24.0)
  }

  test("getTs dense grid is DST-correct in a non-UTC store (chunk starts at local midnight)") {
    val st = newStore(tz = "Europe/Paris")
    val t0 = java.time.LocalDateTime.parse("2024-03-10T00:00") // UTC wall
    val s = (0 until 24).map(i => (t0.plusHours(i.toLong), 1.0)).toDF("ts", "value")
    assert(st.setTs(attrs, s, now = now0))
    val dense = st.getTs(attrs, dropBoundsNa = false).collect()
    // March chunk in Paris: local midnight Mar 1 = 23:00 UTC Feb 29; the
    // month has a spring-forward day, so the grid has 31*24 - 1 slots
    assert(dense.head.getAs[java.time.LocalDateTime]("ts") === ldt("2024-02-29T23:00"))
    assert(dense.length === 31 * 24 - 1)
    assert(dense.last.getAs[java.time.LocalDateTime]("ts") === ldt("2024-03-31T21:00"))
  }

  test("yieldManyTs dropBoundsNa=false: per-key dense chunk-span grids in one frame") {
    val st = newStore(tz = "UTC")
    val t0 = java.time.LocalDateTime.parse("2024-01-15T00:00")
    val a = (0 until 24 * 5).map(i => (t0.plusHours(i.toLong), 1.0)).toDF("ts", "value")
    // second key spans Jan -> Feb (two chunks)
    val b = (0 until 24 * 25).map(i => (t0.plusHours(i.toLong), 2.0)).toDF("ts", "value")
    assert(st.setTs(attrs, a, now = now0))
    assert(st.setTs(Map("version" -> 0, "kind" -> "k2"), b, now = now0))
    val dense = st.yieldManyTs(dropBoundsNa = false)
    val byKind = dense.collect().groupBy(_.getAs[String]("kind"))
    assert(byKind("k1").length === 31 * 24)              // full January
    assert(byKind("k2").length === (31 + 29) * 24)       // Jan + leap February
    assert(byKind("k2").count(_.isNullAt(3)) === (31 + 29) * 24 - 24 * 25) // pads are null
    // sparse default unchanged
    assert(st.yieldManyTs().count() === 24 * 5 + 24 * 25)
    // agrees with the single-series dense read
    val one = st.getTs(attrs, dropBoundsNa = false).collect().map(r =>
      (r.getAs[java.time.LocalDateTime]("ts"), if (r.isNullAt(1)) null else r.getDouble(1)))
    val many = byKind("k1").sortBy(_.getAs[java.time.LocalDateTime]("ts").toString).map(r =>
      (r.getAs[java.time.LocalDateTime]("ts"), if (r.isNullAt(3)) null else r.getDouble(3)))
    assert(many.toSeq === one.toSeq)
  }

  test("dense reads grid STORED chunks only: an incremental hole stays a hole") {
    // reference parity (chunk_timeserie_store.py:406-413): get_ts concats
    // the surviving chunks' per-chunk grids — a middle chunk that was
    // never written (update=True appends for Jan then Mar) contributes
    // NOTHING; the hole must come back omitted, not null-filled
    val st = newStore(tz = "UTC")
    val jan = (0 until 24 * 5).map(i =>
      (java.time.LocalDateTime.parse("2024-01-15T00:00").plusHours(i.toLong), 1.0)).toDF("ts", "value")
    val mar = (0 until 24 * 5).map(i =>
      (java.time.LocalDateTime.parse("2024-03-10T00:00").plusHours(i.toLong), 3.0)).toDF("ts", "value")
    assert(st.setTs(attrs, jan, now = now0))
    assert(st.setTs(attrs, mar, update = true, now = now0))
    val dense = st.getTs(attrs, dropBoundsNa = false).collect()
    assert(dense.length === (31 + 31) * 24) // Jan + Mar grids, NO February
    val months = dense.map(_.getAs[java.time.LocalDateTime]("ts").getMonthValue).toSet
    assert(months === Set(1, 3))
    // multi-series read agrees
    val many = st.yieldManyTs(dropBoundsNa = false).collect()
    assert(many.length === (31 + 31) * 24)
    assert(many.map(_.getAs[java.time.LocalDateTime]("ts").getMonthValue).toSet === Set(1, 3))
  }

  test("getTs launches exactly one job (dtype probe); returned frame stays lazy") {
    val st = newStore(tz = "UTC")
    val ints = (0 until 48).map(i =>
      (java.time.LocalDateTime.parse("2024-01-10T00:00").plusHours(i.toLong), i.toLong))
      .toDF("ts", "value")
    assert(st.setTs(attrs, ints, now = now0))
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      st.getTs(attrs) // NO action on the returned frame
      // listener events are async — wait until the count is stable
      var last = -1; var stable = 0
      while (stable < 6) { // 6 × 50 ms with no new events
        Thread.sleep(50)
        if (jobs.get == last) stable += 1 else { last = jobs.get; stable = 0 }
      }
      assert(jobs.get === 1,
        s"getTs must cost exactly the single dtype-probe job, saw ${jobs.get}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("dtype survives the sync wire: packEnvelope -> unpackEnvelope -> import") {
    val st = newStore(sync = true)
    val t0 = java.time.LocalDateTime.parse("2024-03-01T00:00")
    val ints = (0 until 48).map(i => (t0.plusHours(i.toLong), i.toLong)).toDF("ts", "value")
    assert(st.setTs(attrs, ints, update = true, now = now0))
    val specs = st.load().select("version", "kind", "chunk_index").distinct()
    val wire = graft.sync.Sync.packEnvelope(st, specs)
    assert(wire.select(get_json_object(col("envelope_json"), "$.meta.dtype")).head().getString(0)
      === "int64")
    val dst = newStore(sync = true)
    graft.sync.Sync.importChunks(dst, graft.sync.Sync.unpackEnvelope(dst, wire.select("envelope_json")))
    assert(dst.getTs(attrs).schema("value").dataType === org.apache.spark.sql.types.LongType)
    assert(dst.getTs(attrs).collect().map(_.getLong(1)).toSeq === (0 until 48).map(_.toLong))
  }

  test("partial attrs raise; unknown attrs raise; update+replace raise") {
    val st = newStore()
    val s = hourly("2024-01-01T00:00", 3, i => Some(i.toDouble))
    assertThrows[IllegalArgumentException](st.setTs(Map("version" -> 0), s))
    assertThrows[IllegalArgumentException](st.setTs(attrs + ("bogus" -> 1), s))
    assertThrows[IllegalArgumentException](st.setTs(attrs, s, update = true, replace = true))
  }

  test("plain insert over existing raises (IntegrityError parity)") {
    val st = newStore()
    val s = hourly("2024-01-01T00:00", 3, i => Some(i.toDouble))
    st.setTs(attrs, s, now = now0)
    assertThrows[IllegalStateException](st.setTs(attrs, s, now = now0))
  }

  test("update merges new.combine_first(existing) per chunk") {
    val st = newStore(tz = "UTC")
    st.setTs(attrs, hourly("2024-01-01T00:00", 5, i => Some(1.0)), now = now0)
    // overwrite hours 2-3 with 9.0; combine_first → new wins where present
    st.setTs(attrs, hourly("2024-01-01T02:00", 2, _ => Some(9.0)), update = true,
      now = now0.plusHours(1))
    val back = st.getTs(attrs).collect().map(_.getDouble(1)).toSeq
    assert(back === Seq(1.0, 1.0, 9.0, 9.0, 1.0))
  }

  test("replace hard-replaces overlapped chunks, tombstones the rest") {
    val st = newStore(tz = "UTC", axis = YearMonthAxis)
    st.setTs(attrs, hourly("2024-01-01T00:00", 24, i => Some(1.0)), now = now0)  // Jan
    st.setTs(attrs, hourly("2024-02-01T00:00", 24, i => Some(2.0)), update = true, now = now0) // Feb
    // replace with March-only data → Jan+Feb tombstoned
    st.setTs(attrs, hourly("2024-03-01T00:00", 24, i => Some(3.0)), replace = true,
      now = now0.plusHours(2))
    val back = st.getTs(attrs).collect()
    assert(back.length === 24 && back.forall(_.getDouble(1) === 3.0))
    // tombstones visible to sync metadata with fresh updated_at
    val upd = Sync.updates(st, now0.plusHours(1))
    assert(upd.filter(col("is_deleted")).count() === 2)
  }

  test("second series in same chunk partition is preserved on update") {
    val st = newStore(tz = "UTC")
    val attrs2 = Map[String, Any]("version" -> 0, "kind" -> "k2")
    st.setTs(attrs, hourly("2024-01-01T00:00", 3, i => Some(1.0)), now = now0)
    st.setTs(attrs2, hourly("2024-01-01T00:00", 3, i => Some(5.0)), now = now0)
    st.setTs(attrs, hourly("2024-01-01T00:00", 3, i => Some(2.0)), update = true, now = now0)
    assert(st.getTs(attrs2).collect().map(_.getDouble(1)).toSeq === Seq(5.0, 5.0, 5.0))
    assert(st.getTs(attrs).collect().map(_.getDouble(1)).toSeq === Seq(2.0, 2.0, 2.0))
  }

  test("getTs slices inclusive and prunes by chunk range") {
    val st = newStore(tz = "UTC")
    st.setTs(attrs, hourly("2024-01-01T00:00", 24 * 60, i => Some(i.toDouble)), now = now0)
    val z = java.time.ZoneOffset.UTC
    val out = st.getTs(attrs,
      start = Some(java.time.ZonedDateTime.of(2024, 2, 1, 0, 0, 0, 0, z)),
      end = Some(java.time.ZonedDateTime.of(2024, 2, 2, 0, 0, 0, 0, z))).collect()
    assert(out.length === 25) // inclusive both ends
    assert(out.head.getAs[java.time.LocalDateTime]("ts") === ldt("2024-02-01T00:00"))
  }

  test("bounds-trim on read: leading/trailing nulls dropped, interior kept") {
    val st = newStore(tz = "UTC")
    // write sparse: values only at hours 2..5 with a hole at 3 (persisted sparse)
    val s = hourly("2024-01-01T00:00", 8,
      i => if (i >= 2 && i <= 5 && i != 3) Some(i.toDouble) else None)
    st.setTs(attrs, s, now = now0)
    val back = st.getTs(attrs).collect()
    assert(back.head.getAs[java.time.LocalDateTime]("ts") === ldt("2024-01-01T02:00"))
    assert(back.last.getAs[java.time.LocalDateTime]("ts") === ldt("2024-01-01T05:00"))
  }

  test("maxHorodate / lastUpdatedAt semantics") {
    val st = newStore(tz = "UTC")
    assert(st.maxHorodate() === None)
    // empty store default: 2000-01-01 in store tz (UTC here)
    assert(st.lastUpdatedAt() === ldt("2000-01-01T00:00"))
    st.setTs(attrs, hourly("2024-01-01T00:00", 10, i => Some(i.toDouble)), now = now0)
    assert(st.maxHorodate().get === ldt("2024-01-01T09:00"))
    assert(st.lastUpdatedAt() === now0)
  }

  // Directory-listing shortcut (reference max-chunk shortcut,
  // chunk_timeserie_store.py:531): the newest partitions may hold nothing
  // for the filters (other series, tombstones) — walk down, then fall
  // back to one bounded aggregation, never a job per partition.
  test("maxHorodate walks down past foreign/tombstoned chunks; falls back when deep") {
    val st = newStore(tz = "UTC")
    val attrsB = Map[String, Any]("version" -> 0, "kind" -> "k2")
    // series A: Jan-May (5 chunks); series B: Jan only
    st.setTs(attrs, hourly("2024-01-01T00:00", 24, i => Some(1.0)), now = now0)
    for (m <- 2 to 5)
      st.setTs(attrs, hourly(f"2024-$m%02d-01T00:00", 24, i => Some(1.0)), update = true, now = now0)
    st.setTs(attrsB, hourly("2024-01-01T00:00", 10, i => Some(2.0)), now = now0)
    // B's max sits 4 partitions below the newest → probe misses + fallback
    assert(st.maxHorodate(Map("kind" -> "k2")).get === ldt("2024-01-01T09:00"))
    assert(st.maxHorodate().get === ldt("2024-05-01T23:00"))
    // no matching series at all → None through the fallback
    assert(st.maxHorodate(Map("kind" -> "nope")) === None)
    // tombstoned series: delete A → its 5 chunks are tombstone-only; the
    // walk-down + fallback must land on B's Jan max
    st.delete(Map("kind" -> "k1"), keepTracking = true, now = now0.plusHours(1))
    assert(st.maxHorodate().get === ldt("2024-01-01T09:00"))
  }

  test("maxHorodate common case: one pruned-partition probe, no full max(chunk_index) pass") {
    val st = newStore(tz = "UTC")
    st.setTs(attrs, hourly("2024-01-30T00:00", 24 * 5, i => Some(i.toDouble)), now = now0) // Jan+Feb
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val storePath = st.path
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
        val p = qe.executedPlan.toString
        // suites share the session and may run in parallel — only THIS
        // store's scans count
        if (p.contains(storePath)) plans.add(p)
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      assert(st.maxHorodate().get === ldt("2024-02-03T23:00"))
      // listener bus is async — wait for quiescence
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      var last = -1
      while (System.nanoTime() < deadline && plans.size != last) {
        last = plans.size; Thread.sleep(300)
      }
      val all = scala.jdk.CollectionConverters.IteratorHasAsScala(plans.iterator()).asScala.toList
      assert(!all.exists(_.contains("max(chunk_index")),
        "directory shortcut must not aggregate max(chunk_index) over the store")
      assert(all.exists(p => p.contains("max(ts") && p.contains("PartitionFilters")),
        "the probe scan must carry a chunk_index PartitionFilter")
    } finally spark.listenerManager.unregister(listener)
  }

  test("soft delete tombstones; hard delete forbidden when sync enabled") {
    val st = newStore(tz = "UTC")
    st.setTs(attrs, hourly("2024-01-01T00:00", 5, i => Some(1.0)), now = now0)
    st.delete(Map("kind" -> "k1"), keepTracking = true, now = now0.plusHours(1))
    assert(st.getTs(attrs).collect().isEmpty)
    assert(st.load().filter(col("is_deleted")).count() === 1)
    val sst = newStore(tz = "UTC", sync = true)
    assertThrows[IllegalStateException](sst.delete(Map("kind" -> "x"), keepTracking = false))
  }

  // VERDICT r1 ADVICE: dynamic partition overwrite never touches a
  // partition with zero surviving rows — a hard delete that empties a
  // chunk must remove its directory explicitly.
  test("hard delete of the only series physically empties the store") {
    val st = newStore(tz = "UTC")
    st.setTs(attrs, hourly("2024-01-30T00:00", 24 * 5, i => Some(i.toDouble)), now = now0) // Jan+Feb chunks
    st.delete(Map("kind" -> "k1"), keepTracking = false, now = now0.plusHours(1))
    assert(st.load().count() === 0)
    assert(st.getTs(attrs).collect().isEmpty)
    // store stays writable after full emptying
    assert(st.setTs(attrs, hourly("2024-03-01T00:00", 3, i => Some(9.0)), now = now0.plusHours(2)))
    assert(st.getTs(attrs).count() === 3)
  }

  test("hard delete of one series keeps the co-located series intact") {
    val st = newStore(tz = "UTC")
    st.setTs(Map("version" -> 0, "kind" -> "a"), hourly("2024-01-01T00:00", 4, i => Some(1.0)), now = now0)
    st.setTs(Map("version" -> 0, "kind" -> "b"), hourly("2024-01-01T00:00", 4, i => Some(2.0)), now = now0)
    st.delete(Map("kind" -> "a"), keepTracking = false, now = now0.plusHours(1))
    assert(st.load().filter(col("kind") === "a").count() === 0)
    assert(st.getTs(Map("version" -> 0, "kind" -> "b")).count() === 4)
  }

  test("setManyTs bulk-inserts many series in one job; duplicates refused") {
    val st = newStore(tz = "UTC")
    val many = Seq(
      (0, "a", "2024-01-01T00:00", 1.0), (0, "a", "2024-01-01T01:00", 2.0),
      (0, "b", "2024-01-01T00:00", 3.0))
      .map { case (v, k, t, x) => (v, k, java.time.LocalDateTime.parse(t), x) }
      .toDF("version", "kind", "ts", "value")
    st.setManyTs(many, now = now0)
    assert(st.yieldManyTs().count() === 3)
    assertThrows[IllegalStateException](st.setManyTs(many, now = now0))
  }

  test("SQL view over the store: live rows, pruning-friendly schema") {
    val st = newStore(tz = "UTC")
    st.setTs(attrs, hourly("2024-01-01T00:00", 5, i => Some(i.toDouble)), now = now0)
    st.delete(Map("kind" -> "nope"), now = now0) // no-op delete keeps view clean
    st.createOrReplaceView("lc_store")
    val out = spark.sql(
      "SELECT kind, count(*) AS n, round(sum(value), 2) AS s FROM lc_store GROUP BY 1").head()
    assert(out.getString(0) === "k1" && out.getLong(1) === 5L && out.getDouble(2) === 10.0)
    val cols = spark.table("lc_store").columns.toSeq
    assert(cols.contains("chunk_index") && !cols.contains("is_deleted"))
  }

  test("yieldManyTs: partial filters, ordered stream") {
    val st = newStore(tz = "UTC")
    st.setTs(Map("version" -> 0, "kind" -> "a"), hourly("2024-01-01T00:00", 3, i => Some(1.0)), now = now0)
    st.setTs(Map("version" -> 0, "kind" -> "b"), hourly("2024-01-01T00:00", 3, i => Some(2.0)), now = now0)
    val all = st.yieldManyTs(Map("version" -> 0)).collect()
    assert(all.length === 6)
    assert(all.map(_.getString(1)).toSeq === Seq("a", "a", "a", "b", "b", "b"))
  }

  test("getManyTs: one broadcast-semi-join job serves a spec list, sliced") {
    val st = newStore(tz = "UTC")
    for (k <- Seq("a", "b", "c"))
      st.setTs(Map("version" -> 0, "kind" -> k), hourly("2024-01-01T00:00", 24, i => Some(i.toDouble)), now = now0)
    val specs = Seq(
      Map[String, Any]("version" -> 0, "kind" -> "a"),
      Map[String, Any]("version" -> 0, "kind" -> "c"))
    val z = java.time.ZonedDateTime.of(2024, 1, 1, 6, 0, 0, 0, java.time.ZoneOffset.UTC)
    val out = st.getManyTs(specs, start = Some(z)).collect()
    assert(out.map(_.getString(1)).toSet === Set("a", "c"))
    assert(out.length === 2 * 18) // hours 06..23 for each of the 2 series
    // partial attrs in a spec raise, like getTs
    assertThrows[IllegalArgumentException](st.getManyTs(Seq(Map[String, Any]("version" -> 0))))
  }

  test("compact: many incremental writes collapse to one file per chunk partition") {
    val dir = tmpDir("chunk")
    val st = new ChunkStore(spark, dir, keySchema,
      StoreConfig(freq = "1h", tz = "UTC", chunkAxis = YearMonthAxis))
    // 4 plain inserts (appends) into the same Jan-2024 chunk → several
    // parquet files accumulate in the partition dir
    for (i <- 0 until 4)
      st.setTs(Map("version" -> 0, "kind" -> s"k$i"),
        hourly("2024-01-01T00:00", 6, j => Some(j.toDouble)), now = now0.plusHours(i))
    val chunkDir = new java.io.File(dir).listFiles()
      .find(_.getName.startsWith("chunk_index=")).get
    def nFiles = chunkDir.listFiles().count(_.getName.endsWith(".parquet"))
    val before = nFiles
    assert(before > 1)
    val rowsBefore = st.yieldManyTs().count()
    assert(st.compact() === 1)
    assert(nFiles === 1)
    assert(st.yieldManyTs().count() === rowsBefore) // readers see the same rows
  }

  test("compactIfNeeded: only partitions over the file threshold rewrite") {
    val dir = tmpDir("chunk")
    val st = new ChunkStore(spark, dir, keySchema,
      StoreConfig(freq = "1h", tz = "UTC", chunkAxis = YearMonthAxis))
    // Jan chunk: 4 appends (many files); Feb chunk: 1 append (compact already)
    for (i <- 0 until 4)
      st.setTs(Map("version" -> 0, "kind" -> s"k$i"),
        hourly("2024-01-01T00:00", 6, j => Some(j.toDouble)), now = now0.plusHours(i))
    st.setTs(Map("version" -> 0, "kind" -> "feb"),
      hourly("2024-02-01T00:00", 6, j => Some(j.toDouble)), now = now0)
    def files(prefix: String) = new java.io.File(dir).listFiles()
      .find(_.getName == prefix).get.listFiles().count(_.getName.endsWith(".parquet"))
    val febDir = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("chunk_index=")).map(_.getName).sorted
    assert(febDir.length === 2)
    val Seq(jan, feb) = febDir.toSeq
    val febBefore = files(feb)
    val rowsBefore = st.yieldManyTs().count()
    val compacted = st.compactIfNeeded(maxFilesPerPartition = 2)
    assert(compacted.length === 1) // only the Jan partition crossed the threshold
    assert(files(jan) === 1)
    assert(files(feb) === febBefore) // untouched partition keeps its files
    assert(st.yieldManyTs().count() === rowsBefore)
    assert(st.compactIfNeeded(maxFilesPerPartition = 2) === Seq.empty) // idempotent
  }

  // Django __-lookup matrix on yield_many_ts filters (reference
  // `_check_attrs` strips suffixes, chunk_timeserie_store.py:889-899).
  test("yieldManyTs: __-lookup filters (gte/lt/in); unknown base field raises") {
    val st = newStore(tz = "UTC")
    for ((v, k, value) <- Seq((0, "a", 1.0), (1, "b", 2.0), (2, "c", 3.0)))
      st.setTs(Map("version" -> v, "kind" -> k), hourly("2024-01-01T00:00", 2, _ => Some(value)), now = now0)
    assert(st.yieldManyTs(Map("version__gte" -> 1)).select("kind").distinct().count() === 2)
    assert(st.yieldManyTs(Map("version__lt" -> 1)).select("kind").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("a"))
    assert(st.yieldManyTs(Map("kind__in" -> Seq("a", "c"))).select("kind").distinct().count() === 2)
    assert(st.yieldManyTs(Map("version__gte" -> 1, "kind__in" -> Seq("b"))).count() === 2)
    val e = intercept[IllegalArgumentException](st.yieldManyTs(Map("nope__gte" -> 1)))
    assert(e.getMessage.contains("nope"))
  }

  test("yieldManyTs: string and range lookups (contains/startswith/iexact/range)") {
    val st = newStore(tz = "UTC")
    for ((v, k, value) <- Seq((0, "alpha", 1.0), (1, "beta", 2.0), (2, "Alto", 3.0)))
      st.setTs(Map("version" -> v, "kind" -> k), hourly("2024-01-01T00:00", 2, _ => Some(value)), now = now0)
    def kinds(f: Map[String, Any]): Seq[String] =
      st.yieldManyTs(f).select("kind").distinct().collect().map(_.getString(0)).toSeq.sorted
    assert(kinds(Map("kind__contains" -> "lt")) === Seq("Alto"))
    assert(kinds(Map("kind__startswith" -> "al")) === Seq("alpha"))
    assert(kinds(Map("kind__istartswith" -> "al")) === Seq("Alto", "alpha"))
    assert(kinds(Map("kind__endswith" -> "a")) === Seq("alpha", "beta"))
    assert(kinds(Map("kind__iexact" -> "ALTO")) === Seq("Alto"))
    assert(kinds(Map("kind__icontains" -> "ALT")) === Seq("Alto"))
    assert(kinds(Map("version__range" -> (1, 2))) === Seq("Alto", "beta"))
    val e = intercept[IllegalArgumentException](
      graft.store.Lookups.compileOne("version__range", 3))
    assert(e.getMessage.contains("range"))
    val u = intercept[IllegalArgumentException](
      graft.store.Lookups.compileOne("kind__regex", "x"))
    assert(u.getMessage.contains("unsupported"))
  }
}

class VersionedStoreSpec extends SparkSpec {
  import spark.implicits._

  private def series(start: String, n: Int, v: Double): DataFrame = {
    val t0 = java.time.LocalDateTime.parse(start)
    (0 until n).map(i => (t0.plusHours(i), v)).toDF("ts", "value")
  }

  test("compactIfNeeded: only buckets over the file threshold rewrite") {
    val dir = tmpDir("vstore")
    val st = new VersionedStore(spark, dir)
    // 4 versioned appends to one prm -> 4+ files in its bucket; a second
    // prm (different bucket for the default 64 buckets) gets 1 append
    for (i <- 0 until 4)
      st.setLc("hot_prm", 1, series("2024-01-01T00:00", 3, i.toDouble), versioning = true)
    st.setLc("cold_prm", 1, series("2024-01-01T00:00", 3, 9.0), versioning = true)
    val hotBucket = st.bucketOf("hot_prm")
    val coldBucket = st.bucketOf("cold_prm")
    assert(hotBucket !== coldBucket, "test prms landed in one bucket; pick different names")
    def files(b: Int) = new java.io.File(dir, s"bucket=$b").listFiles()
      .count(_.getName.endsWith(".parquet"))
    // one append can emit several files (one per write task), so size the
    // threshold off the single-append bucket: cold sits AT it, hot (4
    // appends) is far over
    val coldBefore = files(coldBucket)
    val hotRows = st.getLc("hot_prm", 1).collect()
    val compacted = st.compactIfNeeded(maxFilesPerBucket = coldBefore)
    assert(compacted === Seq(hotBucket))
    assert(files(hotBucket) === 1)
    assert(files(coldBucket) === coldBefore)
    // same combined read after compaction (newest version still wins)
    assert(st.getLc("hot_prm", 1).collect().map(_.getAs[Double]("value")).toSeq
      === hotRows.map(_.getAs[Double]("value")).toSeq)
    assert(st.count(1) === 5)
    assert(st.compactIfNeeded(maxFilesPerBucket = coldBefore) === Seq.empty)
  }

  test("versioned writes increment; combined read: newest wins, older fills") {
    val st = new VersionedStore(spark, tmpDir("vstore"))
    st.setLc("prm1", 1, series("2024-01-01T00:00", 5, 1.0), versioning = true)
    st.setLc("prm1", 1, series("2024-01-01T03:00", 5, 2.0), versioning = true)
    val out = st.getLc("prm1", 1).collect()
    assert(out.length === 8)
    assert(out.map(_.getAs[Double]("value")).toSeq === Seq(1.0, 1.0, 1.0, 2.0, 2.0, 2.0, 2.0, 2.0))
    assert(st.count(1) === 2)
  }

  test("exportBlobs: one feather-lz4 blob per version entry; decodeBlobs inverts it") {
    val st = new VersionedStore(spark, tmpDir("vstore"))
    st.setLc("prm_a", 1, series("2024-01-01T00:00", 6, 1.5), versioning = true)
    st.setLc("prm_a", 1, series("2024-01-01T02:00", 4, 2.5), versioning = true)
    st.setLc("prm_b", 1, series("2024-03-01T00:00", 3, -9.0))
    st.setLc("prm_c", 2, series("2024-04-01T00:00", 2, 7.0)) // other client: excluded
    val blobs = st.exportBlobs(1)
    val metas = blobs.select("prm", "version").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    assert(metas === Set(("prm_a", 0), ("prm_a", 1), ("prm_b", 0)))
    // the blob IS the reference's stored form: feather magic + series name = prm
    val row = blobs.filter(col("prm") === "prm_b").collect()(0)
    val data = row.getAs[Array[Byte]]("data")
    assert(new String(data.take(6), "ASCII") === "ARROW1")
    val dec = Seq(Tuple1(data)).toDF("b")
      .select(graft.functions.FeatherBlob.feather_decode(col("b")).as("d"))
      .select(col("d.name")).collect()(0).getString(0)
    assert(dec === "prm_b")
    // decodeBlobs(exportBlobs) == stored long form
    val back = st.decodeBlobs(blobs)
      .orderBy("prm", "version", "ts").collect()
      .map(r => (r.getString(0), r.getInt(2), r.getAs[java.time.LocalDateTime]("ts"), r.getDouble(4)))
    val orig = st.load().filter(col("client_id") === 1)
      .select("prm", "client_id", "version", "ts", "value")
      .orderBy("prm", "version", "ts").collect()
      .map(r => (r.getString(0), r.getInt(2), r.getAs[java.time.LocalDateTime]("ts"), r.getDouble(4)))
    assert(back.toSeq === orig.toSeq)
  }

  test("exportBlobs/decodeBlobs carry extraSchema attributes; prm-list export prunes buckets") {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val st = new VersionedStore(spark, tmpDir("vstore"),
      extraSchema = StructType(Seq(StructField("region", StringType))))
    // same (prm, version) twice, distinguished only by the extra key
    st.setLc("p", 1, series("2024-01-01T00:00", 3, 1.0),
      attributesToSet = Map("region" -> "fr"))
    st.setLc("p", 1, series("2024-01-01T00:00", 3, 2.0),
      attributesToSet = Map("region" -> "de"))
    val blobs = st.exportBlobs(1, prms = Some(Seq("p")))
    assert(blobs.count() === 2)
    val back = st.decodeBlobs(blobs)
    assert(back.columns.contains("region"), "extra keys must survive decode")
    val byRegion = back.groupBy("region").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byRegion === Map("fr" -> 3L, "de" -> 3L))
    // bucket pruning: the prm filter must carry the bucket predicate
    val p = blobs.queryExecution.optimizedPlan.toString
    assert(p.contains("bucket"), s"expected bucket pruning in plan\n${p.take(500)}")
  }

  test("delay slice cuts each version's start before combining") {
    val st = new VersionedStore(spark, tmpDir("vstore"))
    // reference tests_slice_with_delay.py: v0 from Jan 1 (value 1), v1 from Jan 2 (value 2)
    st.setLc("p", 1, series("2024-01-01T00:00", 48, 1.0), versioning = true)
    st.setLc("p", 1, series("2024-01-02T00:00", 24, 2.0), versioning = true)
    val out = st.getLc("p", 1, delaySecs = Some(6 * 3600L)).collect()
    // v1 covers Jan2 06:00+, v0 covers Jan1 06:00..Jan2 23:00 at priority 2
    assert(out.head.getAs[java.time.LocalDateTime]("ts") === ldt("2024-01-01T06:00"))
    val atJan2 = out.filter(_.getAs[java.time.LocalDateTime]("ts") == ldt("2024-01-02T06:00"))
    assert(atJan2.head.getAs[Double]("value") === 2.0)
    val atJan2Early = out.filter(_.getAs[java.time.LocalDateTime]("ts") == ldt("2024-01-02T03:00"))
    assert(atJan2Early.head.getAs[Double]("value") === 1.0) // v1's first 6h cut → v0 fills
  }

  test("non-versioned upsert rewrites; clear by version") {
    val st = new VersionedStore(spark, tmpDir("vstore"))
    st.setLc("p", 1, series("2024-01-01T00:00", 3, 1.0))
    st.setLc("p", 1, series("2024-01-01T00:00", 3, 9.0)) // upsert replaces
    assert(st.getLc("p", 1).collect().map(_.getAs[Double]("value")).toSeq === Seq(9.0, 9.0, 9.0))
    st.clear(1, prms = Some(Seq("p")))
    assert(st.getLc("p", 1).collect().isEmpty)
  }

  test("absentPrms = requested minus stored (anti-join)") {
    val st = new VersionedStore(spark, tmpDir("vstore"))
    st.setLc("p1", 1, series("2024-01-01T00:00", 2, 1.0))
    assert(st.absentPrms(Seq("p1", "p2"), 1).collect().map(_.getString(0)).toSeq === Seq("p2"))
  }

  test("all-null series skipped") {
    val st = new VersionedStore(spark, tmpDir("vstore"))
    val nulls = Seq((java.time.LocalDateTime.parse("2024-01-01T00:00"), Option.empty[Double]))
      .toDF("ts", "value")
    assert(!st.setLc("p", 1, nulls))
  }

  // Bucket-partitioned writes: a single-series upsert rewrites only the
  // prm's own bucket partition — the other bucket's files are bit-for-bit
  // untouched (no whole-store rewrite).
  test("single-series upsert rewrites only the prm's bucket partition") {
    val dir = tmpDir("vstore")
    val st = new VersionedStore(spark, dir, numBuckets = 8)
    val pa = "p1"
    val pb = (2 to 100).map("p" + _).find(p => st.bucketOf(p) != st.bucketOf(pa)).get
    st.setLc(pa, 1, series("2024-01-01T00:00", 3, 1.0))
    st.setLc(pb, 1, series("2024-01-01T00:00", 3, 2.0))
    def pbFiles = new java.io.File(dir, s"bucket=${st.bucketOf(pb)}")
      .listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified())).toSet
    val before = pbFiles
    st.setLc(pa, 1, series("2024-01-01T00:00", 3, 9.0)) // upsert → rewrite pa's bucket only
    assert(pbFiles === before)
    assert(st.getLc(pa, 1).collect().map(_.getAs[Double]("value")).toSeq === Seq(9.0, 9.0, 9.0))
    assert(st.getLc(pb, 1).collect().map(_.getAs[Double]("value")).toSeq === Seq(2.0, 2.0, 2.0))
    // clear by prm list also stays inside the bucket
    st.clear(1, prms = Some(Seq(pa)))
    assert(pbFiles === before)
    assert(st.getLc(pa, 1).collect().isEmpty)
  }

  // Reference set_many_lc + find_holes (hostore.py:372-394, 162-216).
  test("setManyLc bulk writes; findHoles: per-prm holes, absent prm = whole range") {
    val st = new VersionedStore(spark, tmpDir("vstore"))
    val outcomes = st.setManyLc(Map(
      "p1" -> series("2024-01-01T02:00", 8, 1.0), // covers 02:00-09:00
      "p2" -> Seq((java.time.LocalDateTime.parse("2024-01-01T00:00"), Option.empty[Double]))
        .toDF("ts", "value")), 1) // all-null → skipped
    assert(outcomes === Map("p1" -> true, "p2" -> false))
    val hs = st.findHoles(1,
        java.time.LocalDateTime.parse("2024-01-01T00:00"),
        java.time.LocalDateTime.parse("2024-01-01T09:00"), 3600L,
        prms = Some(Seq("p1", "p2")))
      .collect().map(r => (r.getString(0),
        r.getAs[java.time.LocalDateTime]("hole_start"),
        r.getAs[java.time.LocalDateTime]("hole_end"))).toSet
    def t(s: String) = java.time.LocalDateTime.parse(s)
    assert(hs === Set(
      ("p1", t("2024-01-01T00:00"), t("2024-01-01T01:00")), // leading missing slots
      ("p2", t("2024-01-01T00:00"), t("2024-01-01T09:00")))) // absent → whole range
  }

  // Reference set_lc versionning_by + attributes_to_set (hostore.py:321-366):
  // extra subclass fields fill declared columns; version counters scope to
  // prm + the versionning_by subset; upsert matches update_or_create keys.
  test("setLc versioningBy + attributesToSet: scoped versions, attr-matched upsert") {
    val extra = StructType(Seq(StructField("kind", StringType)))
    val st = new VersionedStore(spark, tmpDir("vstore"), extraSchema = extra)
    def put(kind: String, v: Double) = st.setLc("p", 1, series("2024-01-01T00:00", 2, v),
      versioning = true, versioningBy = Seq("prm", "kind"),
      attributesToSet = Map("kind" -> kind))
    put("a", 1.0); put("a", 2.0) // kind=a versions 0, 1
    put("b", 9.0)                // kind=b starts at its own version 0
    val raw = st.getLc("p", 1, combinedVersions = false)
    assert(raw.columns.contains("kind"))
    val perKind = raw.select("kind", "version").distinct().collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    assert(perKind === Set(("a", 0), ("a", 1), ("b", 0)))
    // combined per (prm, kind): kind=a newest (2.0) wins, kind=b is 9.0
    val comb = st.getLc("p", 1, combinedBy = Seq("prm", "kind"))
    assert(comb.filter(col("kind") === "a").collect().map(_.getAs[Double]("value")).toSeq
      === Seq(2.0, 2.0))
    // non-versioned upsert matches on (prm, client, kind): only kind=a replaced
    st.setLc("p", 1, series("2024-01-01T00:00", 2, 7.0), attributesToSet = Map("kind" -> "a"))
    val after = st.getLc("p", 1, combinedBy = Seq("prm", "kind"))
    assert(after.filter(col("kind") === "a").collect().map(_.getAs[Double]("value")).toSeq
      === Seq(7.0, 7.0))
    assert(after.filter(col("kind") === "b").collect().map(_.getAs[Double]("value")).toSeq
      === Seq(9.0, 9.0))
    // unknown attribute refused; versioningBy must include prm
    assertThrows[IllegalArgumentException](
      st.setLc("p", 1, series("2024-01-01T00:00", 1, 1.0), attributesToSet = Map("nope" -> 1)))
    assertThrows[IllegalArgumentException](
      st.setLc("p", 1, series("2024-01-01T00:00", 1, 1.0), versioning = true,
        versioningBy = Seq("kind")))
  }

  // Reference find_groups (hostore.py:45-160): groups by merged missing
  // ranges + combined data return with empty prms popped.
  test("findGroups: boundary min_delta, interior gaps, absent/empty prms, data return") {
    val st = new VersionedStore(spark, tmpDir("vstore"))
    // range [00:00, 10:00] hourly, minDelta default = freq = 3600
    // p1: live 01:00..09:00 but missing 04:00-05:00 (interior gap);
    //     leading gap [00:00, 01:00] = 1h >= minDelta → kept;
    //     trailing gap [09:00, 10:00] kept.
    val p1pts = (Seq(1, 2, 3, 6, 7, 8, 9)).map(h =>
      (java.time.LocalDateTime.parse("2024-01-01T00:00").plusHours(h), 1.0))
    st.setLc("p1", 1, p1pts.toDF("ts", "value"))
    // p2: full coverage 00:00..10:00 → no missing ranges at all
    st.setLc("p2", 1, series("2024-01-01T00:00", 11, 2.0))
    // p3: data entirely OUTSIDE the range → popped from data, full range
    st.setLc("p3", 1, series("2025-06-01T00:00", 3, 3.0))
    val (groups, data) = st.findGroups(Seq("p1", "p2", "p3", "p4"), 1,
      java.time.LocalDateTime.parse("2024-01-01T00:00"),
      java.time.LocalDateTime.parse("2024-01-01T10:00"), 3600L)
    val g = groups.collect().map(r => (
      r.getAs[java.time.LocalDateTime]("hole_start"),
      r.getAs[java.time.LocalDateTime]("hole_end"),
      r.getAs[scala.collection.Seq[String]]("member_keys").toSeq)).toSet
    def t(s: String) = java.time.LocalDateTime.parse(s)
    assert(g === Set(
      (t("2024-01-01T00:00"), t("2024-01-01T10:00"), Seq("p3", "p4")), // absent/empty
      (t("2024-01-01T00:00"), t("2024-01-01T01:00"), Seq("p1")),       // leading
      (t("2024-01-01T04:00"), t("2024-01-01T05:00"), Seq("p1")),       // interior
      (t("2024-01-01T09:00"), t("2024-01-01T10:00"), Seq("p1"))))      // trailing
    // data: p3 (empty in range) and p4 (absent) popped
    assert(data.select("prm").distinct().collect().map(_.getString(0)).toSet === Set("p1", "p2"))
    // minDelta above the boundary gap length suppresses leading/trailing
    val (g2, _) = st.findGroups(Seq("p1"), 1,
      java.time.LocalDateTime.parse("2024-01-01T00:00"),
      java.time.LocalDateTime.parse("2024-01-01T10:00"), 3600L,
      minDeltaSecs = Some(2 * 3600L))
    val holes2 = g2.collect().map(r => (
      r.getAs[java.time.LocalDateTime]("hole_start"),
      r.getAs[java.time.LocalDateTime]("hole_end"))).toSet
    assert(holes2 === Set((t("2024-01-01T04:00"), t("2024-01-01T05:00"))))
  }

  // Reference get_lc option surface (hostore.py:218-268): version=,
  // combined_versions=False, custom_filters, order_by.
  test("get_lc knobs: version select / uncombined / custom filters / fold order") {
    val st = new VersionedStore(spark, tmpDir("vstore"))
    st.setLc("p", 1, series("2024-01-01T00:00", 3, 1.0), versioning = true) // v0: 00-02h
    st.setLc("p", 1, series("2024-01-01T01:00", 3, 2.0), versioning = true) // v1: 01-03h

    // version=N returns only that version's points
    val v0 = st.getLc("p", 1, version = Some(0)).collect()
    assert(v0.map(_.getAs[Double]("value")).toSeq === Seq(1.0, 1.0, 1.0))

    // combined_versions=False keeps entries apart, version column retained
    val raw = st.getLc("p", 1, combinedVersions = false)
    assert(raw.columns.contains("version"))
    assert(raw.count() === 6)

    // default (-version): newest wins → 00h:1, 01h:2, 02h:2, 03h:2
    assert(st.getLc("p", 1).collect().map(_.getAs[Double]("value")).toSeq
      === Seq(1.0, 2.0, 2.0, 2.0))

    // order_by=('version',): oldest wins → 00h:1, 01h:1, 02h:1, 03h:2
    assert(st.getLc("p", 1, orderBy = Seq("version")).collect()
      .map(_.getAs[Double]("value")).toSeq === Seq(1.0, 1.0, 1.0, 2.0))

    // custom_filters with a Django __-lookup
    val hi = st.getLc("p", 1, customFilters = Map("version__gte" -> 1)).collect()
    assert(hi.map(_.getAs[Double]("value")).toSeq === Seq(2.0, 2.0, 2.0))
  }
}

class SyncSpec extends SparkSpec {
  import spark.implicits._

  private val keySchema = StructType(Seq(
    StructField("version", IntegerType), StructField("kind", StringType)))

  private def syncStore(): ChunkStore =
    new ChunkStore(spark, tmpDir("sync"), keySchema,
      StoreConfig(freq = "1h", tz = "UTC", chunkAxis = YearMonthAxis, syncEnabled = true))

  private def hourly(start: String, hours: Int, v: Double): DataFrame = {
    val t0 = java.time.LocalDateTime.parse(start)
    (0 until hours).map(i => (t0.plusHours(i), v)).toDF("ts", "value")
  }

  private val a1 = Map[String, Any]("version" -> 0, "kind" -> "a")
  private val a2 = Map[String, Any]("version" -> 0, "kind" -> "b")
  private val t0 = ldt("2024-06-01T00:00")

  test("full pull mirrors server; incremental pull only moves fresh chunks; tombstones propagate") {
    val server = syncStore(); val client = syncStore()
    server.setTs(a1, hourly("2024-01-15T00:00", 24 * 40, 1.0), update = true, now = t0) // Jan+Feb
    server.setTs(a2, hourly("2024-01-01T00:00", 24, 2.0), update = true, now = t0)
    // initial pull: a1 spans Jan 15 + 40d → Jan+Feb chunks; a2 → Jan chunk
    val n1 = Sync.pull(client, server, pageSize = 2)
    assert(n1 === 3)
    assert(client.yieldManyTs().count() === server.yieldManyTs().count())
    // idempotent re-pull: gte semantics re-list the boundary rows, content unchanged
    val n2 = Sync.pull(client, server)
    assert(n2 === 3)
    assert(client.yieldManyTs().count() === server.yieldManyTs().count())
    // server-side update of one chunk → pull moves just it (plus boundary)
    server.setTs(a2, hourly("2024-01-01T00:00", 24, 9.0), update = true, now = t0.plusHours(5))
    Sync.pull(client, server)
    assert(client.getTs(a2).collect().map(_.getDouble(1)).forall(_ === 9.0))
    // tombstone propagation
    server.delete(Map("kind" -> "a"), keepTracking = true, now = t0.plusHours(6))
    Sync.pull(client, server)
    assert(client.getTs(a1).collect().isEmpty)
    assert(client.load().filter(col("is_deleted")).count() === 2)
  }

  test("updates listing is gte-since, ordered, metadata-shaped") {
    val server = syncStore()
    server.setTs(a1, hourly("2024-01-01T00:00", 24, 1.0), update = true, now = t0)
    server.setTs(a2, hourly("2024-01-01T00:00", 24, 1.0), update = true, now = t0.plusHours(1))
    assert(Sync.updates(server, t0).count() === 2)              // gte includes boundary
    assert(Sync.updates(server, t0.plusHours(1)).count() === 1)
    val cols = Sync.updates(server, t0).columns.toSeq
    assert(cols === Seq("version", "kind", "chunk_index", "updated_at", "is_deleted"))
  }

  test("import_chunks validates before any write (atomic batch)") {
    val client = syncStore()
    val batch = Seq((0, "a", null.asInstanceOf[Integer], ldt("2024-01-01T00:00"), 1.0, false, t0))
      .toDF("version", "kind", "chunk_index", "ts", "value", "is_deleted", "updated_at")
    assertThrows[IllegalArgumentException](Sync.importChunks(client, batch))
    assert(client.load().count() === 0) // nothing written
  }

  test("plain insert / set_many / hard delete forbidden on sync-enabled store") {
    val st = syncStore()
    assertThrows[IllegalStateException](st.setTs(a1, hourly("2024-01-01T00:00", 3, 1.0), now = t0))
    assertThrows[IllegalStateException](
      st.setManyTs(Seq((0, "a", ldt("2024-01-01T00:00"), 1.0)).toDF("version", "kind", "ts", "value")))
  }

  // Crash-resume (reference test_chunk_timeserie_sync.py:223-261): pages
  // already imported persist; a fresh pull starts from the local
  // high-water mark and completes the mirror (gte re-fetches at most the
  // boundary row).
  test("crash between pages: partial import + fresh pull = full mirror") {
    val server = syncStore(); val client = syncStore()
    // three chunks with DISTINCT updated_at so resume has a real watermark
    server.setTs(a1, hourly("2024-01-01T00:00", 24, 1.0), update = true, now = t0)
    server.setTs(a2, hourly("2024-02-01T00:00", 24, 2.0), update = true, now = t0.plusHours(1))
    server.setTs(Map("version" -> 0, "kind" -> "c"),
      hourly("2024-03-01T00:00", 24, 3.0), update = true, now = t0.plusHours(2))
    // simulate a crash after one page: import only the first listed chunk
    val firstPage = Sync.updates(server, client.lastUpdatedAt()).limit(1)
    Sync.importChunks(client, Sync.exportChunks(server, firstPage))
    assert(client.load().select("kind", "chunk_index").distinct().count() === 1)
    // resume: fresh pull completes the mirror; the already-imported chunk
    // is at the since-boundary so at most it re-transfers (idempotent)
    Sync.pull(client, server, pageSize = 1)
    assert(client.yieldManyTs().count() === server.yieldManyTs().count())
    assert(client.yieldManyTs().except(server.yieldManyTs()).isEmpty)
  }

  test("page size never changes the outcome (1 / 2 / 200 parity)") {
    val server = syncStore()
    server.setTs(a1, hourly("2024-01-15T00:00", 24 * 40, 1.0), update = true, now = t0) // 2 chunks
    server.setTs(a2, hourly("2024-01-01T00:00", 24, 2.0), update = true, now = t0)
    for (ps <- Seq(1, 2, 200)) {
      val client = syncStore()
      assert(Sync.pull(client, server, pageSize = ps) === 3)
      assert(client.yieldManyTs().count() === server.yieldManyTs().count())
      assert(client.yieldManyTs().except(server.yieldManyTs()).isEmpty)
    }
  }

  // The updates listing (a full-server-store aggregation) must run ONCE per
  // pull, not once per page — pages slice the staged (localCheckpoint'ed)
  // frame. Counted by executed-plan signature: only the listing aggregates
  // max(updated_at) over the server path (exportChunks' distinct has no
  // max; client-side aggregations scan the client path).
  test("pull stages the updates listing once (no per-page re-aggregation)") {
    val server = syncStore(); val client = syncStore()
    server.setTs(a1, hourly("2024-01-15T00:00", 24 * 40, 1.0), update = true, now = t0) // Jan+Feb
    server.setTs(a2, hourly("2024-01-01T00:00", 24, 2.0), update = true, now = t0)
    val serverPath = server.path
    val listingAggs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
        val plan = qe.executedPlan.toString
        if (plan.contains("max(updated_at") && plan.contains(serverPath))
          listingAggs.incrementAndGet()
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      assert(Sync.pull(client, server, pageSize = 1) === 3) // 3 chunks → 3 pages
      // the listener bus is async — wait for quiescence
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      var last = -1
      while (System.nanoTime() < deadline && listingAggs.get() != last) {
        last = listingAggs.get(); Thread.sleep(500)
      }
      assert(listingAggs.get() === 1)
      assert(client.yieldManyTs().count() === server.yieldManyTs().count())
    } finally spark.listenerManager.unregister(listener)
  }
}
