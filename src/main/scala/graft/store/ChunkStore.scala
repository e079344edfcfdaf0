package graft.store

import graft.ts.{Combine, Grid, Resample}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parquet-backed chunked time-series store — the Spark re-expression of
  * the reference's `TimeseriesChunkStore`
  * (hostore/models/chunk_timeserie_store.py:180-899).
  *
  * Layout: ONE long-form parquet table per store, schema
  * `(businessKeys..., ts, value, is_deleted, updated_at)` partitioned by
  * `chunk_index` (year or year*12+month-1 in the store tz). What the
  * reference does with per-row lz4 blobs + a covering index, Parquet gives
  * natively: chunk pruning = partition pruning on `chunk_index`
  * (reference `_filter_interval` :855-861), key lookups = row-group
  * min/max skipping (we sort within partitions by the business keys at
  * write), compression = column encodings. Timestamps are stored (not
  * elided like the reference's start_ts+freq rebuild) but delta-encode to
  * almost nothing at fixed frequency.
  *
  * Series are persisted SPARSE (null points dropped); density is
  * reconstructed on read via the calendar grid. Observable behavior is
  * identical to the reference's dense padding because reads default to
  * bounds-NaN trimming (chunk_timeserie_store.py:884-885) — see
  * SURVEY.md §7.4(3).
  *
  * Tombstones: a soft-deleted series keeps one row per previously-occupied
  * chunk with `is_deleted=true, ts/value = null` and a fresh `updated_at`
  * (reference ChunkQuerySet.delete :30-52, EMPTY_DATA :27) so incremental
  * sync can propagate deletions.
  *
  * Concurrency: one writer at a time per store, enforced by an advisory
  * [[WriterLock]] around every mutator (the reference's row-lock upsert,
  * `select_for_update` at chunk_timeserie_store.py:789, re-expressed at
  * store granularity over the staged-overwrite protocol). Readers never
  * block — they only ever see fully-committed parquet. Disable via
  * `StoreConfig(lockWrites = false)` for single-writer deployments.
  */
class ChunkStore(
    val spark: SparkSession,
    val path: String,
    val keySchema: StructType,
    val config: StoreConfig = StoreConfig()) {

  import ChunkStore._

  val keys: Seq[String] = keySchema.fields.map(_.name).toSeq

  /** Serialize store mutations — the reference's transactional row lock
    * (`select_for_update`, chunk_timeserie_store.py:786-813) re-expressed
    * at store granularity over the staged-overwrite protocol (see
    * [[WriterLock]]). Reentrant, so composed mutators (`setTs(replace)` →
    * tombstone path, `compactIfNeeded` → `compact`) lock once. No-op when
    * `config.lockWrites` is off (single-writer deployments).
    */
  private[graft] def locked[T](f: => T): T =
    if (config.lockWrites) WriterLock.withLock(path)(f) else f

  private def chunkIndexCol(ts: Column): Column = config.chunkAxis match {
    case YearAxis      => Grid.chunkIndexYearly(ts, config.tz)
    case YearMonthAxis => Grid.chunkIndexMonthly(ts, config.tz)
  }

  /** Full long-form schema, keys first. `dtype` records the source value
    * type of the write (Spark simpleString, e.g. "bigint") so reads can
    * restore it — the reference stores dtype per chunk row and casts back
    * on read (chunk_timeserie_store.py:187,776; int round-trip in
    * tests/tests_basics.py:29). Pre-dtype store files read it as null
    * (= double, the historical behavior).
    */
  def schema: StructType = StructType(
    keySchema.fields.toSeq ++ Seq(
      StructField("chunk_index", IntegerType),
      StructField("ts", TimestampNTZType),
      StructField("value", DoubleType),
      StructField("dtype", StringType),
      StructField("is_deleted", BooleanType, nullable = false),
      StructField("updated_at", TimestampNTZType)))

  /** Register this store as a SQL view: live rows only (tombstones
    * filtered), long-form schema — after this, `spark.sql("SELECT ... FROM
    * <name>")` works against the store with partition pruning intact,
    * which is the migration path for SQL-first users of the reference.
    */
  def createOrReplaceView(name: String): Unit =
    load().filter(!col("is_deleted") && col("ts").isNotNull)
      .drop("is_deleted")
      .createOrReplaceTempView(name)

  /** Current store content; empty frame with the right schema when the
    * store has never been written.
    */
  def load(): DataFrame =
    if (new java.io.File(path).exists())
      spark.read.schema(schema).parquet(path)
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  private def attrFilter(attrs: Map[String, Any]): Column =
    attrs.map { case (k, v) => col(k) === lit(v) }.reduceOption(_ && _).getOrElse(lit(true))

  /** Partition pruning: literal chunk_index bound for an instant, like the
    * reference's `_filter_interval` (chunk_timeserie_store.py:855-861).
    */
  private def chunkOf(z: java.time.ZonedDateTime): Int = config.chunkAxis match {
    case YearAxis      => Grid.chunkRangeYearly(z, z, config.tz)._1
    case YearMonthAxis => Grid.chunkRangeMonthly(z, z, config.tz)._1
  }

  private def requireAllKeys(attrs: Map[String, Any]): Unit = {
    val missing = keys.filterNot(attrs.contains)
    require(missing.isEmpty, s"all business keys must be specified; missing: ${missing.mkString(",")}")
    val unknown = attrs.keys.filterNot(keys.contains)
    require(unknown.isEmpty, s"unknown attrs: ${unknown.mkString(",")}")
  }

  /** Normalize an input series frame: (ts, value) → cast, drop null
    * points (reference `_normalize_serie`/`_normalize_index`,
    * chunk_timeserie_store.py:699-743). LAZY — the empty/all-null skip
    * (":720-722") is decided by [[setTs]]'s fused probe job, not a
    * dedicated isEmpty action. `srcDtype` is the value type BEFORE the
    * double coercion, so reads can cast back (reference dtype
    * round-trip).
    */
  private def normalized(series: DataFrame, srcDtype: String): DataFrame =
    series
      .select(col("ts").cast(TimestampNTZType).as("ts"), col("value").cast(DoubleType).as("value"))
      .filter(col("value").isNotNull && !isnan(col("value")) && col("ts").isNotNull)
      .withColumn("dtype", lit(srcDtype))

  def exists(attrs: Map[String, Any]): Boolean =
    !load().filter(attrFilter(attrs) && !col("is_deleted")).isEmpty

  /** Write one series under `attrs`. Mirrors `set_ts`
    * (chunk_timeserie_store.py:309-373): plain insert refuses duplicates
    * and is forbidden when sync is enabled; `update` merges
    * new.combine_first(existing) per chunk; `replace` hard-replaces
    * overlapped chunks and tombstones the series' other chunks.
    * Returns false when the series was skipped (empty/all-null).
    */
  def setTs(
      attrs: Map[String, Any],
      series: DataFrame,
      update: Boolean = false,
      replace: Boolean = false,
      now: java.time.LocalDateTime = java.time.LocalDateTime.now(java.time.ZoneOffset.UTC)): Boolean = locked {
    require(!(update && replace), "update and replace are mutually exclusive")
    requireAllKeys(attrs)
    if (config.syncEnabled && !update && !replace)
      throw new IllegalStateException("plain insert is forbidden on a sync-enabled store; use update or replace")
    val srcDtype = series.schema("value").dataType.simpleString
    val s = normalized(series, srcDtype)
    val newRows = finishRows(attachAttrs(s, attrs), now)
    // ONE probe job answers every pre-write question (r12 follow-up #2 —
    // previously an isEmpty + exists/affected/overlapped chain of 2-3
    // scheduler round-trips): the new write's distinct chunk indexes
    // (empty ⇔ the normalized series lost every row → skip, the
    // reference's _normalize_serie → None), unioned with this series'
    // STORED chunk indexes where a mode needs them (replace: tombstone
    // scope over all my rows incl. existing tombstones; insert: the
    // existence refusal probes live rows only). All sides are
    // metadata-sized (distinct chunk lists).
    val newChunksDf = newRows.select(col("chunk_index")).distinct()
      .select(col("chunk_index"), lit(true).as("__new"))
    val probeDf =
      if (update) newChunksDf
      else {
        val minePred =
          if (replace) attrFilter(attrs) else attrFilter(attrs) && !col("is_deleted")
        newChunksDf.unionAll(
          load().filter(minePred).select(col("chunk_index")).distinct()
            .select(col("chunk_index"), lit(false).as("__new")))
      }
    val probe = probeDf.collect().map(r => (r.getInt(0), r.getBoolean(1)))
    val newChunks  = probe.collect { case (c, true) => c }.toSeq
    val mineChunks = probe.collect { case (c, false) => c }.toSeq
    if (newChunks.isEmpty) false // empty / all-null series: skipped
    else {
      if (!update && !replace && mineChunks.nonEmpty)
        throw new IllegalStateException(s"series already exists for $attrs (IntegrityError parity)")
      if (update) upsertChunks(attrs, newRows, newChunks, srcDtype, now)
      else if (replace) replaceChunks(attrs, newRows, newChunks, mineChunks, now)
      else appendRows(newRows)
      true
    }
  }

  /** Bulk insert of many series (reference `set_many_ts`,
    * chunk_timeserie_store.py:418-455): insert-only, forbidden when sync
    * is enabled, duplicates refused. `many` carries the full long form
    * (businessKeys..., ts, value) already unioned — one write job.
    */
  def setManyTs(
      many: DataFrame,
      now: java.time.LocalDateTime = java.time.LocalDateTime.now(java.time.ZoneOffset.UTC)): Unit = locked {
    if (config.syncEnabled)
      throw new IllegalStateException("set_many_ts is forbidden on a sync-enabled store")
    val s = many
      .withColumn("dtype", lit(many.schema("value").dataType.simpleString))
      .withColumn("ts", col("ts").cast(TimestampNTZType))
      .withColumn("value", col("value").cast(DoubleType))
      .filter(col("value").isNotNull && !isnan(col("value")) && col("ts").isNotNull)
    val dup = s.select(keys.map(col): _*).distinct()
      .join(load().filter(!col("is_deleted")).select(keys.map(col): _*).distinct(), keys, "left_semi")
    if (!dup.isEmpty)
      throw new IllegalStateException("set_many_ts: some series already exist (IntegrityError parity)")
    appendRows(finishRows(s, now))
  }

  /** Bulk upsert of MANY series in one job — the multi-series form of
    * `set_ts(update=True)` and the micro-batch sink primitive for
    * streaming ingest (graft.streaming.StreamIngest.ingestToStore).
    * `rows` carries (businessKeys..., ts, value); per (keys, ts) new
    * points win over existing (`combine_first`), series not present in
    * `rows` are rewritten verbatim, and only the affected chunk
    * partitions are touched (staged dynamic overwrite).
    */
  def upsertManyTs(
      rows: DataFrame,
      now: java.time.LocalDateTime = java.time.LocalDateTime.now(java.time.ZoneOffset.UTC)): Unit = locked {
    val srcDtype = rows.schema("value").dataType.simpleString
    val s = rows
      .withColumn("dtype", lit(srcDtype))
      .withColumn("ts", col("ts").cast(TimestampNTZType))
      .withColumn("value", col("value").cast(DoubleType))
      .filter(col("value").isNotNull && !isnan(col("value")) && col("ts").isNotNull)
    if (s.isEmpty) ()
    else upsertManyTsNonEmpty(s, srcDtype, now)
  }

  private def upsertManyTsNonEmpty(s: DataFrame, srcDtype: String, now: java.time.LocalDateTime): Unit = {
    val newRows  = finishRows(s, now)
    val affected = newRows.select("chunk_index").distinct().collect().map(_.getInt(0)).toSeq
    val cur      = load().filter(col("chunk_index").isin(affected: _*))
    val newKeys  = s.select(keys.map(col): _*).distinct()
    val mine     = cur.join(newKeys, keys, "left_semi")
      .filter(!col("is_deleted") && col("ts").isNotNull)
    val others   = cur.join(newKeys, keys, "left_anti")
    val merged = Combine.combineFirst(
      Seq(newRows.select((keys.map(col) :+ col("ts") :+ col("value")): _*),
          mine.select((keys.map(col) :+ col("ts") :+ col("value")): _*)),
      keys)
    overwritePartitions(
      others.unionByName(finishRows(merged.withColumn("dtype", lit(srcDtype)), now)), affected)
  }

  /** Read one series (reference `get_ts`,
    * chunk_timeserie_store.py:375-416): all keys required, tombstones
    * excluded, chunk-range pruning from the requested interval, inclusive
    * time slice, leading/trailing-null trim. Returns the long-form
    * (ts, value) frame ordered by ts.
    *
    * The stored `dtype` is restored on egress (reference
    * chunk_timeserie_store.py:776: blob values are cast back to the chunk
    * row's recorded dtype) — an int series round-trips as ints. The dtype
    * probe is ONE Spark job at call time (the returned frame itself stays
    * lazy): a per-partition set fold over only the `dtype` column of the
    * pruned chunks (capped at two values — the cast decision needs no
    * more), no shuffle, and parquet reads just the dtype pages under the
    * same pushed filters. Chunks written with different dtypes
    * fall back to double (one frame, one value type), and a pre-dtype
    * chunk (null dtype — historically double data) counts AS double, so a
    * series mixing legacy and typed chunks can never be silently
    * truncated by a non-double cast.
    *
    * `dropBoundsNa=false` (reference get_ts's flag,
    * chunk_timeserie_store.py:376,884-885): the reference PERSISTS each
    * chunk as the full store-freq grid NaN-padded over its chunk calendar
    * (`_normalize_index` + `_chunk`, :707-754), and the undropped read is
    * `pd.concat` of the surviving chunks' grids (:413) — per STORED chunk,
    * nothing for an absent chunk. An incremental series whose writes left
    * a hole (update=True writes for Jan then Mar — no Feb row exists)
    * comes back with the hole OMITTED, not null-filled. This engine
    * stores sparsely (equivalent under the default) and reconstructs that
    * form on demand: the distinct surviving chunk indexes (driver-side —
    * metadata-sized, same pruned read as the dtype probe) each explode
    * their own chunk calendar (restarting at the chunk's DST-correct
    * local start, exactly the reference's per-chunk blob grid), then a
    * left join of the values and the same inclusive time slice. One
    * documented divergence: a wholly-null INTERIOR month of a single
    * write is stored by the reference as an all-NaN blob (its write-span
    * padding) but dropped here (null rows are never stored), so that
    * month's slots are absent from our dense read; the reference's own
    * `yield_many_ts` assumes chunk contiguity (it crashes on a hole,
    * :488-491), so the stored-chunks-only shape is the one the reference
    * reliably exhibits.
    */
  def getTs(
      attrs: Map[String, Any],
      start: Option[java.time.ZonedDateTime] = None,
      end: Option[java.time.ZonedDateTime] = None,
      dropBoundsNa: Boolean = true): DataFrame = {
    requireAllKeys(attrs)
    var df = load().filter(attrFilter(attrs) && !col("is_deleted") && col("ts").isNotNull)
    start.foreach(z => df = df.filter(col("chunk_index") >= chunkOf(z) && col("ts") >= lit(toNtz(z))))
    end.foreach(z => df = df.filter(col("chunk_index") <= chunkOf(z) && col("ts") <= lit(toNtz(z))))
    val sparse = df.select(col("ts"), col("value"))
    // ONE metadata-sized job either way (per-partition fold, no shuffle —
    // a distinct+limit plan costs extra AQE jobs): the sparse path probes
    // only the dtype column (set capped at 2 — the cast decision needs no
    // more); the dense path also folds the distinct chunk indexes,
    // bounded by the series' chunk count
    val dt = coalesce(col("dtype"), lit("double")).as("dt")
    val (dts, chunks) =
      if (dropBoundsNa)
        (df.select(dt).rdd.aggregate(Set.empty[String])(
          (s, r) => if (s.size >= 2) s else s + r.getString(0), _ ++ _),
          Set.empty[Int])
      else
        df.select(dt, col("chunk_index"))
          .rdd.aggregate((Set.empty[String], Set.empty[Int]))(
            { case ((s, c), r) =>
              (if (s.size >= 2) s else s + r.getString(0), c + r.getInt(1)) },
            { case ((s1, c1), (s2, c2)) => (s1 ++ s2, c1 ++ c2) })
    val out =
      if (dropBoundsNa || chunks.isEmpty) sparse.orderBy("ts")
      else {
        import spark.implicits._
        var dense = chunks.toSeq.sorted.toDF("__ci")
          .select(explode(chunkCalendar(col("__ci"))).as("ts"))
          .join(sparse, Seq("ts"), "left")
        start.foreach(z => dense = dense.filter(col("ts") >= lit(toNtz(z))))
        end.foreach(z => dense = dense.filter(col("ts") <= lit(toNtz(z))))
        dense.orderBy("ts")
      }
    if (dts.size == 1 && dts.head != "double")
      out.withColumn("value", col("value").cast(dts.head))
    else out
  }

  /** One chunk's store-freq calendar as an in-plan timestamp sequence —
    * the reference's per-chunk blob grid (`_normalize_index` date_range
    * sliced by `_chunk`, chunk_timeserie_store.py:735-754): inclusive of
    * the chunk's DST-correct local start, exclusive of the next chunk's.
    * Shared by both dense (`dropBoundsNa=false`) read forms so the
    * single- and multi-series grids can never diverge.
    */
  private def chunkCalendar(ci: Column): Column = {
    val step = expr("make_dt_interval(0, 0, 0, 1)") * config.freqSecs
    def startOf(idx: Column): Column = {
      val local = config.chunkAxis match {
        case YearAxis      => make_timestamp_ntz(idx, lit(1), lit(1), lit(0), lit(0), lit(0))
        case YearMonthAxis => make_timestamp_ntz((idx / 12).cast("int"), pmod(idx, lit(12)) + 1,
          lit(1), lit(0), lit(0), lit(0))
      }
      convert_timezone(lit(config.tz), lit("UTC"), local)
    }
    sequence(startOf(ci), startOf(ci + 1) - step, step)
  }

  /** Streaming grouped read (reference `yield_many_ts`,
    * chunk_timeserie_store.py:457-517): partial key filters allowed,
    * tombstones out, optional [start, end] slice with chunk pruning,
    * ordered by (keys..., ts). Long form needs no reassembly; Spark's
    * sort-based shuffle plays the reference's buffered iterator.
    */
  def yieldManyTs(
      filters: Map[String, Any] = Map.empty,
      start: Option[java.time.ZonedDateTime] = None,
      end: Option[java.time.ZonedDateTime] = None,
      dropBoundsNa: Boolean = true): DataFrame = {
    // Django `__`-lookups accepted (gte/lte/gt/lt/in/isnull): the reference
    // strips lookup suffixes before validating names (`_check_attrs`,
    // chunk_timeserie_store.py:889-899) and forwards the raw dict to
    // objects.filter(**filters).
    val unknown = Lookups.baseFields(filters).filterNot(keys.contains)
    require(unknown.isEmpty, s"Unknown attribute(s) ${unknown.mkString(",")}")
    val cond = Lookups.compile(filters).getOrElse(lit(true))
    var df = load().filter(cond && !col("is_deleted") && col("ts").isNotNull)
    start.foreach(z => df = df.filter(col("chunk_index") >= chunkOf(z) && col("ts") >= lit(ChunkStore.toNtz(z))))
    end.foreach(z => df = df.filter(col("chunk_index") <= chunkOf(z) && col("ts") <= lit(ChunkStore.toNtz(z))))
    val sparse = df.select((keys.map(col) :+ col("ts") :+ col("value")): _*)
    if (dropBoundsNa)
      return sparse.orderBy((keys.map(col) :+ col("ts")): _*)
    // dense form (reference yield_many_ts(drop_bounds_na=False),
    // chunk_timeserie_store.py:459,488-491): per key, each STORED chunk's
    // own store-freq grid (matching the get_ts concat of per-chunk blob
    // grids — an absent middle chunk contributes nothing; see the getTs
    // scaladoc for the hole semantics). Scale shape: one row per distinct
    // (key, chunk), each exploding only its own chunk's calendar (the
    // same per-chunk bound as the reference's blobs), then a left join of
    // the values. No driver-side collection and no whole-span arrays.
    val grid = df.select((keys.map(col) :+ col("chunk_index").as("__ci")): _*).distinct()
      .withColumn("ts", explode(chunkCalendar(col("__ci"))))
      .select((keys.map(col) :+ col("ts")): _*)
    var dense = grid.join(sparse, keys :+ "ts", "left")
    start.foreach(z => dense = dense.filter(col("ts") >= lit(ChunkStore.toNtz(z))))
    end.foreach(z => dense = dense.filter(col("ts") <= lit(ChunkStore.toNtz(z))))
    dense.orderBy((keys.map(col) :+ col("ts")): _*)
  }

  /** Keyed multi-series read in ONE job: `getTs` semantics for a list of
    * full-key specs, via a broadcast semi-join of the spec list against
    * the store — never a per-series loop of jobs (the reference loops
    * `get_ts` client-side; at scale one scan must serve all series).
    * Output: (keys..., ts, value) ordered by (keys..., ts).
    */
  def getManyTs(
      attrsList: Seq[Map[String, Any]],
      start: Option[java.time.ZonedDateTime] = None,
      end: Option[java.time.ZonedDateTime] = None): DataFrame = {
    attrsList.foreach(requireAllKeys)
    val specSchema = StructType(keys.map(k => keySchema(keySchema.fieldIndex(k))))
    val specRows = attrsList.map(a => org.apache.spark.sql.Row.fromSeq(keys.map(a(_))))
    val specDf = spark.createDataFrame(
      spark.sparkContext.parallelize(specRows, 1), specSchema)
    var df = load().filter(!col("is_deleted") && col("ts").isNotNull)
      .join(broadcast(specDf), keys, "left_semi")
    start.foreach(z => df = df.filter(col("chunk_index") >= chunkOf(z) && col("ts") >= lit(ChunkStore.toNtz(z))))
    end.foreach(z => df = df.filter(col("chunk_index") <= chunkOf(z) && col("ts") <= lit(ChunkStore.toNtz(z))))
    df.select((keys.map(col) :+ col("ts") :+ col("value")): _*)
      .orderBy((keys.map(col) :+ col("ts")): _*)
  }

  /** Small-file compaction: rewrite the given (default: all) chunk
    * partitions through the staged-overwrite protocol — each partition
    * comes out as a single sorted file instead of one file per historical
    * append/update. Returns the number of partitions compacted. Run it as
    * maintenance after many incremental writes; readers see the same rows.
    */
  def compact(partitions: Option[Seq[Int]] = None): Int = locked {
    val parts = partitions.getOrElse(
      load().select("chunk_index").distinct().collect().map(_.getInt(0)).toSeq)
    if (parts.isEmpty) 0
    else {
      overwritePartitions(load().filter(col("chunk_index").isin(parts: _*)), parts)
      parts.length
    }
  }

  /** Policy form of [[compact]]: rewrite only the chunk partitions whose
    * parquet-file count exceeds `maxFilesPerPartition` (append-mode
    * writes add a file per touched partition; streaming ingest compounds
    * it batch after batch). File counts come from a cheap directory
    * listing — no data scan for partitions already compact. Explicit
    * call, not a write hook: schedule it after bulk loads / on a timer
    * next to a streaming ingest. Returns the partitions compacted.
    */
  def compactIfNeeded(maxFilesPerPartition: Int = 8): Seq[Int] = locked {
    require(maxFilesPerPartition >= 1, "maxFilesPerPartition must be >= 1")
    val parts = Option(new java.io.File(path).listFiles()).toSeq.flatten
      .filter(d => d.isDirectory && d.getName.startsWith("chunk_index="))
      .filter(d => Option(d.listFiles()).toSeq.flatten
        .count(_.getName.endsWith(".parquet")) > maxFilesPerPartition)
      .map(_.getName.stripPrefix("chunk_index=").toInt)
    if (parts.nonEmpty) compact(Some(parts))
    parts
  }

  /** All chunk partitions present on disk, from a directory listing —
    * free relative to any scan (the same listing the parquet reader does
    * for partition discovery; on a real lakehouse it is one namenode/
    * object-store LIST).
    */
  private def listChunkPartitions(): Seq[Int] =
    Option(new java.io.File(path).listFiles()).toSeq.flatten
      .filter(d => d.isDirectory && d.getName.startsWith("chunk_index="))
      .map(_.getName.stripPrefix("chunk_index=").toInt)

  /** Latest non-null timestamp across matching series, None when empty
    * (reference `get_max_horodate`, chunk_timeserie_store.py:519-539).
    * The max-chunk candidate comes from the partition DIRECTORY LISTING
    * (the reference's max-chunk index shortcut, :531 — and the same
    * listing `compactIfNeeded` uses), so the common case scans exactly ONE
    * pruned partition instead of aggregating max(chunk_index) over every
    * partition first. A partition can be empty FOR THE FILTERS (other
    * series' chunks, tombstones), so walk downward; after `probeLimit`
    * misses fall back to the two-pass aggregation rather than issuing a
    * job per remaining partition.
    */
  def maxHorodate(filters: Map[String, Any] = Map.empty): Option[java.time.LocalDateTime] = {
    val live = load().filter(attrFilter(filters) && !col("is_deleted") && col("value").isNotNull)
    val probeLimit = 3
    val candidates = listChunkPartitions().sorted(Ordering[Int].reverse)
    for (p <- candidates.take(probeLimit)) {
      // literal chunk_index predicate → PartitionFilters: one-partition scan
      val r = live.filter(col("chunk_index") === lit(p)).agg(max("ts")).head()
      if (!r.isNullAt(0)) return Some(r.getAs[java.time.LocalDateTime](0))
    }
    if (candidates.length <= probeLimit) None
    else {
      // the newest partitions held nothing for these filters — one
      // bounded fallback over the rest, not a job per partition
      val rest = live.filter(col("chunk_index") < lit(candidates(probeLimit - 1)))
      val maxChunk = rest.agg(max("chunk_index")).head()
      if (maxChunk.isNullAt(0)) None
      else {
        val r = rest.filter(col("chunk_index") === maxChunk.getInt(0)).agg(max("ts")).head()
        if (r.isNullAt(0)) None else Some(r.getAs[java.time.LocalDateTime](0))
      }
    }
  }

  /** Max `updated_at` under filters; empty → 2000-01-01 in store tz
    * (reference `last_updated_at`, chunk_timeserie_store.py:288-307).
    */
  def lastUpdatedAt(filters: Map[String, Any] = Map.empty): java.time.LocalDateTime = {
    val r = load().filter(attrFilter(filters)).agg(max("updated_at")).head()
    if (r.isNullAt(0))
      java.time.ZonedDateTime.of(2000, 1, 1, 0, 0, 0, 0, java.time.ZoneId.of(config.tz))
        .withZoneSameInstant(java.time.ZoneOffset.UTC).toLocalDateTime
    else r.getAs[java.time.LocalDateTime](0)
  }

  def maxChunkIndex(): Option[Int] = {
    val r = load().filter(!col("is_deleted")).agg(max("chunk_index")).head()
    if (r.isNullAt(0)) None else Some(r.getInt(0))
  }

  /** Soft delete matching series (reference ChunkQuerySet.delete with
    * keep_tracking — chunk_timeserie_store.py:30-52): every live chunk of
    * a matched series collapses to one tombstone row with fresh
    * `updated_at`. Hard delete (keepTracking=false) physically removes
    * rows and is refused when sync is enabled.
    */
  def delete(
      filters: Map[String, Any],
      keepTracking: Boolean = true,
      now: java.time.LocalDateTime = java.time.LocalDateTime.now(java.time.ZoneOffset.UTC)): Unit = locked {
    if (!keepTracking && config.syncEnabled)
      throw new IllegalStateException("hard delete is forbidden on a sync-enabled store")
    val cur = load()
    val hit = attrFilter(filters)
    val affected = cur.filter(hit).select("chunk_index").distinct().collect().map(_.getInt(0))
    if (affected.nonEmpty) {
      val kept = cur.filter(col("chunk_index").isin(affected.toSeq: _*)).filter(!hit)
      val content =
        if (!keepTracking) kept
        else {
          val tombs = cur.filter(hit)
            .select((keys.map(col) :+ col("chunk_index")): _*).distinct()
            .withColumn("ts", lit(null).cast(TimestampNTZType))
            .withColumn("value", lit(null).cast(DoubleType))
            .withColumn("dtype", lit(null).cast(StringType))
            .withColumn("is_deleted", lit(true))
            .withColumn("updated_at", lit(now))
          kept.unionByName(tombs.select(schema.fieldNames.map(col): _*))
        }
      overwritePartitions(content, affected.toSeq)
    }
  }

  // ---- write-path internals -------------------------------------------

  private def attachAttrs(s: DataFrame, attrs: Map[String, Any]): DataFrame =
    keys.foldLeft(s)((d, k) => d.withColumn(k, lit(attrs(k)).cast(keySchema(k).dataType)))

  /** Add chunk_index / is_deleted / updated_at and order columns. Frames
    * without a dtype column (internal rebuilds of already-double rows)
    * default to "double".
    */
  private def finishRows(s: DataFrame, now: java.time.LocalDateTime): DataFrame = {
    val withD = if (s.columns.contains("dtype")) s else s.withColumn("dtype", lit("double"))
    withD.withColumn("chunk_index", chunkIndexCol(col("ts")))
      .withColumn("is_deleted", lit(false))
      .withColumn("updated_at", lit(now))
      .select(schema.fieldNames.map(col): _*)
  }

  private def appendRows(rows: DataFrame): Unit =
    rows
      .repartition(col("chunk_index"))
      .sortWithinPartitions((keys.map(col) :+ col("ts")): _*) // row-group skipping on keys
      .write.mode(SaveMode.Append).partitionBy("chunk_index").parquet(path)

  /** `update`: per overlapped chunk, new.combine_first(existing) for this
    * series; other series in the partition are rewritten verbatim
    * (reference `_update_chunk_with_existing`,
    * chunk_timeserie_store.py:782-813 — txn → staged overwrite).
    */
  private def upsertChunks(attrs: Map[String, Any], newRows: DataFrame, affected: Seq[Int],
      dtype: String, now: java.time.LocalDateTime): Unit = {
    val cur      = load().filter(col("chunk_index").isin(affected: _*))
    val mine     = cur.filter(attrFilter(attrs) && !col("is_deleted") && col("ts").isNotNull)
    val merged = Combine.combineFirst(
        Seq(newRows.select((keys.map(col) :+ col("ts") :+ col("value")): _*),
            mine.select((keys.map(col) :+ col("ts") :+ col("value")): _*)),
        keys)
    // the new write's dtype wins for the merged chunks (reference updates
    // the chunk row's dtype on upsert)
    val mergedRows = finishRows(merged.withColumn("dtype", lit(dtype)), now)
    val others     = cur.filter(!attrFilter(attrs))
    overwritePartitions(others.unionByName(mergedRows), affected)
  }

  /** `replace`: overlapped chunks get exactly the new data; the series'
    * other live chunks become tombstones (reference set_ts replace path,
    * chunk_timeserie_store.py:357-370).
    */
  private def replaceChunks(attrs: Map[String, Any], newRows: DataFrame,
      overlapped: Seq[Int], mineAll: Seq[Int], now: java.time.LocalDateTime): Unit = {
    val cur        = load()
    val myOther    = mineAll.filterNot(overlapped.toSet)
    val affected   = (overlapped ++ myOther).distinct
    val scope      = cur.filter(col("chunk_index").isin(affected: _*))
    val others     = scope.filter(!attrFilter(attrs))
    val tombs = scope.filter(attrFilter(attrs) && col("chunk_index").isin(myOther: _*))
      .select((keys.map(col) :+ col("chunk_index")): _*).distinct()
      .withColumn("ts", lit(null).cast(TimestampNTZType))
      .withColumn("value", lit(null).cast(DoubleType))
      .withColumn("dtype", lit(null).cast(StringType))
      .withColumn("is_deleted", lit(true))
      .withColumn("updated_at", lit(now))
      .select(schema.fieldNames.map(col): _*)
    overwritePartitions(others.unionByName(newRows).unionByName(tombs), affected)
  }

  /** Staged rewrite of a set of chunk partitions: write the new content to
    * a hidden staging dir (invisible to parquet readers), read it back,
    * dynamic-partition-overwrite the store, drop staging. This is the
    * Parquet stand-in for the reference's DB transaction (SURVEY.md §7.4
    * (4)); without staging Spark refuses to overwrite a path it is reading.
    */
  private[graft] def overwriteChunkPartitions(content: DataFrame, partitions: Seq[Int]): Unit =
    overwritePartitions(content, partitions)

  private def overwritePartitions(content: DataFrame, partitions: Seq[Int]): Unit = {
    if (partitions.isEmpty) return
    // Sibling staging dir (outside the store root): dynamic overwrite only
    // touches matching chunk_index partitions, but keeping staging out of
    // the tree avoids reader/lister interference entirely.
    val staging = s"${path}__staging_${java.util.UUID.randomUUID().toString.take(8)}"
    try {
      content
        .repartition(col("chunk_index"))
        .sortWithinPartitions((keys.map(col) :+ col("ts")): _*)
        .write.mode(SaveMode.Overwrite).partitionBy("chunk_index").parquet(staging)
      // Dynamic overwrite only rewrites partitions PRESENT in the new
      // content. An affected partition whose rows all vanished (hard delete
      // of everything in the chunk) writes zero rows — remove its directory
      // explicitly, or the stale files stay visible forever.
      val present: Set[Int] = Option(new java.io.File(staging).listFiles()).toSeq.flatten
        .collect { case f if f.getName.startsWith("chunk_index=") =>
          f.getName.stripPrefix("chunk_index=").toInt }.toSet
      partitions.filterNot(present).foreach { p =>
        deleteRecursively(new java.io.File(path, s"chunk_index=$p"))
      }
      if (present.nonEmpty)
        spark.read.schema(schema).parquet(staging)
          .write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("chunk_index")
          .parquet(path)
    } finally deleteRecursively(new java.io.File(staging))
  }
}

object ChunkStore {
  /** Engine-UTC wall time of an instant, as LocalDateTime — `lit(...)` of
    * it is a TIMESTAMP_NTZ literal with no JVM-default-tz dependence (a
    * java.sql.Timestamp would re-interpret the wall time in JVM tz).
    */
  private[store] def toNtz(z: java.time.ZonedDateTime): java.time.LocalDateTime =
    z.withZoneSameInstant(java.time.ZoneOffset.UTC).toLocalDateTime

  private[store] def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
