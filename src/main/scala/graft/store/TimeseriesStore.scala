package graft.store

import graft.ts.Combine
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Non-chunked keyed time-series store — the Spark re-expression of the
  * reference's `TimeseriesStore` (hostore/models/timeserie_store.py:16-156):
  * one series per unique business-key tuple, whole-series writes, no
  * chunking, no tombstones, no sync.
  *
  * Layout: ONE long-form parquet table `(keys..., ts, value)` partitioned
  * by the business keys — each series is its own partition directory, so
  * a keyed read prunes to one directory (what the reference's unique
  * constraint + index give it), `set_ts` rewrites exactly one series via
  * dynamic partition overwrite (the reference re-encodes the whole blob
  * per set — same granularity), and `clear` is a directory drop. Partial
  * key filters (incl. Django `__`-lookups) prune on the partition columns.
  *
  * Error contract mirrors the reference's ValueError surface
  * (timeserie_store.py:118-141, tests_timeseries_store.py:86-133):
  * update+replace exclusive; set over an existing series without a flag
  * refused; flat get with zero or multiple matches refused; an all-null
  * series is skipped (returns false), not written.
  *
  * For chunked storage, tombstoned deletes, and incremental sync, use
  * [[ChunkStore]] — this facade exists so a reference user migrating a
  * plain `TimeseriesStore` model has a 1:1 class to land on.
  */
class TimeseriesStore(
    val spark: SparkSession,
    val path: String,
    val keySchema: StructType,
    val lockWrites: Boolean = true) {

  val keys: Seq[String] = keySchema.fields.map(_.name).toSeq
  require(keys.nonEmpty, "TimeseriesStore needs at least one business key")

  /** Serialize store mutations (reference row-lock parity; the same
    * [[WriterLock]] protocol as ChunkStore). The exists-probe +
    * combine-first + partition overwrite in `setTs` is a
    * read-modify-write exactly like the reference's locked upsert.
    */
  private def locked[T](f: => T): T =
    if (lockWrites) WriterLock.withLock(path)(f) else f

  def schema: StructType = StructType(
    keySchema.fields.toSeq ++ Seq(
      StructField("ts", TimestampNTZType),
      StructField("value", DoubleType)))

  def load(): DataFrame =
    if (new java.io.File(path).exists())
      spark.read.schema(schema).parquet(path)
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  private def attrFilter(attrs: Map[String, Any]): Column =
    attrs.map { case (k, v) => col(k) === lit(v) }.reduceOption(_ && _).getOrElse(lit(true))

  private def requireAllKeys(attrs: Map[String, Any]): Unit = {
    require(attrs != null, "ts_attributes is null")
    val missing = keys.filterNot(attrs.contains)
    require(missing.isEmpty, s"all business keys must be specified; missing: ${missing.mkString(",")}")
    val unknown = attrs.keys.filterNot(keys.contains)
    require(unknown.isEmpty, s"unknown attrs: ${unknown.mkString(",")}")
    require(attrs.values.forall(_ != null), "null key values are not allowed")
  }

  def exists(attrs: Map[String, Any]): Boolean =
    !load().filter(attrFilter(attrs)).isEmpty

  /** Write one series under `attrs` (reference `set_ts`,
    * timeserie_store.py:97-141): `update` merges new.combine_first(existing),
    * `replace` swaps the series wholesale, neither flag over an existing
    * series is refused (ValueError parity → IllegalArgumentException).
    * An empty / all-null series is skipped; returns false (the reference
    * logs and returns without writing).
    */
  def setTs(
      attrs: Map[String, Any],
      series: DataFrame,
      update: Boolean = false,
      replace: Boolean = false): Boolean = locked {
    if (update && replace)
      throw new IllegalArgumentException("update and replace are mutually exclusive")
    requireAllKeys(attrs)
    val s = series
      .select(col("ts").cast(TimestampNTZType).as("ts"), col("value").cast(DoubleType).as("value"))
      .filter(col("value").isNotNull && !isnan(col("value")) && col("ts").isNotNull)
    if (s.isEmpty) false else setTsNonEmpty(attrs, s, update, replace)
  }

  private def setTsNonEmpty(
      attrs: Map[String, Any], s: DataFrame, update: Boolean, replace: Boolean): Boolean = {
    val existed = exists(attrs)
    val content =
      if (!existed) s
      else if (update) {
        val existing = load().filter(attrFilter(attrs)).select(col("ts"), col("value"))
        // single-key combine: both frames are one series, keyed by a
        // constant — reuse the ordered-coalesce machinery with no keys
        Combine.combineFirst(
          Seq(s.withColumn("__k", lit(1)), existing.withColumn("__k", lit(1))), Seq("__k"))
          .drop("__k")
      } else if (replace) s
      else throw new IllegalArgumentException(
        s"Trying save over existing ts without update or replace option: $attrs")
    val withKeys = keys.foldLeft(content)((d, k) =>
      d.withColumn(k, lit(attrs(k)).cast(keySchema(k).dataType)))
      .select(schema.fieldNames.map(col): _*)
    // only the update merge reads existing store files into `content`
    overwriteSeriesPartition(withKeys, readsStore = update && existed)
    true
  }

  /** Bulk insert of many series in ONE staged write — the batch analogue
    * of [[setTs]], mirroring the chunked store's `set_many_ts` contract
    * (chunk_timeserie_store.py:419-449, adapted to the non-chunked
    * layout): insert-only (any series whose key tuple already exists is
    * refused wholesale — IntegrityError parity, the caller clears
    * upstream), null key values refused, null/NaN rows dropped (a series
    * that loses every row is simply absent, as `_normalize_serie → None`
    * skips it).
    *
    * `many` is long form `(keys..., ts, value)`. Where N sequential
    * [[setTs]] calls stage N parquet writes (and N existence probes),
    * this plans ONE write whose dynamic-partition overwrite lands every
    * new series directory in a single job — the shape that matters when
    * backfilling millions of series.
    */
  def setManyTs(many: DataFrame): Unit = locked {
    // key validation on the RAW batch, BEFORE row normalization — a
    // null-keyed row must refuse the batch even when its value is also
    // null/NaN (setTs parity: requireAllKeys runs before the series
    // filter)
    val nullKeyed = keys.map(col(_).isNull).reduce(_ || _)
    // the null-key count rides the materialization job as an observation
    // (the connectedComponents trick) instead of its own full pass over
    // the raw batch — checked BEFORE anything is written, and it still
    // sees the raw rows (the observe node sits ahead of the value
    // filter, so a null-keyed row with a null/NaN value still refuses
    // the batch — setTs parity)
    val nullKeyObs = org.apache.spark.sql.Observation()
    // key columns coerced to the store schema (setTs parity, which casts
    // via lit(attrs(k)).cast): a batch whose key dtypes differ (e.g. a
    // LongType column for an IntegerType key) would otherwise stage
    // parquet with mismatched physical types and die mid-write on the
    // schema'd read-back with an obscure parquet error
    // the surviving-row count rides the same job (a second observation
    // node after the filter), so the emptiness probe below costs no
    // extra action
    val rowObs = org.apache.spark.sql.Observation()
    val s = many
      .observe(nullKeyObs, sum(when(nullKeyed, 1L).otherwise(0L)).as("nk"))
      .select((keys.map(k => col(k).cast(keySchema(k).dataType).as(k)) :+
        col("ts").cast(TimestampNTZType).as("ts") :+
        col("value").cast(DoubleType).as("value")): _*)
      .filter(col("value").isNotNull && !isnan(col("value")) && col("ts").isNotNull)
      .observe(rowObs, count(lit(1)).as("n"))
      .localCheckpoint()
    require(Option(nullKeyObs.get("nk")).forall(_.asInstanceOf[Long] == 0L),
      "null key values are not allowed")
    val dup = s.select(keys.map(col): _*).distinct()
      .join(load().select(keys.map(col): _*).distinct(), keys, "left_semi")
    if (!dup.isEmpty)
      throw new IllegalStateException(
        "set_many_ts: some series already exist (IntegrityError parity)")
    if (Option(rowObs.get("n")).exists(_.asInstanceOf[Long] > 0L))
      overwriteSeriesPartition(s.select(schema.fieldNames.map(col): _*),
        readsStore = false) // insert-only: the batch is caller data
  }

  /** Read series matching (possibly partial) `filters`, Django
    * `__`-lookups accepted — the list form of the reference `get_ts`
    * (timeserie_store.py:59-95): long form `(keys..., ts, value)` ordered
    * by (keys..., ts); the key columns play the entry-attribute dict.
    */
  def getTs(filters: Map[String, Any] = Map.empty): DataFrame = {
    val unknown = Lookups.baseFields(filters).filterNot(keys.contains)
    require(unknown.isEmpty, s"Unknown attribute(s) ${unknown.mkString(",")}")
    val cond = Lookups.compile(filters).getOrElse(lit(true))
    load().filter(cond)
      .select((keys.map(col) :+ col("ts") :+ col("value")): _*)
      .orderBy((keys.map(col) :+ col("ts")): _*)
  }

  /** `get_ts(flat=True)`: exactly one series must match — zero or
    * multiple raise (ValueError parity). Returns (ts, value) ordered.
    */
  def getTsFlat(filters: Map[String, Any]): DataFrame = {
    val unknown = Lookups.baseFields(filters).filterNot(keys.contains)
    require(unknown.isEmpty, s"Unknown attribute(s) ${unknown.mkString(",")}")
    val cond = Lookups.compile(filters).getOrElse(lit(true))
    val matched = load().filter(cond)
      .select(keys.map(col): _*).distinct().limit(2).collect()
    if (matched.isEmpty)
      throw new IllegalArgumentException(s"No serie found for key $filters")
    if (matched.length > 1)
      throw new IllegalArgumentException(s"Multiple series found for key $filters")
    load().filter(cond).select(col("ts"), col("value")).orderBy("ts")
  }

  /** Delete matching series (reference `clear`, timeserie_store.py:144-156):
    * each matched series is one partition directory — a directory drop,
    * no rewrite of anything else.
    */
  def clear(filters: Map[String, Any]): Unit = locked {
    val unknown = Lookups.baseFields(filters).filterNot(keys.contains)
    require(unknown.isEmpty, s"Unknown attribute(s) ${unknown.mkString(",")}")
    val cond = Lookups.compile(filters).getOrElse(lit(true))
    val victims = load().filter(cond).select(keys.map(col): _*).distinct().collect()
    victims.foreach { r =>
      ChunkStore.deleteRecursively(new java.io.File(path, partitionDir(r)))
    }
  }

  /** The partition directory a key tuple lives in, using Spark's own
    * partition-path escaping so special characters round-trip.
    */
  private def partitionDir(r: org.apache.spark.sql.Row): String =
    keys.zipWithIndex.map { case (k, i) =>
      s"${ExternalCatalogUtils.escapePathName(k)}=${ExternalCatalogUtils.escapePathName(String.valueOf(r.get(i)))}"
    }.mkString("/")

  /** Staged dynamic-partition overwrite of the series partition(s) in
    * `content` (one for [[setTs]], many for [[setManyTs]]) — same trick
    * as ChunkStore.overwritePartitions: Spark refuses to overwrite a
    * path it is reading, so bounce through a sibling staging dir.
    */
  /** Land `content` into the store's per-series partitions (dynamic
    * overwrite: only the partitions present in `content` are touched).
    *
    * `readsStore = true` (the combine-on-write update path) routes
    * through an on-disk staging copy first: the content plan READS the
    * very files the overwrite replaces, and the staging hop is the
    * durable way to break that cycle (an in-memory checkpoint would die
    * with an executor mid-write and lose the merge). Content derived
    * purely from caller data skips the staging round-trip — one write
    * job instead of write + read-back + write.
    */
  private def overwriteSeriesPartition(content: DataFrame, readsStore: Boolean): Unit = {
    val prepared = content
      .repartition(keys.map(col): _*)
      .sortWithinPartitions((keys.map(col) :+ col("ts")): _*)
    if (!readsStore) {
      prepared.write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(keys: _*)
        .parquet(path)
      return
    }
    val staging = s"${path}__staging_${java.util.UUID.randomUUID().toString.take(8)}"
    try {
      prepared.write.mode(SaveMode.Overwrite).partitionBy(keys: _*).parquet(staging)
      spark.read.schema(schema).parquet(staging)
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(keys: _*)
        .parquet(path)
    } finally ChunkStore.deleteRecursively(new java.io.File(staging))
  }
}
