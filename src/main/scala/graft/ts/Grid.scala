package graft.ts

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Calendar-grid primitives: dense spine generation, chunk indexing and
  * chunk-aligned bounds.
  *
  * Re-expresses the reference's dense re-indexing machinery
  * (hostore/models/chunk_timeserie_store.py:731-762 `_normalize_index` /
  * `_chunk_index`, :832-843 index rebuild) Spark-first: the spine is a
  * distributed `spark.range` + timestamp arithmetic (scales to arbitrary
  * ranges — no single giant `sequence` array on one row), chunk indexes are
  * plain Catalyst expressions usable as partition columns so Catalyst's
  * partition pruning replaces the reference's `chunk_index__gte/lte`
  * hand-pruning (chunk_timeserie_store.py:855-861).
  */
object Grid {

  /** Seconds step of a fixed-frequency grid, from a pandas-style offset
    * string ("1h", "15min", "30s", "D"). Mirrors `pd_freq_fix`
    * (hostore/utils/timeseries.py:228-246): a bare unit means step 1.
    */
  def freqSeconds(freq: String): Long = {
    val m = "^([0-9]*)\\s*([A-Za-z]+)$".r
    freq.trim match {
      case m(n, unit) =>
        val k = if (n.isEmpty) 1L else n.toLong
        val secs = unit.toLowerCase match {
          case "s" | "sec" | "second" | "seconds"      => 1L
          case "min" | "t" | "minute" | "minutes"      => 60L
          case "h" | "hr" | "hour" | "hours"           => 3600L
          case "d" | "day" | "days"                    => 86400L
          case "w" | "week" | "weeks"                  => 604800L
          case other => throw new IllegalArgumentException(s"unsupported freq unit: $other")
        }
        k * secs
      case other => throw new IllegalArgumentException(s"unparseable freq: $other")
    }
  }

  /** Dense timestamp spine `[start, end]` (inclusive both ends when
    * `inclusiveRight`, else `[start, end)`) at a fixed step, as a 1-column
    * DataFrame `(ts)`. Distributed: `spark.range(n)` not a single
    * `sequence()` array, so a decade @ 1min (~5M rows) still parallelizes.
    */
  def spine(
      spark: SparkSession,
      start: java.time.LocalDateTime,
      end: java.time.LocalDateTime,
      freqSecs: Long,
      inclusiveRight: Boolean = true,
      tsCol: String = "ts"): DataFrame = {
    require(freqSecs > 0, "freq must be positive")
    val span = java.time.Duration.between(start, end).getSeconds
    val n0   = span / freqSecs
    val n    = if (inclusiveRight && span >= 0 && span % freqSecs == 0) n0 + 1
               else if (span < 0) 0L
               else n0 + (if (inclusiveRight) 1L else if (span % freqSecs == 0) 0L else 1L)
    spark.range(math.max(n, 0L))
      .select(
        (lit(start) // LocalDateTime → TIMESTAMP_NTZ literal, JVM-tz-proof
          + expr("make_dt_interval(0, 0, 0, 1)") * (col("id") * freqSecs)).as(tsCol))
  }

  /** Monthly chunk index `year*12 + month - 1` of `ts` interpreted in `tz`
    * (reference `_chunk_index`, chunk_timeserie_store.py:756-762). `ts` is
    * engine-UTC; the calendar fields are taken in the store tz.
    */
  def chunkIndexMonthly(ts: Column, tz: String): Column =
    (year(localIn(ts, tz)) * 12 + month(localIn(ts, tz)) - 1).cast("int")

  /** Yearly chunk index = local calendar year. */
  def chunkIndexYearly(ts: Column, tz: String): Column =
    year(localIn(ts, tz)).cast("int")

  /** Engine-UTC `ts` as a wall time in `tz`. UTC→UTC is the identity, and
    * skipping the per-row `convert_timezone` matters: the r14 job probe
    * measured the tz conversion as the bulk of a single-task 100k-row
    * chunk-index scan (ZoneId rules lookup per row for a no-op).
    */
  private def localIn(ts: Column, tz: String): Column = {
    val ntz = ts.cast("timestamp_ntz")
    if (tz == "UTC") ntz else convert_timezone(lit("UTC"), lit(tz), ntz)
  }

  /** Inclusive [lo, hi] chunk_index bounds covering `[start, end]` — the
    * partition-pruning predicate generator (reference `_filter_interval`,
    * chunk_timeserie_store.py:855-861). Computed driver-side so the
    * resulting filter is a literal range predicate Catalyst can prune
    * partitions with.
    */
  def chunkRangeMonthly(start: java.time.ZonedDateTime, end: java.time.ZonedDateTime, tz: String): (Int, Int) = {
    val z = java.time.ZoneId.of(tz)
    val s = start.withZoneSameInstant(z); val e = end.withZoneSameInstant(z)
    (s.getYear * 12 + s.getMonthValue - 1, e.getYear * 12 + e.getMonthValue - 1)
  }

  def chunkRangeYearly(start: java.time.ZonedDateTime, end: java.time.ZonedDateTime, tz: String): (Int, Int) = {
    val z = java.time.ZoneId.of(tz)
    (start.withZoneSameInstant(z).getYear, end.withZoneSameInstant(z).getYear)
  }

  /** Reindex values onto the dense grid: per distinct key tuple, a LEFT
    * join from the calendar spine to the observations — missing grid slots
    * surface as NULL `value` (the reference's NaN padding,
    * chunk_timeserie_store.py:740-742). The spine side is tiny relative to
    * the fact table, so it is broadcast; the join itself is a broadcast
    * hash join with no shuffle of the fact side beyond the grouping the
    * caller already applied.
    *
    * `df` must be one observation per (keys..., ts) — pre-aggregate if not.
    */
  def reindex(
      df: DataFrame,
      keys: Seq[String],
      start: java.time.LocalDateTime,
      end: java.time.LocalDateTime,
      freqSecs: Long,
      tsCol: String = "ts",
      valueCol: String = "value",
      inclusiveRight: Boolean = true): DataFrame = {
    val spark  = df.sparkSession
    val grid   = spine(spark, start, end, freqSecs, inclusiveRight, tsCol)
    val keyDf  = df.select(keys.map(col): _*).distinct()
    val spineK = keyDf.crossJoin(broadcast(grid))
    spineK.join(df, keys :+ tsCol, "left")
  }
}
