package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap / hole analytics — the reference's analytical core:
  * `find_constant_sequences` (hostore/utils/timeseries.py:75-102),
  * `check_ts_completeness` (:11-65), `find_holes` (hostore.py:162-216).
  *
  * All three lower to the classic gaps-and-islands window pattern:
  * a null-safe change flag, a running island id, then one aggregation per
  * island. Two shuffles total (window partition + groupBy on the same
  * keys — Catalyst reuses the exchange), regardless of series length.
  */
object Gaps {

  /** Contiguous runs of equal value per key, NaN/null-aware
    * (`equalp` utils/timeseries.py:68-72 → Spark's null-safe `<=>`,
    * which also treats NaN = NaN as true). Output:
    * (keys..., run_start, run_end, value, run_len).
    */
  def constantIslands(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String = "ts",
      valueCol: String = "value",
      tieBreak: Seq[String] = Nil): DataFrame = {
    val ord = (col(tsCol) +: tieBreak.map(col))
    val w   = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val flagged = df
      .withColumn("__chg", when(col(valueCol) <=> lag(col(valueCol), 1).over(w), 0L).otherwise(1L))
      .withColumn("__grp", sum(col("__chg")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged
      .groupBy((keys.map(col) :+ col("__grp")): _*)
      .agg(
        min(col(tsCol)).as("run_start"),
        max(col(tsCol)).as("run_end"),
        first(col(valueCol)).as(valueCol),
        count(lit(1)).as("run_len"))
      .drop("__grp")
  }

  /** Hot-series [[constantIslands]]: identical output, no whole-series
    * window task. The gaps-and-islands pattern needs exactly one row of
    * look-behind (the change flag) plus a prefix count (the island id),
    * both of which decompose across time buckets:
    *  - the change flag at a bucket head compares against the PREVIOUS
    *    bucket's last row, carried through a one-row-per-(key, bucket)
    *    spine (`lag` over the spine — adjacent spine row IS the previous
    *    non-empty bucket). The carried value travels in a struct so a
    *    genuinely-null value is distinguishable from "no previous row".
    *  - the island id = global running sum of flags = per-bucket local
    *    prefix + the sum of earlier buckets' flag totals (a second
    *    metadata-sized spine window).
    * Islands spanning bucket boundaries reassemble in the final groupBy
    * (the head row inherits the previous island's id when the value
    * continues). Every window partitions by (keys, bucket) or runs over
    * the spine — a monster series parallelizes across buckets.
    *
    * ADAPTIVE ([[Adaptive.routeBySize]]): only keys with more than
    * `adaptiveThreshold` rows pay the carry-spine machinery; light keys
    * route through the plain [[constantIslands]] window (bit-identical
    * by the boundary run-state law), so the split form costs ~the plain
    * form when no series actually needs splitting. `adaptiveThreshold <=
    * 0` forces every key through the bucket path (the law tests do).
    *
    * Bench-scale floor (r20, measured): with no heavy keys the split
    * form still runs ~3 more AQE jobs than plain islands — the router's
    * count aggregation plus the empty heavy branch's first stages before
    * adaptive empty-relation propagation collapses it — ≈ +0.3 s at
    * sf0.1, all scheduler floor (taskSec delta ~0). That is the price of
    * the routing decision itself; the alternative (a per-key count
    * WINDOW riding the light path's exchange) would buffer a monster
    * key's whole series in one task — the exact hazard this operator
    * exists to avoid — so the aggregation+join router stays.
    */
  def constantIslandsSplit(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String = "ts",
      valueCol: String = "value",
      tieBreak: Seq[String] = Nil,
      splitSeconds: Long = 30L * 86400L,
      adaptiveThreshold: Long = Adaptive.DefaultThreshold): DataFrame = {
    val (light, heavy) = Adaptive.routeBySize(df, keys, adaptiveThreshold)
    constantIslands(light, keys, tsCol, valueCol, tieBreak)
      .unionByName(constantIslandsSplitAll(heavy, keys, tsCol, valueCol, tieBreak, splitSeconds))
  }

  /** The unconditional bucket-carry form behind [[constantIslandsSplit]]
    * — every key pays the spine, regardless of size.
    */
  private def constantIslandsSplitAll(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      valueCol: String,
      tieBreak: Seq[String],
      splitSeconds: Long): DataFrame = {
    require(splitSeconds > 0, s"splitSeconds must be positive, got $splitSeconds")
    val bUs = splitSeconds * 1000000L
    val ord = (col(tsCol) +: tieBreak.map(col))
    // ONE (keys, bucket)-keyed exchange feeds the whole bucket machinery
    // (r20; VERDICT r19 #5): the bucket-last rollup, the flagged window,
    // and the totals rollup all cluster by (keys, __b), and the carries
    // join preserves the streamed side's partitioning — so keying the
    // bucketed rows HERE, below the join, lets every consumer ride the
    // same exchange (AQE reuses the identical subtree). Before, the
    // planner placed each consumer's exchange above its own join/window
    // and the corpus shuffled three times on divergent pruned subtrees.
    val withB = df.withColumn("__b",
        floor(unix_micros(col(tsCol).cast("timestamp")) / bUs))
      .repartition((keys :+ "__b").map(col): _*)
    // one row per (key, bucket): the bucket's last value (by the same
    // order), struct-wrapped so null values survive the max_by
    val lastRow = withB
      .groupBy((keys.map(col) :+ col("__b")): _*)
      .agg(max_by(struct(col(valueCol).as("v")), struct(ord: _*)).as("__lastE"))
    val wspine = Window.partitionBy(keys.map(col): _*).orderBy(col("__b").asc)
    val carries = lastRow
      .withColumn("__prevE", lag(col("__lastE"), 1).over(wspine))
      .select((keys.map(col) :+ col("__b") :+ col("__prevE")): _*)
    val wkb = Window.partitionBy((keys :+ "__b").map(col): _*).orderBy(ord: _*)
    val flagged = withB.join(carries, keys :+ "__b", "left")
      .withColumn("__pE", coalesce(lag(struct(col(valueCol).as("v")), 1).over(wkb), col("__prevE")))
      .withColumn("__chg",
        when(col("__pE").isNotNull && (col(valueCol) <=> col("__pE").getField("v")), 0L)
          .otherwise(1L))
      .withColumn("__lgrp", sum(col("__chg"))
        .over(wkb.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val totals = flagged.groupBy((keys.map(col) :+ col("__b")): _*)
      .agg(sum(col("__chg")).as("__tot"))
    val offsets = totals
      .withColumn("__off", coalesce(
        sum(col("__tot")).over(wspine.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select((keys.map(col) :+ col("__b") :+ col("__off")): _*)
    flagged.join(offsets, keys :+ "__b")
      .withColumn("__grp", col("__off") + col("__lgrp"))
      .groupBy((keys.map(col) :+ col("__grp")): _*)
      .agg(
        min(col(tsCol)).as("run_start"),
        max(col(tsCol)).as("run_end"),
        first(col(valueCol)).as(valueCol),
        count(lit(1)).as("run_len"))
      .drop("__grp")
  }

  /** Missing-data holes per key over a dense grid
    * (`check_ts_completeness`, utils/timeseries.py:11-65): reindex
    * [start, end] at `freqSecs`, find null runs, widen each hole by
    * `marginSecs` on both sides (the reference's `freq_margin`).
    * Keys absent from `df` entirely yield ONE hole spanning the whole
    * range — pass them via `requestedKeys` (reference `find_holes` yields
    * the full range for absent prms, hostore.py:194-200).
    * Output: (keys..., hole_start, hole_end).
    */
  def holes(
      df: DataFrame,
      keys: Seq[String],
      start: java.time.LocalDateTime,
      end: java.time.LocalDateTime,
      freqSecs: Long,
      marginSecs: Long = 0L,
      tsCol: String = "ts",
      valueCol: String = "value",
      requestedKeys: Option[DataFrame] = None,
      minDeltaSecs: Long = 0L,
      splitSeconds: Option[Long] = None): DataFrame = {
    val spark = df.sparkSession
    val grid  = Grid.spine(spark, start, end, freqSecs, inclusiveRight = true, tsCol)
    val keyDf = requestedKeys.getOrElse(df.select(keys.map(col): _*).distinct())
    val dense = keyDf.crossJoin(broadcast(grid))
      .join(df.select((keys.map(col) :+ col(tsCol) :+ col(valueCol)): _*), keys :+ tsCol, "left")
    // the window task is bounded by the REQUESTED grid, not the stored
    // series — fine for the reference's bounded requests; pass
    // splitSeconds when reindexing an unbounded range (a decade-long 1s
    // grid is 300M slots per key) and the run-length step parallelizes
    // across buckets ([[constantIslandsSplit]], identical islands by law)
    val missingFlag = dense.withColumn("__missing", col(valueCol).isNull)
    val runs = splitSeconds match {
      case Some(s) => constantIslandsSplit(missingFlag, keys, tsCol, "__missing", Nil, s)
      case None    => constantIslands(missingFlag, keys, tsCol, "__missing")
    }
    val lo = lit(start) // LocalDateTime → TIMESTAMP_NTZ literal, JVM-tz-proof
    val hi = lit(end)
    val sec = expr("make_dt_interval(0, 0, 0, 1)")
    var missing = runs.filter(col("__missing"))
    if (minDeltaSecs > 0L) {
      // min_delta mirrors `difference_missing` (utils/range/range.py:57-79;
      // threaded from find_groups, hostore.py:146-147): it prunes only the
      // BOUNDARY complement gaps; interior null islands are appended
      // unconditionally (:150-156) and an all-missing key keeps the full
      // range (:139-141). A grid run of length L seconds corresponds to a
      // reference gap of L + freq (the reference measures to the first /
      // last DATA point, one step beyond the missing grid slots).
      val lenSecs = (unix_micros(col("run_end").cast("timestamp")) -
                     unix_micros(col("run_start").cast("timestamp"))) / 1000000L
      val wholeRange = col("run_start") === lo && col("run_end") === hi
      val boundary   = col("run_start") === lo || col("run_end") === hi
      missing = missing.filter(wholeRange || !boundary || (lenSecs + freqSecs >= minDeltaSecs))
    }
    missing
      .select(
        (keys.map(col) :+
          greatest(col("run_start") - sec * marginSecs, lo).as("hole_start") :+
          least(col("run_end") + sec * marginSecs, hi).as("hole_end")): _*)
  }

  /** Multi-column completeness check — the reference's DataFrame input to
    * `check_ts_completeness` (`ds.sum(axis=1)`, utils/timeseries.py:54):
    * value columns are row-summed with pandas skipna semantics (null
    * contributes 0, an all-null row sums to 0.0 and is therefore NOT a
    * hole — only grid slots with no row at all are), then the single-
    * column holes path runs.
    */
  def holesMulti(
      df: DataFrame,
      keys: Seq[String],
      valueCols: Seq[String],
      start: java.time.LocalDateTime,
      end: java.time.LocalDateTime,
      freqSecs: Long,
      marginSecs: Long = 0L,
      tsCol: String = "ts",
      requestedKeys: Option[DataFrame] = None,
      minDeltaSecs: Long = 0L,
      splitSeconds: Option[Long] = None): DataFrame = {
    require(valueCols.nonEmpty, "holesMulti needs at least one value column")
    val summed = df.withColumn("__vsum",
      valueCols.map(c => coalesce(col(c), lit(0.0))).reduce(_ + _))
    holes(summed, keys, start, end, freqSecs, marginSecs, tsCol, "__vsum",
      requestedKeys, minDeltaSecs, splitSeconds)
  }

  /** Cluster keys by their missing ranges (reference `find_groups`,
    * hostore.py:45-160): keys whose hole lists are identical land in one
    * group. The group signature is the sorted, stringified hole list —
    * a short shuffle key, so grouping a million series costs one
    * aggregation on it, never a comparison of series payloads.
    * Output: (missing_sig, member_keys, n_keys); keys with full coverage
    * group under the empty signature.
    */
  def findGroups(
      df: DataFrame,
      key: String,
      start: java.time.LocalDateTime,
      end: java.time.LocalDateTime,
      freqSecs: Long,
      marginSecs: Long = 0L,
      tsCol: String = "ts",
      valueCol: String = "value",
      requestedKeys: Option[DataFrame] = None): DataFrame = {
    val hs = holes(df, Seq(key), start, end, freqSecs, marginSecs, tsCol, valueCol, requestedKeys)
    val keyDf = requestedKeys.getOrElse(df.select(col(key)).distinct())
    val sigs = keyDf
      .join(hs, Seq(key), "left")
      .groupBy(col(key))
      .agg(concat_ws(";",
        sort_array(collect_list(concat(
          col("hole_start").cast("string"), lit("~"), col("hole_end").cast("string"))))).as("missing_sig"))
    sigs.groupBy(col("missing_sig"))
      .agg(
        concat_ws(",",
          transform(sort_array(collect_list(col(key))), k => k.cast("string"))).as("member_keys"),
        count(lit(1)).as("n_keys"))
  }
}
