package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-coalesce merge — the reference's `combine_first` family
  * (hostore/utils/timeseries.py:136-163 `ts_combine_first`;
  * hostore/models/hostore.py:256-268 version-combined reads;
  * chunk_timeserie_store.py:782-813 update merge).
  *
  * Semantics: align all inputs on the union of their timestamps; at each
  * (key, ts) the value of the LOWEST-priority (= earliest in the fold
  * order) input that is non-null wins; all-null → null. Pandas NaN
  * "transparency" maps to SQL NULL transparency.
  *
  * Spark-first shape: one `union` + one hash aggregation
  * (`min_by(value, effective_priority)`), i.e. a single shuffle on
  * (keys, ts) with map-side partial aggregation — no windowing, no
  * per-series collection. At 100 TB this is the cheapest possible plan for
  * the semantics: the shuffle is on the natural output key and AQE can
  * coalesce/skew-split it.
  */
object Combine {

  /** Sentinel priority for null values: pushes them behind every real
    * priority so `min_by` only surfaces a null when ALL inputs are null.
    */
  private val NullPrio = Long.MaxValue

  /** Column-level ordered coalesce: first non-null `value` by ascending
    * `priority` within each group. Usable inside any groupBy.
    */
  def firstNonNullByPriority(value: Column, priority: Column): Column =
    min_by(value, when(value.isNotNull, priority.cast("long")).otherwise(lit(NullPrio)))

  /** `ts_combine_first` over a list of frames (earlier = higher priority).
    * Each frame must have columns (keys..., tsCol, valueCol); empty list →
    * empty result is the caller's concern (reference returns an empty
    * series, utils/timeseries.py:158-161).
    */
  def combineFirst(
      frames: Seq[DataFrame],
      keys: Seq[String],
      tsCol: String = "ts",
      valueCol: String = "value"): DataFrame = {
    require(frames.nonEmpty, "combineFirst of no frames")
    val tagged = frames.zipWithIndex.map { case (f, i) =>
      f.select((keys.map(col) :+ col(tsCol) :+ col(valueCol).as("__v")) :+ lit(i.toLong).as("__prio"): _*)
    }
    val all = tagged.reduce(_ unionByName _)
    all.groupBy((keys.map(col) :+ col(tsCol)): _*)
      .agg(firstNonNullByPriority(col("__v"), col("__prio")).as(valueCol))
  }

  /** Version-combined read (reference `Store.get_lc`/`get_many_lc`,
    * hostore.py:256-268,304-317): within each `combinedBy` group, rows from
    * the highest `versionCol` win; lower versions only fill timestamps the
    * higher ones left null/absent. One extra window to rank versions, then
    * the same single-shuffle ordered coalesce.
    */
  def combineVersions(
      df: DataFrame,
      combinedBy: Seq[String],
      versionCol: String,
      tsCol: String = "ts",
      valueCol: String = "value"): DataFrame =
    combineOrdered(df, combinedBy, Seq(versionCol -> false), tsCol, valueCol)

  /** Generalized version-combine: fold order given by entry-level order
    * columns — the reference's `order_by=('-version',)` knob on `get_lc`
    * (hostore.py:240,258-267: queryset order IS the combine_first fold
    * order). The order columns must be constant within an entry (a stored
    * blob row), e.g. version / created_at — same granularity the
    * reference orders at. `orderKeys` = (column name, ascending).
    *
    * Scale shape: the fold priority is NOT a window over the data — a
    * window partitioned by `combinedBy` alone would sort every row of a
    * hot series in ONE task (AQE splits skewed joins, never skewed
    * windows; one 100M-point series = one straggler). When every order
    * key shares one direction (all reference call sites), the priority
    * is a min_by/max_by struct key — ONE aggregation, nothing else.
    * Mixed directions rank the DISTINCT (group, order) entry tuples —
    * series x versions, tiny relative to points — and join the rank
    * back on a null-safe equi-join that AQE can broadcast when small
    * and skew-split when a series runs hot. Either way the final
    * aggregation keys on (combinedBy, ts), which hash-distributes a hot
    * series across reducers by timestamp — no salting needed anywhere.
    */
  def combineOrdered(
      df: DataFrame,
      combinedBy: Seq[String],
      orderKeys: Seq[(String, Boolean)],
      tsCol: String = "ts",
      valueCol: String = "value"): DataFrame = {
    val sameDirection = orderKeys.nonEmpty && orderKeys.map(_._2).distinct.size == 1
    if (sameDirection) {
      // FAST PATH (all order keys the same direction — every reference
      // call site: `version DESC`, `-version`, `created_at ASC`): the
      // fold priority needs no rank at all. min_by/max_by over a STRUCT
      // of (value-null marker, per-key null marker, key...) picks the
      // first non-null value in the requested entry order directly —
      // ONE aggregation, one shuffle on the output key, no distinct
      // pass, no join. Struct comparison is field-wise, so the markers
      // reproduce the window's null placement exactly: ascending ranks
      // NULLS FIRST (a null order key is the strongest entry), and
      // descending ranks NULLS LAST — `isNotNull` encodes both (min
      // prefers 0 = null; max prefers 1 = non-null); the value marker
      // leads so a null value always loses to any non-null one, and an
      // all-null group still yields null. Equal full order tuples tie
      // exactly like equal `__prio` ranks in the general path.
      val asc = orderKeys.head._2
      val v = col(valueCol)
      val fields =
        (if (asc) v.isNull.cast("int") else v.isNotNull.cast("int")) +:
          orderKeys.flatMap { case (c, _) =>
            Seq(col(c).isNotNull.cast("int"), col(c)) }
      val prio = struct(fields: _*)
      val pick = if (asc) min_by(v, prio) else max_by(v, prio)
      df.groupBy((combinedBy.map(col) :+ col(tsCol)): _*)
        .agg(pick.as(valueCol))
    } else {
      // GENERAL PATH (mixed asc/desc order keys): rank the DISTINCT
      // entry tuples and join the rank back (never a data-wide window —
      // AQE can split a skewed join, it can never split a window).
      val ordNames = orderKeys.map(_._1).filterNot(combinedBy.contains)
      val sortCols = orderKeys.map { case (c, asc) => if (asc) col(c).asc else col(c).desc }
      val keyNames = combinedBy ++ ordNames
      // distinct entry tuples: row_number here == dense_rank on the full
      // frame (tuples tying on every order column are the same tuple)
      val entries = df.select(keyNames.map(col): _*).distinct()
      val w = Window.partitionBy(combinedBy.map(col): _*).orderBy(sortCols: _*)
      // rename the rank side's keys so the self-join is unambiguous
      val ranked = entries.withColumn("__prio", row_number().over(w).cast("long"))
        .select(keyNames.map(k => col(k).as(s"__rk_$k")) :+ col("__prio"): _*)
      // null-safe on every key: entry rows with NULL order values still rank
      val joinCond = keyNames.map(k => col(k) <=> col(s"__rk_$k")).reduce(_ && _)
      val prio = df.join(ranked, joinCond)
        .drop(keyNames.map(k => s"__rk_$k"): _*)
      prio.groupBy((combinedBy.map(col) :+ col(tsCol)): _*)
        .agg(firstNonNullByPriority(col(valueCol), col("__prio")).as(valueCol))
    }
  }

  /** Update merge (reference `new.combine_first(existing)` —
    * timeserie_store.py:126-128, chunk_timeserie_store.py:782-813): new
    * data wins wherever it is non-null; existing survives elsewhere.
    */
  def updateMerge(
      newDf: DataFrame,
      existingDf: DataFrame,
      keys: Seq[String],
      tsCol: String = "ts",
      valueCol: String = "value"): DataFrame =
    combineFirst(Seq(newDf, existingDf), keys, tsCol, valueCol)

  /** Columnar update-merge: [[updateMerge]] when BOTH priority sides
    * already live as two value columns of ONE frame at (keys, tsCol)
    * grain — the shape every derived-update pipeline produces, where the
    * update feed and the existing values come out of one upstream
    * aggregation over the same source. Semantically identical to
    * `updateMerge(df where newCol non-null as value, df with oldCol as
    * value)` — a null `newCol` means "no update at this (key, ts)" and
    * the existing value survives; both null → null row survives as null
    * (combine_first keeps the index entry, timeserie_store.py:126-128).
    *
    * Why a separate entry point instead of projecting two frames off the
    * shared aggregate and calling [[updateMerge]]: Catalyst prunes each
    * union branch to its OWN value column, which turns the shared
    * aggregate into two DIFFERENT narrow aggregates — two scans, two
    * shuffles, and no exchange reuse (the subtrees are no longer equal).
    *
    * Implementation: a pure PROJECTION. At (keys, tsCol) grain each
    * merge group holds exactly the two stacked rows (priority 0 =
    * newCol, priority 1 = oldCol), so `firstNonNullByPriority` over
    * them IS `coalesce(newCol, oldCol)` — first non-null in priority
    * order, null only when both are (the index entry survives as null,
    * combine_first's contract). The law spec pins this equal to the
    * union-form [[updateMerge]] on random frames; the general
    * many-rows-per-(key, ts) fold stays on [[combineFirst]]'s
    * aggregation (q_combine_first / the store's update path). Measured
    * r18 at sf0.1 cold: 2.0 s (union form) → 1.3-1.6 s (explode +
    * exchange-free merge agg) → the pre-aggregation alone (this form
    * adds zero operators past it).
    */
  def updateMergeColumns(
      df: DataFrame,
      keys: Seq[String],
      newCol: String,
      oldCol: String,
      tsCol: String = "ts",
      valueCol: String = "value"): DataFrame =
    df.select((keys :+ tsCol).map(col) :+
      coalesce(col(newCol), col(oldCol)).as(valueCol): _*)
}
