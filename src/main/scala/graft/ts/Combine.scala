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
    combineOrdered(df, combinedBy, Seq(col(versionCol).desc), tsCol, valueCol)

  /** Generalized version-combine: fold order given by arbitrary entry-level
    * sort columns — the reference's `order_by=('-version',)` knob on
    * `get_lc` (hostore.py:240,258-267: queryset order IS the combine_first
    * fold order). The order columns must be constant within an entry (a
    * stored blob row), e.g. version / created_at — same granularity the
    * reference orders at.
    */
  def combineOrdered(
      df: DataFrame,
      combinedBy: Seq[String],
      order: Seq[Column],
      tsCol: String = "ts",
      valueCol: String = "value"): DataFrame = {
    val w = Window.partitionBy(combinedBy.map(col): _*).orderBy(order: _*)
    val prio = df.withColumn("__prio", dense_rank().over(w).cast("long"))
    prio.groupBy((combinedBy.map(col) :+ col(tsCol)): _*)
      .agg(firstNonNullByPriority(col(valueCol), col("__prio")).as(valueCol))
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
}
