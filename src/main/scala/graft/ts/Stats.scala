package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-series statistical conditioning — the pandas-side helpers a
  * reference user reaches for right after `get_ts` (`Series.ewm`,
  * `Series.clip(quantile)`, `Series.value_counts(bins=...)`), re-expressed
  * as one-shuffle Spark aggregations.
  */
object Stats {

  /** Exponential smoothing level per series — `Series.ewm(alpha).mean()
    * .iloc[-1]`, the "current level" estimate forecasting reads off a
    * store series. The recursion s_0 = x_0; s_i = α·x_i + (1-α)·s_{i-1}
    * is a strictly sequential fold, so it runs as an `aggregate` HOF over
    * the per-key collected series (ts-ordered, value tie-break —
    * deterministic under any partitioning): ONE shuffle, one array fold
    * per series, the same per-series memory bound as every whole-series
    * read in the store. Engine-portable: the identical left fold runs in
    * DuckDB as `list_reduce`, same constants, same order, same doubles.
    * Output: (keys..., n, ewma).
    */
  def ewmaLevel(
      df: DataFrame,
      keys: Seq[String],
      alpha: Double,
      tsCol: String = "ts",
      valueCol: String = "value"): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val vs = col("__pts").getField(valueCol)
    df.groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(struct(col(tsCol), col(valueCol).cast("double").as(valueCol))))
        .as("__pts"))
      .select((keys.map(col) :+ size(vs).cast("long").as("n") :+
        aggregate(
          slice(vs, lit(2), greatest(size(vs) - 1, lit(0))),
          element_at(vs, 1),
          (acc, x) => acc * (1 - alpha) + x * alpha).as("ewma")): _*)
  }

  /** Winsorized clipping per series — `Series.clip(s.quantile(pLo),
    * s.quantile(pHi))`: the outlier-robust normalization step before any
    * scale-sensitive downstream op. Exact linear-interpolated percentiles
    * (Spark `percentile` == DuckDB `quantile_cont`) from one aggregation,
    * joined back on the series key (tiny build side per key — at scale a
    * broadcast), then a codegen'd clamp projection. Adds `value_clipped`;
    * rows and other columns pass through.
    */
  def winsorize(
      df: DataFrame,
      keys: Seq[String],
      pLo: Double,
      pHi: Double,
      valueCol: String = "value"): DataFrame = {
    require(0 <= pLo && pLo < pHi && pHi <= 1, s"need 0 <= pLo < pHi <= 1, got $pLo/$pHi")
    val bounds = df.groupBy(keys.map(col): _*)
      .agg(
        percentile(col(valueCol), lit(pLo)).as("__lo"),
        percentile(col(valueCol), lit(pHi)).as("__hi"))
    df.join(broadcast(bounds), keys)
      .withColumn("value_clipped",
        least(greatest(col(valueCol), col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }

  /** Fixed-range histogram per series — `value_counts(bins)` with
    * explicit [lo, hi) bounds so every series shares one bin grid
    * (comparable across keys and engines; a data-derived range would need
    * a second pass). Values outside the range clamp into the edge bins.
    * One hash aggregation; output (keys..., bin, bin_lo, n) with bins
    * that hold at least one value (dense zero-fill is a grid join the
    * caller can add — absent bins are absent rows, like store holes).
    */
  def histogram(
      df: DataFrame,
      keys: Seq[String],
      lo: Double,
      hi: Double,
      bins: Int,
      valueCol: String = "value"): DataFrame = {
    require(bins >= 1 && hi > lo, s"need bins >= 1 and hi > lo, got $bins, [$lo, $hi)")
    val width = (hi - lo) / bins
    val bin = least(greatest(
      floor((col(valueCol) - lo) / width), lit(0.0)), lit((bins - 1).toDouble))
      .cast("long")
    df.groupBy((keys.map(col) :+ bin.as("bin")): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("bin_lo", lit(lo) + col("bin") * width)
      .select((keys.map(col) :+ col("bin") :+ col("bin_lo") :+ col("n")): _*)
  }
}
