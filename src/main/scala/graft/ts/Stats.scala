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

  /** Scale-safe `ewmaLevel`: identical semantics, but no whole series ever
    * sits in one aggregation buffer. Each EWMA step is the affine map
    * s → (1−α)·s + α·x, and affine maps compose associatively:
    * (A₂,B₂)∘(A₁,B₁) = (A₁A₂, A₂B₁+B₂). So a ts-bucket segment of m points
    * folds — independently, in parallel — to the pair
    * A = (1−α)^m, B = Σᵢ α·xᵢ·(1−α)^(m−i), and the final level is the
    * in-order composition of the per-segment pairs applied to the series'
    * first value (the s₀ = x₀ init falls out: A·x₀ + B with the fold-from-0
    * B telescopes to exactly the recursion — see StatsSpec's law test).
    * Memory per task is one SEGMENT (bounded by `segmentSeconds`), and the
    * per-key composition array is #segments structs — metadata-sized. Two
    * shuffles instead of one; the price of never materializing a series.
    * Output: (keys..., n, ewma) — same contract as `ewmaLevel`, which
    * stays as the DuckDB-portable oracle twin.
    */
  def ewmaLevelSegmented(
      df: DataFrame,
      keys: Seq[String],
      alpha: Double,
      tsCol: String = "ts",
      valueCol: String = "value",
      segmentSeconds: Long = 7L * 86400L): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    require(segmentSeconds > 0, s"segmentSeconds must be positive, got $segmentSeconds")
    val segUs = segmentSeconds * 1000000L
    // within-segment: sort (ts, value-tiebreak) like ewmaLevel, then fold
    val pts = sort_array(collect_list(struct(col(tsCol), col(valueCol).cast("double").as(valueCol))))
    val vs = col("__pts").getField(valueCol)
    val perSeg = df
      .withColumn("__seg", floor(unix_micros(col(tsCol).cast("timestamp")) / segUs))
      .groupBy((keys.map(col) :+ col("__seg")): _*)
      .agg(pts.as("__pts"))
      .select((keys.map(col) :+ col("__seg") :+
        size(col("__pts")).cast("long").as("__m") :+
        element_at(vs, 1).as("__first") :+
        pow(lit(1 - alpha), size(col("__pts"))).as("__A") :+
        aggregate(vs, lit(0.0), (acc, x) => acc * (1 - alpha) + x * alpha).as("__B")): _*)
    // per key: compose the (A,B) pairs in segment (= ts) order; the array
    // is #segments long, not #points
    val segs = sort_array(collect_list(struct(
      col("__seg"), col("__A"), col("__B"), col("__first"), col("__m"))))
    val composed = aggregate(
      col("__segs"),
      struct(lit(1.0).as("A"), lit(0.0).as("B")),
      (acc, s) => struct(
        (acc.getField("A") * s.getField("__A")).as("A"),
        (acc.getField("B") * s.getField("__A") + s.getField("__B")).as("B")))
    perSeg.groupBy(keys.map(col): _*)
      .agg(segs.as("__segs"))
      .select((keys.map(col) :+
        aggregate(col("__segs"), lit(0L), (acc, s) => acc + s.getField("__m")).as("n") :+
        (composed.getField("A") * element_at(col("__segs"), 1).getField("__first") +
          composed.getField("B")).as("ewma")): _*)
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

  /** Robust outlier flags per series — the MAD rule (|x − median| >
    * k · 1.4826 · MAD), the load-curve QA standard because mean/stddev
    * are themselves dragged by the spikes being hunted. Two exact-median
    * aggregations (median, then median absolute deviation) joined back
    * broadcast — no window, no sort of the data. A constant series has
    * MAD 0, so any deviating point flags (documented; callers wanting
    * tolerance pass a floor via `madFloor`). Adds `is_outlier`; rows
    * pass through.
    */
  def madOutliers(
      df: DataFrame,
      keys: Seq[String],
      k: Double = 3.5,
      madFloor: Double = 0.0,
      valueCol: String = "value"): DataFrame = {
    val med = df.groupBy(keys.map(col): _*)
      .agg(percentile(col(valueCol), lit(0.5)).as("__med"))
    val mad = df.join(broadcast(med), keys)
      .groupBy(keys.map(col): _*)
      .agg(percentile(abs(col(valueCol) - col("__med")), lit(0.5)).as("__mad"),
        first(col("__med")).as("__med"))
    df.join(broadcast(mad), keys)
      .withColumn("is_outlier",
        abs(col(valueCol) - col("__med")) >
          lit(k) * lit(1.4826) * greatest(col("__mad"), lit(madFloor)))
      .drop("__med", "__mad")
  }

  /** Seasonal profile per series — the (day-of-week, hour-of-day) mean
    * grid, THE shape primitive for load curves (the reference's domain:
    * metering series repeat weekly). `dow` is 0=Sunday..6 (Spark's
    * `dayofweek` − 1, matching DuckDB's `dayofweek`). One hash
    * aggregation; output (keys..., dow, hod, profile_mean, n).
    */
  def seasonalProfile(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String = "ts",
      valueCol: String = "value"): DataFrame =
    df.groupBy((keys.map(col) :+
        (dayofweek(col(tsCol)) - 1).as("dow") :+ hour(col(tsCol)).as("hod")): _*)
      .agg(avg(col(valueCol)).as("profile_mean"), count(lit(1)).as("n"))

  /** Subtract the weekly profile from each point (residual = value −
    * profile slot mean): what remains after seasonality is the signal
    * anomaly detection and forecasting models actually want. The profile
    * is keys × 168 rows → broadcast join; adds `profile_mean` and
    * `residual`.
    */
  def deseasonalize(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String = "ts",
      valueCol: String = "value"): DataFrame = {
    val prof = seasonalProfile(df, keys, tsCol, valueCol).drop("n")
    df.withColumn("dow", dayofweek(col(tsCol)) - 1)
      .withColumn("hod", hour(col(tsCol)))
      .join(broadcast(prof), keys ++ Seq("dow", "hod"))
      .withColumn("residual", col(valueCol) - col("profile_mean"))
      .drop("dow", "hod")
  }

  /** Rolling median per series — `Series.rolling(n).median()`, the
    * robust rolling baseline (a mean window chases the spikes the MAD
    * rule flags; the median window doesn't). Exact interpolated
    * percentile over a `ROWS n−1 PRECEDING..CURRENT` keyed window —
    * partial leading windows produce the median of what's there, like
    * pandas `min_periods=1`. `orderCol` breaks ts ties deterministically.
    * Adds `outCol`.
    */
  def rollingMedian(
      df: DataFrame,
      keys: Seq[String],
      n: Int,
      tsCol: String = "ts",
      orderCol: String,
      valueCol: String = "value",
      outCol: String = "roll_med"): DataFrame = {
    require(n >= 1, s"window must be >= 1 rows, got $n")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col(tsCol), col(orderCol))
      .rowsBetween(-(n - 1).toLong, org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn(outCol, percentile(col(valueCol), lit(0.5)).over(w))
  }

  /** Shared scaffolding for hot-series bounded trailing-ROWS windows
    * ([[rollingMedianSplit]] / [[movingAvgSplit]]): a `ROWS n−1
    * PRECEDING..CURRENT` frame needs only the n−1 rows before each row,
    * so a monster series need not sort in ONE window task — bucket the
    * series by time, then REPLICATE each bucket's last n−1 rows into the
    * next bucket as order-preserving padding (`__pad`), and run the same
    * frame inside (keys, bucket). Sparse buckets are handled exactly: the
    * carry for bucket b is the last n−1 of the CONCATENATED tails of all
    * earlier buckets (each true predecessor is inside its own bucket's
    * tail by construction), via one metadata-sized spine — one row per
    * (key, bucket), each holding ≤ n−1 replicated rows. Padding rows sort
    * before every native row of their bucket (their timestamps are
    * earlier), get a garbage window value, and are dropped after the
    * aggregation. Output is the projection (keys, tsCol, orderCol,
    * valueCol) + the caller's window column — the split forms don't carry
    * arbitrary pass-through columns.
    */
  private def paddedTrailing(
      df: DataFrame,
      keys: Seq[String],
      n: Int,
      tsCol: String,
      orderCol: String,
      valueCol: String,
      splitSeconds: Long): DataFrame = {
    require(n >= 1, s"window must be >= 1 rows, got $n")
    require(splitSeconds > 0, s"splitSeconds must be positive, got $splitSeconds")
    val bUs = splitSeconds * 1000000L
    val withB = df
      .select((keys.map(col) :+ col(tsCol) :+ col(orderCol) :+ col(valueCol)): _*)
      .withColumn("__b", floor(unix_micros(col(tsCol).cast("timestamp")) / bUs))
      .withColumn("__pad", lit(false))
    if (n == 1) return withB // frame is the row itself — nothing to carry
    val w = org.apache.spark.sql.expressions.Window
    // each bucket's last n−1 rows: rank from the bucket END and keep the
    // top n−1 BEFORE aggregating, so the collect_list buffer holds at
    // most n−1 structs — never the whole bucket (a 30-day bucket of a
    // 1 s series is ~2.6M rows; materializing it per aggregation buffer
    // would OOM exactly the monster series this split exists for)
    val wDesc = w.partitionBy((keys :+ "__b").map(col): _*)
      .orderBy(col(tsCol).desc, col(orderCol).desc)
    val tails = withB
      .withColumn("__rn", row_number().over(wDesc))
      .filter(col("__rn") <= n - 1)
      .groupBy((keys.map(col) :+ col("__b")): _*)
      .agg(sort_array(collect_list(struct(col(tsCol), col(orderCol), col(valueCol))))
        .as("__tail"))
    val wPrev = w.partitionBy(keys.map(col): _*).orderBy(col("__b").asc)
      .rowsBetween(w.unboundedPreceding, -1)
    val pads = tails
      .withColumn("__prevAll", flatten(collect_list(col("__tail")).over(wPrev)))
      .withColumn("__carry",
        slice(col("__prevAll"), greatest(size(col("__prevAll")) - (n - 1) + 1, lit(1)), lit(n - 1)))
      .select((keys.map(col) :+ col("__b") :+ explode(col("__carry")).as("__r")): _*)
      .select((keys.map(col) :+ col("__b") :+
        col("__r").getField(tsCol).as(tsCol) :+
        col("__r").getField(orderCol).as(orderCol) :+
        col("__r").getField(valueCol).as(valueCol) :+
        lit(true).as("__pad")): _*)
    withB.unionByName(pads.select(withB.columns.map(col): _*))
  }

  /** Hot-series [[rollingMedian]]: identical semantics over the padded
    * (keys, bucket) frame — no whole-series window task. Output columns:
    * (keys..., tsCol, orderCol, valueCol, outCol).
    */
  def rollingMedianSplit(
      df: DataFrame,
      keys: Seq[String],
      n: Int,
      tsCol: String = "ts",
      orderCol: String,
      valueCol: String = "value",
      outCol: String = "roll_med",
      splitSeconds: Long = 30L * 86400L): DataFrame = {
    val padded = paddedTrailing(df, keys, n, tsCol, orderCol, valueCol, splitSeconds)
    val wkb = org.apache.spark.sql.expressions.Window
      .partitionBy((keys :+ "__b").map(col): _*).orderBy(col(tsCol), col(orderCol))
      .rowsBetween(-(n - 1).toLong, org.apache.spark.sql.expressions.Window.currentRow)
    padded.withColumn(outCol, percentile(col(valueCol), lit(0.5)).over(wkb))
      .filter(!col("__pad")).drop("__b", "__pad")
  }

  /** Hot-series trailing moving average (`Series.rolling(n,
    * min_periods=1).mean()`) on the same padded-bucket scaffolding.
    * Output columns: (keys..., tsCol, orderCol, valueCol, outCol).
    */
  def movingAvgSplit(
      df: DataFrame,
      keys: Seq[String],
      n: Int,
      tsCol: String = "ts",
      orderCol: String,
      valueCol: String = "value",
      outCol: String = "moving_avg",
      splitSeconds: Long = 30L * 86400L): DataFrame = {
    val padded = paddedTrailing(df, keys, n, tsCol, orderCol, valueCol, splitSeconds)
    val wkb = org.apache.spark.sql.expressions.Window
      .partitionBy((keys :+ "__b").map(col): _*).orderBy(col(tsCol), col(orderCol))
      .rowsBetween(-(n - 1).toLong, org.apache.spark.sql.expressions.Window.currentRow)
    padded.withColumn(outCol, avg(col(valueCol)).over(wkb))
      .filter(!col("__pad")).drop("__b", "__pad")
  }

  /** Peak / off-peak energy split — the metering-tariff primitive: sum
    * and count per (keys, is_peak) where peak = weekday with
    * hour ∈ [peakStartHour, peakEndHour). One hash aggregation. `dow`
    * follows [[seasonalProfile]]'s 0=Sunday convention.
    */
  def peakOffpeak(
      df: DataFrame,
      keys: Seq[String],
      peakStartHour: Int = 8,
      peakEndHour: Int = 20,
      tsCol: String = "ts",
      valueCol: String = "value"): DataFrame = {
    require(0 <= peakStartHour && peakStartHour < peakEndHour && peakEndHour <= 24,
      s"need 0 <= start < end <= 24, got $peakStartHour/$peakEndHour")
    val dow = dayofweek(col(tsCol)) - 1 // 0=Sunday
    val isPeak = dow =!= 0 && dow =!= 6 &&
      hour(col(tsCol)) >= peakStartHour && hour(col(tsCol)) < peakEndHour
    df.groupBy((keys.map(col) :+ isPeak.as("is_peak")): _*)
      .agg(sum(col(valueCol)).as("energy"), count(lit(1)).as("n"))
  }

  /** Daily load factor per series — avg/max over each day, the
    * flatness KPI (1.0 = perfectly flat demand; low = peaky). Zero or
    * negative-max days yield null rather than a misleading ratio.
    * Output: (keys..., day, load_factor).
    */
  def loadFactor(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String = "ts",
      valueCol: String = "value"): DataFrame =
    df.groupBy((keys.map(col) :+ date_trunc("day", col(tsCol)).as("day")): _*)
      .agg(avg(col(valueCol)).as("__avg"), max(col(valueCol)).as("__max"))
      .withColumn("load_factor",
        when(col("__max") > 0, col("__avg") / col("__max")))
      .drop("__avg", "__max")

  /** Lag-k autocorrelation per series — `Series.autocorr(k)`, the
    * persistence-strength number a forecaster checks before modelling a
    * store series (acf≈1: yesterday predicts today; acf≈0: noise).
    * Pearson correlation of (x_t, x_{t−k}) pairs: one keyed window for
    * the lag, one `corr` aggregation. `orderCol` breaks ts ties so the
    * lag sequence is deterministic under any partitioning. Series with
    * fewer than k+2 points (or zero variance) yield null acf, like
    * pandas. Output: (keys..., n_pairs, acf).
    */
  def autocorr(
      df: DataFrame,
      keys: Seq[String],
      lagK: Int = 1,
      tsCol: String = "ts",
      orderCol: String,
      valueCol: String = "value"): DataFrame = {
    require(lagK >= 1, s"lagK must be >= 1, got $lagK")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col(tsCol), col(orderCol))
    // mask both sides to the pairwise-complete subset so the moments
    // below all range over exactly the pairs the correlation uses
    val pairOk = col(valueCol).isNotNull && col("__pv").isNotNull
    val xm = when(pairOk, col(valueCol))
    val ym = when(pairOk, col("__pv"))
    df.withColumn("__pv", lag(col(valueCol), lagK).over(w))
      .groupBy(keys.map(col): _*)
      .agg(
        count(when(pairOk, 1)).as("n_pairs"),
        // corr spelled out as try_divide(cov, sx*sy): ANSI `corr` RAISES
        // on zero variance (divide-by-zero); this form yields null —
        // what DuckDB's corr returns and what "undefined" means
        try_divide(covar_samp(xm, ym),
          stddev_samp(xm) * stddev_samp(ym)).as("acf"))
  }

  /** Hot-series [[autocorr]]: the lag-k pairing runs inside (key, bucket)
    * over the [[paddedTrailing]] frame (padding = each bucket's last k
    * rows replicated forward, so `lag(k)` at a bucket head sees its TRUE
    * predecessor — pad rows' own lags are garbage and are dropped before
    * the aggregation). The pair set is exactly [[autocorr]]'s; the final
    * correlation is the same `corr` aggregation, so values match up to
    * float partial-aggregation order (both forms' sums are
    * partition-order-dependent at the ulp level — the law test asserts
    * 1e-9 relative agreement, and n_pairs exactly). The whole-series form
    * stays the oracle twin; this is the scale path for a monster series.
    */
  def autocorrSplit(
      df: DataFrame,
      keys: Seq[String],
      lagK: Int = 1,
      tsCol: String = "ts",
      orderCol: String,
      valueCol: String = "value",
      splitSeconds: Long = 30L * 86400L): DataFrame = {
    require(lagK >= 1, s"lagK must be >= 1, got $lagK")
    val padded = paddedTrailing(df, keys, lagK + 1, tsCol, orderCol, valueCol, splitSeconds)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy((keys :+ "__b").map(col): _*).orderBy(col(tsCol), col(orderCol))
    val lagged = padded
      .withColumn("__pv", lag(col(valueCol), lagK).over(w))
      .filter(!col("__pad"))
    val pairOk = col(valueCol).isNotNull && col("__pv").isNotNull
    val xm = when(pairOk, col(valueCol))
    val ym = when(pairOk, col("__pv"))
    lagged.groupBy(keys.map(col): _*)
      .agg(
        count(when(pairOk, 1)).as("n_pairs"),
        try_divide(covar_samp(xm, ym),
          stddev_samp(xm) * stddev_samp(ym)).as("acf"))
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
    // NaN readings are holes, not max-range values (NaN orders above every
    // double, so without the filter they'd silently clamp into the top bin)
    df.filter(!isnan(col(valueCol)))
      .groupBy((keys.map(col) :+ bin.as("bin")): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("bin_lo", lit(lo) + col("bin") * width)
      .select((keys.map(col) :+ col("bin") :+ col("bin_lo") :+ col("n")): _*)
  }

  /** Two-sided CUSUM change-point detection (Page 1954) per series,
    * against the series' own mean: the classic sequential recursion
    * S_i = max(0, S_{i−1} + (x_i − μ − slack)) re-expressed as WINDOW
    * algebra — S_i = P_i − min(0, min_{j≤i} P_j) where P is the prefix
    * sum of the drift terms — so no per-series driver loop, no UDAF:
    * one Exchange+Sort per key serves the full-frame aggregates, both
    * prefix sums, and both running minima.
    *
    * Exactness: every term is integer micro-units SCALED BY n (the
    * per-series count), so μ never becomes a float — the drift term is
    * n·x_i − Σx − n·slack in decimal(38,0), and the single float
    * division happens per OUTPUT row at the very end. Bit-identical at
    * any parallelism and to the DuckDB twin (HUGEINT window sums).
    *
    * Output: (keys…, tsCol, valueCol, cusum_hi, cusum_lo, alarm) —
    * cusum values in input units (6 dp), alarm = either side exceeding
    * `threshold`. Whole-series cumulative windows serialize one task
    * per key — same documented bound as interpolate/autocorr; the
    * bucket-carry split pattern applies if a monster series needs it
    * (prefix sums and running minima both carry across buckets).
    */
  def cusum(
      df: DataFrame,
      keys: Seq[String],
      slack: Double,
      threshold: Double,
      tsCol: String = "ts",
      valueCol: String = "value"): DataFrame = {
    require(slack >= 0 && threshold > 0,
      s"need slack >= 0 and threshold > 0, got $slack, $threshold")
    import org.apache.spark.sql.expressions.Window
    val kcols = keys.map(col)
    val wAll = Window.partitionBy(kcols: _*)
    val wCum = Window.partitionBy(kcols: _*).orderBy(col(tsCol), col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dec = "decimal(38,0)"
    val slackQ = BigDecimal(slack * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val thrQ = BigDecimal(threshold * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val s1 = df
      .withColumn("__xq", round(col(valueCol) * 1e6, 0).cast(dec))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__sum", sum(col("__xq")).over(wAll))
    val s2 = s1
      .withColumn("__ehi",
        col("__xq") * col("__n") - col("__sum") - lit(slackQ).cast(dec) * col("__n"))
      .withColumn("__elo",
        col("__sum") - col("__xq") * col("__n") - lit(slackQ).cast(dec) * col("__n"))
    val s3 = s2
      .withColumn("__phi", sum(col("__ehi")).over(wCum))
      .withColumn("__plo", sum(col("__elo")).over(wCum))
    val s4 = s3
      .withColumn("__mhi", least(min(col("__phi")).over(wCum), lit(0).cast(dec)))
      .withColumn("__mlo", least(min(col("__plo")).over(wCum), lit(0).cast(dec)))
    val hN = lit(thrQ).cast(dec) * col("__n")
    // the 6-dp output is computed by EXACT integer half-up division
    // ((2S + n) div 2n in micro units) — a float `round(S/n/1e6, 6)`
    // lands on .5 boundaries where the two engines' round() disagree by
    // one ulp (observed on the fixture). __shi grows like n²·1e6·|x|
    // worst-case (prefix sums scaled by n), so the division runs in
    // decimal(38,0) — the envelope is the decimal width (~1e38
    // micro-unit-sums, ≫1e12 rows at unit values; ANSI throws loudly
    // beyond), not the ~3e6-row bound a BIGINT cast would impose.
    def micro6(s: String): org.apache.spark.sql.Column = expr(
      s"(CAST($s AS DECIMAL(38,0)) * 2 + CAST(__n AS DECIMAL(38,0))) div (CAST(__n AS DECIMAL(38,0)) * 2)")
    s4
      .withColumn("__shi", col("__phi") - col("__mhi"))
      .withColumn("__slo", col("__plo") - col("__mlo"))
      .select(kcols ++ Seq(col(tsCol), col(valueCol),
        (micro6("__shi").cast("double") / 1e6).as("cusum_hi"),
        (micro6("__slo").cast("double") / 1e6).as("cusum_lo"),
        (col("__shi") > hN || col("__slo") > hN).as("alarm")): _*)
  }

  /** Scale-safe [[cusum]]: identical output, but no series ever
    * serializes through one cumulative-window task. The bucket-carry
    * construction (the ffill/interpolate/islands split family, applied
    * to prefix sums): split each series into time buckets, compute
    * LOCAL prefix sums and running minima per (key, bucket) — bounded
    * partitions — and restore the global quantities from a per-(key,
    * bucket) carry table (one row per bucket):
    *   P_i         = offset_g + localP_i, offset_g = Σ_{g'<g} bucketSum
    *   runmin_i(P) = min(minBefore_g, offset_g + localRunMin_i)
    * where minBefore_g = min over g'<g of (offset_{g'} + that bucket's
    * min localP). Everything stays exact integer micro-units scaled by
    * n, so the split is bit-identical to [[cusum]] at any bucketing
    * (StatsSpec law) — prefix sums and running minima both carry
    * EXACTLY, unlike float accumulations. The drift terms need the
    * whole-series (n, Σx), which roll up from the same per-bucket
    * aggregation that feeds the carry — one extra tiny agg, no second
    * data pass.
    */
  def cusumSplit(
      df: DataFrame,
      keys: Seq[String],
      slack: Double,
      threshold: Double,
      tsCol: String = "ts",
      valueCol: String = "value",
      splitSeconds: Long = 30L * 86400L,
      adaptiveThreshold: Long = Adaptive.DefaultThreshold): DataFrame = {
    // ADAPTIVE (the constantIslandsSplit discipline): light keys take
    // the plain cumulative window, only heavy keys pay the bucket-carry
    // spine — bit-identical either way (the split law), so routing only
    // moves keys between equivalent plans. adaptiveThreshold <= 0
    // forces every key through the bucket path (the law tests do).
    val (light, heavy) = Adaptive.routeBySize(df, keys, adaptiveThreshold)
    if (adaptiveThreshold > 0L)
      return cusum(light, keys, slack, threshold, tsCol, valueCol)
        .unionByName(cusumSplit(heavy, keys, slack, threshold, tsCol, valueCol,
          splitSeconds, adaptiveThreshold = 0L))
    require(slack >= 0 && threshold > 0,
      s"need slack >= 0 and threshold > 0, got $slack, $threshold")
    require(splitSeconds > 0, s"splitSeconds must be positive, got $splitSeconds")
    import org.apache.spark.sql.expressions.Window
    val kcols = keys.map(col)
    val dec = "decimal(38,0)"
    val slackQ = BigDecimal(slack * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val thrQ = BigDecimal(threshold * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val bUs = splitSeconds * 1000000L
    val base = df
      .withColumn("__xq", round(col(valueCol) * 1e6, 0).cast(dec))
      .withColumn("__b", floor(unix_micros(col(tsCol).cast("timestamp")) / bUs))
    // per-(key, bucket) sums/counts -> per-key totals (tiny tables)
    val perB = base.groupBy((kcols :+ col("__b")): _*)
      .agg(count(lit(1)).as("__cnt"), sum(col("__xq")).as("__sx"))
    val wk = Window.partitionBy(kcols: _*)
    val totals = perB
      .withColumn("__n", sum(col("__cnt")).over(wk))
      .withColumn("__sum", sum(col("__sx")).over(wk))
    // bucket drift-sum derives from the bucket's (cnt, sx) + the totals:
    // Σ_bucket e = n·sx_b − cnt_b·Σx − cnt_b·n·slack  (both sides)
    val eHiB = col("__n") * col("__sx") - col("__cnt") * col("__sum") -
      lit(slackQ).cast(dec) * col("__cnt") * col("__n")
    val eLoB = col("__cnt") * col("__sum") - col("__n") * col("__sx") -
      lit(slackQ).cast(dec) * col("__cnt") * col("__n")
    // local prefix work per (key, bucket): bounded partitions
    val wkbCum = Window.partitionBy((kcols :+ col("__b")): _*)
      .orderBy(col(tsCol), col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = base
      .join(totals.select((kcols :+ col("__b") :+ col("__n") :+ col("__sum")): _*),
        keys :+ "__b")
      .withColumn("__ehi",
        col("__xq") * col("__n") - col("__sum") - lit(slackQ).cast(dec) * col("__n"))
      .withColumn("__elo",
        col("__sum") - col("__xq") * col("__n") - lit(slackQ).cast(dec) * col("__n"))
      .withColumn("__lphi", sum(col("__ehi")).over(wkbCum))
      .withColumn("__lplo", sum(col("__elo")).over(wkbCum))
      .withColumn("__lmhi", min(col("__lphi")).over(wkbCum))
      .withColumn("__lmlo", min(col("__lplo")).over(wkbCum))
    // carry table: offsets (prefix of bucket sums over PRECEDING
    // buckets) and min-before (running min of offset + bucket min)
    val wkOrd = Window.partitionBy(kcols: _*).orderBy(col("__b").asc)
    val wPrev = wkOrd.rowsBetween(Window.unboundedPreceding, -1)
    val bucketMin = local.groupBy((kcols :+ col("__b")): _*)
      .agg(min(col("__lphi")).as("__bmhi"), min(col("__lplo")).as("__bmlo"))
    val carries = totals.join(bucketMin, keys :+ "__b")
      .withColumn("__offhi", coalesce(sum(eHiB).over(wPrev), lit(0).cast(dec)))
      .withColumn("__offlo", coalesce(sum(eLoB).over(wPrev), lit(0).cast(dec)))
      .withColumn("__mbhi", min(col("__offhi") + col("__bmhi")).over(wPrev))
      .withColumn("__mblo", min(col("__offlo") + col("__bmlo")).over(wPrev))
      .select((kcols ++ Seq(col("__b"), col("__offhi"), col("__offlo"),
        col("__mbhi"), col("__mblo"))): _*)
    val joined = local.join(carries, keys :+ "__b")
      .withColumn("__phi", col("__offhi") + col("__lphi"))
      .withColumn("__plo", col("__offlo") + col("__lplo"))
      .withColumn("__rmhi",
        least(coalesce(col("__mbhi"), col("__phi")), col("__offhi") + col("__lmhi")))
      .withColumn("__rmlo",
        least(coalesce(col("__mblo"), col("__plo")), col("__offlo") + col("__lmlo")))
      .withColumn("__shi", col("__phi") - least(col("__rmhi"), lit(0).cast(dec)))
      .withColumn("__slo", col("__plo") - least(col("__rmlo"), lit(0).cast(dec)))
    val hN = lit(thrQ).cast(dec) * col("__n")
    // decimal(38,0) half-up division — same exactness/envelope argument
    // as the plain [[cusum]]'s micro6 (worst case n²·1e6·|x| overflows a
    // BIGINT cast around ~3e6 rows; the decimal width doesn't)
    def micro6(s: String): org.apache.spark.sql.Column = expr(
      s"(CAST($s AS DECIMAL(38,0)) * 2 + CAST(__n AS DECIMAL(38,0))) div (CAST(__n AS DECIMAL(38,0)) * 2)")
    joined.select(kcols ++ Seq(col(tsCol), col(valueCol),
      (micro6("__shi").cast("double") / 1e6).as("cusum_hi"),
      (micro6("__slo").cast("double") / 1e6).as("cusum_lo"),
      (col("__shi") > hN || col("__slo") > hN).as("alarm")): _*)
  }

  /** Cumulative-meter consumption deltas with counter-reset handling —
    * the metering primitive of the reference's energy-series domain:
    * delta_i = x_i − x_{i−1}, and a NEGATIVE delta means the counter
    * reset (rollover, meter swap), in which case the reading itself is
    * the consumption since the reset (Prometheus `increase()`
    * semantics). First reading of a series has no delta (null, not 0 —
    * an unknown baseline is not zero consumption).
    *
    * One `lag` window per key — distributes across series; the delta is
    * a single IEEE subtraction of input doubles (no accumulation, so no
    * float-order hazard; both engines compute the identical value).
    *
    * Output: (keys…, orderCol, tsCol, valueCol, delta, is_reset).
    */
  def counterDelta(
      df: DataFrame,
      keys: Seq[String],
      orderCol: String,
      tsCol: String = "ts",
      valueCol: String = "value"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col(orderCol))
    val prev = lag(col(valueCol), 1).over(w)
    df
      .withColumn("__prev", prev)
      .withColumn("is_reset",
        col("__prev").isNotNull && col(valueCol) < col("__prev"))
      .withColumn("delta",
        when(col("__prev").isNull, lit(null).cast("double"))
          .when(col("is_reset"), col(valueCol))
          .otherwise(col(valueCol) - col("__prev")))
      .select(keys.map(col) ++ Seq(col(orderCol), col(tsCol), col(valueCol),
        col("delta"), col("is_reset")): _*)
  }

  /** Scale-safe [[counterDelta]]: the lag window runs per (key, time
    * bucket) — bounded partitions — and a boundary row's predecessor is
    * restored from a one-row-per-bucket carry table (each bucket's LAST
    * reading by (ts, order), lagged one bucket per key). A within-bucket
    * first row takes the carry BY POSITION (row_number = 1), not by
    * lag-null — a null previous READING is legitimate data that must not
    * be papered over with the carry. Identical output to [[counterDelta]]
    * at any bucketing (StatsSpec law).
    */
  def counterDeltaSplit(
      df: DataFrame,
      keys: Seq[String],
      orderCol: String,
      tsCol: String = "ts",
      valueCol: String = "value",
      splitSeconds: Long = 30L * 86400L,
      adaptiveThreshold: Long = Adaptive.DefaultThreshold): DataFrame = {
    // ADAPTIVE: same count-then-branch routing as cusumSplit above
    val (light, heavy) = Adaptive.routeBySize(df, keys, adaptiveThreshold)
    if (adaptiveThreshold > 0L)
      return counterDelta(light, keys, orderCol, tsCol, valueCol)
        .unionByName(counterDeltaSplit(heavy, keys, orderCol, tsCol, valueCol,
          splitSeconds, adaptiveThreshold = 0L))
    require(splitSeconds > 0, s"splitSeconds must be positive, got $splitSeconds")
    import org.apache.spark.sql.expressions.Window
    val kcols = keys.map(col)
    val bUs = splitSeconds * 1000000L
    val withB = df.withColumn("__b",
      floor(unix_micros(col(tsCol).cast("timestamp")) / bUs))
    val lastPer = withB.groupBy((kcols :+ col("__b")): _*)
      .agg(max(struct(col(tsCol), col(orderCol), col(valueCol).as("__v")))
        .getField("__v").as("__last"))
    val wkOrd = Window.partitionBy(kcols: _*).orderBy(col("__b").asc)
    val carries = lastPer
      .withColumn("__carry", lag(col("__last"), 1).over(wkOrd))
      // whether ANY earlier bucket exists: a first-bucket first row has
      // no predecessor (delta null) even when the carry value is null
      .withColumn("__has_prev", row_number().over(wkOrd) > 1)
      .select((kcols ++ Seq(col("__b"), col("__carry"), col("__has_prev"))): _*)
    val wkb = Window.partitionBy((kcols :+ col("__b")): _*)
      .orderBy(col(tsCol), col(orderCol))
    val joined = withB.join(carries, keys :+ "__b")
      .withColumn("__rn", row_number().over(wkb))
      .withColumn("__lagv", lag(col(valueCol), 1).over(wkb))
      .withColumn("__prev", when(col("__rn") === 1, col("__carry")).otherwise(col("__lagv")))
      .withColumn("__first", col("__rn") === 1 && !col("__has_prev"))
    joined
      .withColumn("is_reset",
        !col("__first") && col("__prev").isNotNull && col(valueCol) < col("__prev"))
      .withColumn("delta",
        when(col("__first") || col("__prev").isNull, lit(null).cast("double"))
          .when(col("is_reset"), col(valueCol))
          .otherwise(col(valueCol) - col("__prev")))
      .select(keys.map(col) ++ Seq(col(orderCol), col(tsCol), col(valueCol),
        col("delta"), col("is_reset")): _*)
  }
}
