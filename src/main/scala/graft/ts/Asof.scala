package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — attach to each left row the nearest right row at or
  * before (backward) / at or after (forward) its timestamp, per key,
  * optionally within a tolerance. The canonical timeseries-alignment
  * operator (pandas `merge_asof`; the reference aligns series onto
  * reference profiles the same way in `utils/timeseries.py`'s
  * interpolation/upsample helpers — this generalizes that shape to any
  * two keyed frames).
  *
  * Spark-first plan: NO range join, NO per-row subquery — tag both
  * sides, union, and run ONE window per key ordered by (ts, side) with a
  * running `last(ignoreNulls)` over the right payload: a single shuffle
  * on the key, linear scan per partition. The window partitions by the
  * series key alone, so a single hot series serializes into one task —
  * inherent to ordered-alignment semantics (same bound as the reference's
  * per-series pandas ops); sub-key parallelism would need range
  * repartitioning with boundary handoff, which the union trick trades
  * away for zero extra passes.
  *
  * Right rows should be unique per (keys, ts) — ties are broken
  * arbitrarily (pre-aggregate the right side to make them deterministic).
  * Left/right non-key column names must not clash.
  */
object Asof {

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String = "ts",
      rightCols: Seq[String] = Seq("value"),
      toleranceSecs: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward", s"bad direction $direction")
    val backward = direction == "backward"
    val leftExtra = left.columns.filterNot(c => keys.contains(c) || c == tsCol).toSeq
    val l2 = left.select(
      (keys :+ tsCol).map(col) ++ Seq(lit(1).as("__side")) ++ leftExtra.map(col): _*)
    val r2 = right.select(
      (keys :+ tsCol).map(col) ++ Seq(
        lit(0).as("__side"),
        struct(col(tsCol).as("__rt") +: rightCols.map(col): _*).as("__rp")): _*)
    val u = l2.unionByName(r2, allowMissingColumns = true)
    // Ordering puts right rows at an equal timestamp inside the frame of
    // a left row at that timestamp (inclusive match on both directions).
    // Both directions scan with a GROWING (unboundedPreceding, currentRow)
    // frame, which Spark evaluates incrementally in one linear pass; the
    // forward case flips the sort to ts DESC instead of using a shrinking
    // (currentRow, unboundedFollowing) frame, which would rescan to the
    // partition end for every row — O(n^2) per key.
    val w =
      if (backward)
        Window.partitionBy(keys.map(col): _*)
          .orderBy(col(tsCol).asc, col("__side").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else
        Window.partitionBy(keys.map(col): _*)
          .orderBy(col(tsCol).desc, col("__side").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pick = last(col("__rp"), ignoreNulls = true).over(w)
    val m = u.withColumn("__m", pick).filter(col("__side") === 1)
    val bounded = toleranceSecs match {
      case Some(s) =>
        val ok =
          if (backward) col(tsCol) <= col("__m.__rt") + expr(s"INTERVAL '$s' SECOND")
          else col("__m.__rt") <= col(tsCol) + expr(s"INTERVAL '$s' SECOND")
        m.withColumn("__m", when(col("__m").isNotNull && ok, col("__m")))
      case None => m
    }
    bounded.select(
      (keys :+ tsCol).map(col) ++ leftExtra.map(col)
        ++ rightCols.map(c => col(s"__m.$c").as(c)): _*)
  }

  /** Hot-series form of [[asofJoin]]: identical semantics, but no series
    * ever serializes into ONE window task. The series is pre-split on a
    * coarse time bucket and each (key, bucket) aligns independently; the
    * cross-boundary matches that splitting would lose are restored by a
    * boundary pass at BUCKET granularity — per (key, bucket), the
    * nearest right row from any earlier (backward) / later (forward)
    * bucket is computed from per-bucket edge summaries (one row per
    * bucket, so that window is metadata-sized) and injected as one
    * synthetic right row carrying its original timestamp. Then the
    * verified single-window core runs with the bucket appended to the
    * partition keys. A year-long 1s-resolution series at the default
    * 30-day split runs as ~12 parallel tasks instead of one.
    */
  def asofJoinSplit(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String = "ts",
      rightCols: Seq[String] = Seq("value"),
      toleranceSecs: Option[Long] = None,
      direction: String = "backward",
      splitSeconds: Long = 30L * 86400L): DataFrame = {
    require(direction == "backward" || direction == "forward", s"bad direction $direction")
    require(splitSeconds > 0, s"splitSeconds must be positive, got $splitSeconds")
    val backward = direction == "backward"
    val bUs = splitSeconds * 1000000L
    def bucket(c: org.apache.spark.sql.Column) =
      floor(unix_micros(c.cast("timestamp")) / bUs)
    val lB = left.withColumn("__b", bucket(col(tsCol)))
    val rB = right.withColumn("__b", bucket(col(tsCol)))
    // per-(key, bucket) edge of the right side: the row a later (backward)
    // / earlier (forward) bucket would reach across the boundary for
    val payload = struct(col(tsCol) +: rightCols.map(col): _*)
    val edges = rB.groupBy((keys.map(col) :+ col("__b")): _*)
      .agg((if (backward) max_by(payload, col(tsCol)) else min_by(payload, col(tsCol)))
        .as("__edge"))
    // every bucket either side touches, so left-only buckets still get a
    // carry from the nearest right-bearing bucket
    val allB = lB.select((keys.map(col) :+ col("__b")): _*)
      .union(rB.select((keys.map(col) :+ col("__b")): _*)).distinct()
      .join(edges, keys :+ "__b", "left")
    val wc = Window.partitionBy(keys.map(col): _*)
      .orderBy(if (backward) col("__b").asc else col("__b").desc)
      .rowsBetween(Window.unboundedPreceding, -1) // strictly previous buckets
    val carries = allB
      .withColumn("__carry", last(col("__edge"), ignoreNulls = true).over(wc))
      .filter(col("__carry").isNotNull)
      .select((keys.map(col) :+ col("__b") :+
        col(s"__carry.$tsCol").as(tsCol)) ++
        rightCols.map(c => col(s"__carry.$c").as(c)): _*)
    val augmentedRight = rB
      .select((keys.map(col) :+ col("__b") :+ col(tsCol)) ++ rightCols.map(col): _*)
      .unionByName(carries)
    asofJoin(lB, augmentedRight, keys :+ "__b", tsCol, rightCols, toleranceSecs, direction)
      .drop("__b")
  }
}
