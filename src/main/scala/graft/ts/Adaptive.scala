package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Adaptive routing for the hot-series "split" family: every whole-series
  * window operator has a bucket-carry twin (constantIslandsSplit,
  * cusumSplit, counterDeltaSplit, …) that parallelizes a monster series
  * across time buckets — but the carry spine costs ~3× the plain window
  * on series that DON'T need splitting (measured on q_islands_split at
  * sf0.1). The fix is to route per key by row count: light keys take the
  * plain single-window path, only heavy keys pay the bucket machinery.
  * Both forms are law-tested bit-identical, so routing never changes a
  * result — it only moves keys between two equivalent plans.
  */
object Adaptive {

  /** Default rows-per-key threshold above which a series is "heavy".
    * 100k rows sort comfortably inside one window task (a few MB); far
    * below the point where a single-task sort hurts.
    */
  val DefaultThreshold = 100000L

  /** Partition `df`'s rows into (light, heavy) by per-key row count:
    * keys with ≤ `threshold` rows go light, the rest heavy. One
    * map-side-combined count aggregation plus one equi-join on the keys
    * — the join shuffles on the same keys the downstream window
    * partitions by, so the exchange is reused. `threshold <= 0` sends
    * everything heavy (how the law tests force the bucket path).
    */
  def routeBySize(
      df: DataFrame, keys: Seq[String], threshold: Long): (DataFrame, DataFrame) = {
    if (threshold <= 0L) return (df.where(lit(false)), df)
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__adaptive_n"))
    val withN = df.join(counts, keys)
    (withN.filter(col("__adaptive_n") <= threshold).drop("__adaptive_n"),
      withN.filter(col("__adaptive_n") > threshold).drop("__adaptive_n"))
  }
}
