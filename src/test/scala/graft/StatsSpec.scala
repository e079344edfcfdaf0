package graft

import graft.ts.Stats
import org.apache.spark.sql.functions._

/** Per-series statistical conditioning (ts/Stats.scala): hand-computed
  * EWMA recursion, winsorize clamp bounds, and histogram edge-bin
  * clamping — plus partitioning-independence for the sequential fold.
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  private def series(vals: Seq[Double], key: String = "k"): org.apache.spark.sql.DataFrame = {
    val t0 = java.time.LocalDateTime.parse("2024-01-01T00:00")
    vals.zipWithIndex.map { case (v, i) => (key, t0.plusHours(i.toLong), v) }
      .toDF("key", "ts", "value")
  }

  test("ewmaLevel: hand-computed recursion; single point is its own level") {
    // s0=10; s1=.7*10+.3*20=13; s2=.7*13+.3*0=9.1
    val out = Stats.ewmaLevel(series(Seq(10.0, 20.0, 0.0)), Seq("key"), alpha = 0.3).head()
    assert(out.getAs[Long]("n") === 3L)
    assert(math.abs(out.getAs[Double]("ewma") - 9.1) < 1e-12)
    val one = Stats.ewmaLevel(series(Seq(42.5)), Seq("key"), alpha = 0.3).head()
    assert(one.getAs[Double]("ewma") === 42.5)
  }

  test("ewmaLevel is partitioning-independent (fold order fixed by ts)") {
    val rnd = new scala.util.Random(99L)
    val vals = Seq.fill(500)(rnd.nextDouble() * 100)
    val df = series(vals)
    val a = Stats.ewmaLevel(df, Seq("key"), 0.2).head().getAs[Double]("ewma")
    val b = Stats.ewmaLevel(df.repartition(13), Seq("key"), 0.2).head().getAs[Double]("ewma")
    assert(a === b)
    // matches the driver-side fold exactly
    val ref = vals.tail.foldLeft(vals.head)((acc, x) => acc * 0.8 + x * 0.2)
    assert(a === ref)
  }

  test("winsorize clamps to the exact interpolated percentiles") {
    // values 1..10: p10 = 1.9, p90 = 9.1 (linear interpolation)
    val df = series((1 to 10).map(_.toDouble))
    val out = Stats.winsorize(df, Seq("key"), 0.1, 0.9)
      .orderBy("ts").collect().map(_.getAs[Double]("value_clipped"))
    assert(math.abs(out.head - 1.9) < 1e-12)
    assert(math.abs(out.last - 9.1) < 1e-12)
    assert(out(4) === 5.0) // interior untouched
  }

  test("madOutliers: spike flags, normal points pass; constant series flags any deviation") {
    // median 5, MAD 1 → threshold 3.5*1.4826 ≈ 5.19; 100 flags, 7 doesn't
    val df = series(Seq(4.0, 5.0, 6.0, 5.0, 4.0, 6.0, 7.0, 100.0))
    val out = Stats.madOutliers(df, Seq("key"))
    assert(out.filter(col("is_outlier")).collect().map(_.getAs[Double]("value")).toSeq === Seq(100.0))
    val const = Stats.madOutliers(series(Seq(2.0, 2.0, 2.0, 3.0)), Seq("key"))
    assert(const.filter(col("is_outlier")).count() === 1) // MAD 0 → 3.0 flags
  }

  test("deseasonalize: residual is zero when every (dow, hod) slot is constant") {
    // two full weeks of hourly data, value = pure function of (dow, hod)
    val t0 = java.time.LocalDateTime.parse("2024-01-01T00:00")
    val df = (0 until 24 * 14).map { i =>
      val ts = t0.plusHours(i.toLong)
      ("k", ts, (ts.getDayOfWeek.getValue * 100 + ts.getHour).toDouble)
    }.toDF("key", "ts", "value")
    val out = Stats.deseasonalize(df, Seq("key"))
    assert(out.count() === 24 * 14)
    assert(out.filter(abs(col("residual")) > 1e-12).isEmpty)
    // profile has one row per occupied slot
    assert(Stats.seasonalProfile(df, Seq("key")).count() === 7 * 24)
  }

  test("histogram: shared grid, out-of-range values clamp to edge bins") {
    val df = series(Seq(-5.0, 0.0, 4.9, 5.0, 99.0, 250.0))
    val out = Stats.histogram(df, Seq("key"), lo = 0.0, hi = 100.0, bins = 20)
      .orderBy("bin").collect().map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n")))
    // -5 clamps to bin 0; 0 and 4.9 land in bin 0; 5.0 in bin 1;
    // 99 in bin 19; 250 clamps to bin 19
    assert(out.toSeq === Seq((0L, 3L), (1L, 1L), (19L, 2L)))
  }
}
