package graft

import graft.ts.Stats
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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

  test("ewmaLevelSegmented == ewmaLevel (affine-composition law, multi-segment)") {
    val rnd = new scala.util.Random(7L)
    // 30 days of hourly points across 2 keys → 5 segments at 7-day buckets
    val t0 = java.time.LocalDateTime.parse("2024-01-01T00:00")
    val df = (for (k <- Seq("a", "b"); i <- 0 until 720)
      yield (k, t0.plusHours(i.toLong), rnd.nextDouble() * 100)).toDF("key", "ts", "value")
    for (alpha <- Seq(0.05, 0.3, 1.0)) {
      val ref = Stats.ewmaLevel(df, Seq("key"), alpha).collect()
        .map(r => r.getAs[String]("key") -> (r.getAs[Long]("n"), r.getAs[Double]("ewma"))).toMap
      val seg = Stats.ewmaLevelSegmented(df, Seq("key"), alpha).collect()
        .map(r => r.getAs[String]("key") -> (r.getAs[Long]("n"), r.getAs[Double]("ewma"))).toMap
      assert(seg.keySet === ref.keySet)
      for ((k, (n, e)) <- ref) {
        assert(seg(k)._1 === n)
        assert(math.abs(seg(k)._2 - e) <= 1e-9 * math.max(1.0, math.abs(e)),
          s"alpha=$alpha key=$k: segmented ${seg(k)._2} != collected $e")
      }
    }
    // degenerate shapes: single point, single segment, segment of size 1
    val tiny = series(Seq(42.5))
    assert(Stats.ewmaLevelSegmented(tiny, Seq("key"), 0.3).head().getAs[Double]("ewma") === 42.5)
    val oneSeg = series(Seq(10.0, 20.0, 0.0))
    assert(math.abs(Stats.ewmaLevelSegmented(oneSeg, Seq("key"), 0.3).head()
      .getAs[Double]("ewma") - 9.1) < 1e-12)
    // hourly points with 1-hour segments: every segment has exactly 1 point
    val perPoint = Stats.ewmaLevelSegmented(series(Seq(10.0, 20.0, 0.0)), Seq("key"), 0.3,
      segmentSeconds = 3600L).head()
    assert(math.abs(perPoint.getAs[Double]("ewma") - 9.1) < 1e-12)
    assert(perPoint.getAs[Long]("n") === 3L)
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

  test("interpolate: time-weighted interior fill, edges stay null, non-nulls pass through") {
    val t0 = java.time.LocalDateTime.parse("2024-01-01T00:00")
    // irregular spacing: known at h0 (10.0) and h4 (30.0); holes at h1, h3;
    // leading hole at h-2 position via a separate first row
    val rows = Seq(
      (java.lang.Double.valueOf(Double.NaN), -2L), // leading null (as null below)
      (java.lang.Double.valueOf(10.0), 0L),
      (null.asInstanceOf[java.lang.Double], 1L),
      (null.asInstanceOf[java.lang.Double], 3L),
      (java.lang.Double.valueOf(30.0), 4L),
      (null.asInstanceOf[java.lang.Double], 9L)) // trailing null
      .map { case (v, h) => ("k", t0.plusHours(h),
        if (v == null || v.isNaN) null.asInstanceOf[java.lang.Double] else v) }
    val df = rows.toDF("key", "ts", "value")
    val out = graft.ts.Resample.interpolate(df, Seq("key"))
      .orderBy("ts").collect().map(r => Option(r.getAs[java.lang.Double]("value_interp")))
    assert(out(0).isEmpty)                       // leading: no prev → null
    assert(out(1).contains(10.0))
    assert(out(2).contains(15.0))                // h1: 10 + (30-10)*(1/4)
    assert(out(3).contains(25.0))                // h3: 10 + (30-10)*(3/4)
    assert(out(4).contains(30.0))
    assert(out(5).isEmpty)                       // trailing: no next → null
  }

  test("autocorr: perfect persistence is 1, alternating series is -1, short series null") {
    val t0 = java.time.LocalDateTime.parse("2024-01-01T00:00")
    def mk(key: String, vals: Seq[Double]) =
      vals.zipWithIndex.map { case (v, i) => (key, t0.plusHours(i.toLong), i.toLong, v) }
    val df = (mk("up", (1 to 50).map(_.toDouble)) ++
      mk("alt", Seq.fill(25)(Seq(1.0, -1.0)).flatten) ++
      mk("one", Seq(5.0)))
      .toDF("key", "ts", "event_id", "value")
    val out = Stats.autocorr(df, Seq("key"), lagK = 1, orderCol = "event_id")
      .collect().map(r => r.getString(0) -> Option(r.getAs[java.lang.Double]("acf"))).toMap
    assert(math.abs(out("up").get - 1.0) < 1e-9)
    assert(math.abs(out("alt").get - (-1.0)) < 1e-9)
    assert(out("one").isEmpty) // no pairs → null
  }

  test("rollingMedian: spike-resistant baseline; partial leading windows use what's there") {
    val t0 = java.time.LocalDateTime.parse("2024-01-01T00:00")
    val vals = Seq(1.0, 2.0, 3.0, 1000.0, 2.0, 1.0, 3.0)
    val df = vals.zipWithIndex.map { case (v, i) => ("k", t0.plusHours(i.toLong), i.toLong, v) }
      .toDF("key", "ts", "event_id", "value")
    val out = Stats.rollingMedian(df, Seq("key"), n = 3, orderCol = "event_id")
      .orderBy("ts").collect().map(_.getAs[Double]("roll_med"))
    assert(out(0) === 1.0)  // window of 1
    assert(out(1) === 1.5)  // median(1,2)
    assert(out(3) === 3.0)  // median(2,3,1000) — the spike does NOT drag it
    assert(out(4) === 3.0)  // median(3,1000,2)
  }

  // The padded-bucket law: a trailing-ROWS window over (key, bucket) with
  // each bucket's last n−1 rows replicated into later buckets must equal
  // the whole-series window exactly — including across sparse buckets,
  // where one bucket holds fewer than n−1 rows and the carry must reach
  // back through several buckets.
  test("rollingMedianSplit/movingAvgSplit == whole-series window (padding law)") {
    val rnd = new scala.util.Random(23L)
    val t0 = java.time.LocalDateTime.parse("2024-01-01T00:00")
    // two keys, irregular spacing: dense bursts + multi-day gaps so 1-day
    // buckets range from 0 to ~30 rows around an n=24 window
    val rows = for (k <- Seq("a", "b"); i <- 0 until 400) yield {
      val gapH = if (i % 37 == 0) 50L else if (rnd.nextDouble() < 0.2) 7L else 1L
      (k, i.toLong, gapH, rnd.nextDouble() * 100)
    }
    val cum = rows.groupBy(_._1).flatMap { case (k, rs) =>
      var h = 0L
      rs.sortBy(_._2).map { case (_, i, g, v) => h += g; (k, t0.plusHours(h), i, v) }
    }.toSeq
    val df = cum.toDF("key", "ts", "event_id", "value")
    for (n <- Seq(1, 3, 24)) {
      val ref = Stats.rollingMedian(df, Seq("key"), n, orderCol = "event_id")
        .select("key", "event_id", "roll_med").orderBy("key", "event_id")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      for (bucketS <- Seq(86400L, 3 * 3600L)) { // day buckets + near-per-row buckets
        val split = Stats.rollingMedianSplit(df, Seq("key"), n, orderCol = "event_id",
            splitSeconds = bucketS)
          .select("key", "event_id", "roll_med").orderBy("key", "event_id")
          .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        assert(split.toSeq === ref.toSeq, s"n=$n bucket=$bucketS")
      }
    }
    val wholeW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("ts"), col("event_id")).rowsBetween(-4, 0)
    val refAvg = df.withColumn("ma", avg(col("value")).over(wholeW))
      .select("key", "event_id", "ma").orderBy("key", "event_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val splitAvg = Stats.movingAvgSplit(df, Seq("key"), n = 5, orderCol = "event_id",
        outCol = "ma", splitSeconds = 86400L)
      .select("key", "event_id", "ma").orderBy("key", "event_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(splitAvg.toSeq === refAvg.toSeq)
  }

  test("autocorrSplit == autocorr (pair set exact, acf to 1e-9)") {
    val rnd = new scala.util.Random(31L)
    val t0 = java.time.LocalDateTime.parse("2024-01-01T00:00")
    // irregular gaps + interior nulls so lag pairs cross bucket edges and
    // the pairwise-complete masking is exercised
    val rows = for (k <- Seq("a", "b"); i <- 0 until 300) yield {
      val v: Any = if (rnd.nextDouble() < 0.15) null else Double.box(rnd.nextDouble() * 50 + (i % 7))
      (k, t0.plusHours(i * 3L + (i % 5)), i.toLong, v)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (k, t, i, v) =>
        org.apache.spark.sql.Row(k, t, i, v) }),
      StructType(Seq(
        StructField("key", StringType), StructField("ts", TimestampNTZType),
        StructField("event_id", LongType), StructField("value", DoubleType))))
    for (k <- Seq(1, 3)) {
      val ref = Stats.autocorr(df, Seq("key"), k, orderCol = "event_id")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      val split = Stats.autocorrSplit(df, Seq("key"), k, orderCol = "event_id",
          splitSeconds = 2L * 86400L)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(split.keySet === ref.keySet)
      for ((key, (n, acf)) <- ref) {
        assert(split(key)._1 === n, s"lag=$k key=$key n_pairs")
        assert(math.abs(split(key)._2 - acf) <= 1e-9 * math.max(1.0, math.abs(acf)),
          s"lag=$k key=$key: split ${split(key)._2} != whole-series $acf")
      }
    }
  }

  test("peakOffpeak: weekday 8-20h is peak, weekends never are") {
    // 2024-01-01 is a Monday; 2024-01-06/07 the weekend
    val rows = Seq(
      ("2024-01-01T09:00", 10.0), // Mon 9h → peak
      ("2024-01-01T21:00", 1.0),  // Mon 21h → off
      ("2024-01-06T12:00", 5.0),  // Sat noon → off
      ("2024-01-07T10:00", 7.0))  // Sun → off
      .map { case (t, v) => ("k", java.time.LocalDateTime.parse(t), v) }
    val out = Stats.peakOffpeak(rows.toDF("key", "ts", "value"), Seq("key"))
      .collect().map(r => r.getBoolean(1) -> (r.getDouble(2), r.getLong(3))).toMap
    assert(out(true) === ((10.0, 1L)))
    assert(out(false) === ((13.0, 3L)))
  }

  test("loadFactor: flat day is 1.0, peaky day is avg/max, zero-max day null") {
    val t0 = java.time.LocalDateTime.parse("2024-01-01T00:00")
    val rows =
      (0 until 4).map(i => ("k", t0.plusHours(i.toLong), 5.0)) ++           // flat day
      (0 until 4).map(i => ("k", t0.plusDays(1).plusHours(i.toLong),
        if (i == 0) 8.0 else 0.0)) ++                                       // peaky: avg 2, max 8
      (0 until 2).map(i => ("k", t0.plusDays(2).plusHours(i.toLong), 0.0))  // zero day
    val out = Stats.loadFactor(rows.toDF("key", "ts", "value"), Seq("key"))
      .orderBy("day").collect().map(r => Option(r.getAs[java.lang.Double]("load_factor")))
    assert(out(0).contains(1.0))
    assert(out(1).contains(0.25))
    assert(out(2).isEmpty)
  }

  test("histogram: shared grid, out-of-range values clamp to edge bins, NaN is a hole") {
    val df = series(Seq(-5.0, 0.0, 4.9, 5.0, 99.0, 250.0, Double.NaN))
    val out = Stats.histogram(df, Seq("key"), lo = 0.0, hi = 100.0, bins = 20)
      .orderBy("bin").collect().map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n")))
    // -5 clamps to bin 0; 0 and 4.9 land in bin 0; 5.0 in bin 1;
    // 99 in bin 19; 250 clamps to bin 19; NaN is excluded, NOT a
    // max-range reading
    assert(out.toSeq === Seq((0L, 3L), (1L, 1L), (19L, 2L)))
  }

  test("autocorr: n_pairs counts only the pairs corr uses when values are null") {
    val t0 = java.time.LocalDateTime.parse("2024-01-01T00:00")
    val df = Seq(Some(1.0), None, Some(3.0), Some(4.0)).zipWithIndex
      .map { case (v, i) => ("k", t0.plusHours(i.toLong), i.toLong, v.map(Double.box).orNull) }
      .toDF("key", "ts", "event_id", "value")
    val r = Stats.autocorr(df, Seq("key"), lagK = 1, orderCol = "event_id").head()
    // usable pairs: only (4.0, 3.0) — (null,1.0) and (3.0,null) don't count
    assert(r.getAs[Long]("n_pairs") === 1L)
    // zero-variance series: acf is null, not NaN
    val const = (0 until 5).map(i => ("c", t0.plusHours(i.toLong), i.toLong, 2.0))
      .toDF("key", "ts", "event_id", "value")
    val rc = Stats.autocorr(const, Seq("key"), lagK = 1, orderCol = "event_id").head()
    assert(rc.isNullAt(rc.fieldIndex("acf")))
  }

  test("cusum: window algebra == the sequential Page recursion; alarm fires on the shifted regime") {
    val t0 = java.time.LocalDateTime.parse("2024-01-01T00:00")
    // a regime shift at i=10: mean 1.0 then mean 5.0
    val vals = (Seq.fill(10)(1.0) ++ Seq.fill(10)(5.0)).zipWithIndex
    val df = vals.map { case (v, i) => ("k", t0.plusHours(i.toLong), v + (i % 3) * 0.1) }
      .toDF("key", "ts", "value")
    val slack = 0.5; val threshold = 1.5
    val got = Stats.cusum(df, Seq("key"), slack = slack, threshold = threshold)
      .orderBy("ts").collect()
      .map(r => (r.getAs[Double]("cusum_hi"), r.getAs[Double]("cusum_lo"), r.getAs[Boolean]("alarm")))
    // driver-side reference: the classic recursion on the same micro-int
    // scaled terms (exactly what the window algebra must reproduce)
    val xs = df.orderBy("ts").collect().map(_.getAs[Double]("value"))
    val xq = xs.map(v => BigDecimal(v * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    val n = xq.length.toLong; val sum = xq.sum
    val sQ = math.round(slack * 1e6); val hQ = math.round(threshold * 1e6)
    var shi = BigInt(0); var slo = BigInt(0)
    val ref = xq.map { q =>
      shi = (shi + (BigInt(q) * n - sum - BigInt(sQ) * n)).max(0)
      slo = (slo + (BigInt(sum) - BigInt(q) * n - BigInt(sQ) * n)).max(0)
      def out(s: BigInt): Double = ((s * 2 + n) / (n * 2)).toDouble / 1e6
      (out(shi), out(slo), shi > BigInt(hQ) * n || slo > BigInt(hQ) * n)
    }
    assert(got.toSeq === ref.toSeq)
    // two-sided against the GLOBAL mean: regime 1 sits below μ (lower
    // side accumulates), regime 2 above (upper side) — the hi cusum is
    // flat through regime 1 and grows monotonically to an alarm by the
    // end of regime 2
    assert(got.take(10).forall(_._1 === 0.0), "hi side moved in the below-mean regime")
    assert(got.last._3 && got.last._1 > threshold, "regime shift not detected on the hi side")
    // partitioning-independent (exact integer window sums)
    val many = (0L until 200L).flatMap(i => Seq(("a" + i % 7, t0.plusMinutes(i), math.sin(i * 0.7) * 50)))
      .toDF("key", "ts", "value")
    def run(p: Int) = Stats.cusum(many.repartition(p), Seq("key"), slack = 5, threshold = 20)
      .orderBy("key", "ts").collect().toSeq
    assert(run(1) === run(8))
  }

  test("cusum == driver-side Page recursion on random series (negatives, duplicate ts)") {
    val rnd = new scala.util.Random(4242L)
    val t0 = java.time.LocalDateTime.parse("2024-01-01T00:00")
    // duplicate timestamps on ~20% of rows; values span negative/positive
    val rows = (0 until 400).map { i =>
      val ts = t0.plusMinutes((i / 5 * 7 + (if (rnd.nextDouble() < 0.2) 0 else i % 5)).toLong)
      ("k" + i % 3, ts, (rnd.nextDouble() - 0.5) * 200)
    }
    val df = rows.toDF("key", "ts", "value")
    val (slack, threshold) = (7.0, 40.0)
    val got = Stats.cusum(df, Seq("key"), slack = slack, threshold = threshold)
      .collect().map(r => ((r.getString(0), r.get(1).toString, r.getDouble(2)),
        (r.getDouble(3), r.getDouble(4), r.getBoolean(5)))).toMap
    val sQ = math.round(slack * 1e6); val hQ = math.round(threshold * 1e6)
    rows.groupBy(_._1).foreach { case (k, rs) =>
      val ordered = rs.map { case (_, ts, v) =>
        (java.sql.Timestamp.valueOf(ts).getTime, ts, v) }.sortBy(t => (t._1, t._3))
      val xq = ordered.map { case (_, _, v) =>
        BigDecimal(v * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong }
      val n = xq.length.toLong; val sum = xq.sum
      var shi = BigInt(0); var slo = BigInt(0)
      ordered.zip(xq).foreach { case ((_, ts, v), q) =>
        shi = (shi + (BigInt(q) * n - sum - BigInt(sQ) * n)).max(0)
        slo = (slo + (BigInt(sum) - BigInt(q) * n - BigInt(sQ) * n)).max(0)
        def out(s: BigInt): Double = ((s * 2 + n) / (n * 2)).toDouble / 1e6
        val exp = (out(shi), out(slo), shi > BigInt(hQ) * n || slo > BigInt(hQ) * n)
        // duplicate (ts, value) rows share one recursion state: comparing
        // by the LAST occurrence's expected state is only safe when the
        // pair is unique — random doubles make collisions improbable
        assert(got((k, ts.toString, v)) === exp, s"key=$k ts=$ts v=$v")
      }
    }
  }

  test("cusumSplit == cusum bit-for-bit (bucket-carry law, incl. one-row buckets)") {
    val t0 = java.time.LocalDateTime.parse("2024-01-01T00:00")
    val df = (0L until 300L).map(i =>
      ("k" + i % 5, t0.plusMinutes(i * 17), math.sin(i * 0.61) * 40 + (i % 11)))
      .toDF("key", "ts", "value")
    def dump(f: org.apache.spark.sql.DataFrame) =
      f.orderBy("key", "ts", "value").collect()
        .map(r => (r.getString(0), r.get(1).toString, r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getBoolean(5))).toSeq
    val whole = dump(Stats.cusum(df, Seq("key"), slack = 3, threshold = 15))
    // hour-level buckets: many buckets per series, several one-row
    for (secs <- Seq(3600L, 7200L, 86400L)) {
      val split = dump(Stats.cusumSplit(df, Seq("key"), slack = 3, threshold = 15,
        splitSeconds = secs, adaptiveThreshold = 0L))
      assert(split === whole, s"splitSeconds=$secs diverged")
    }
    // degenerate: every row its own bucket
    assert(dump(Stats.cusumSplit(df, Seq("key"), slack = 3, threshold = 15,
      splitSeconds = 60L, adaptiveThreshold = 0L)) === whole)
    // adaptive default: small keys route through the plain window —
    // still identical output (the routing law)
    assert(dump(Stats.cusumSplit(df, Seq("key"), slack = 3, threshold = 15)) === whole)
  }

  test("counterDelta: plain deltas, reset uses the reading, first row null-delta") {
    val t0 = java.time.LocalDateTime.parse("2024-01-01T00:00")
    val df = Seq(10.0, 12.0, 3.0, 7.0).zipWithIndex
      .map { case (v, i) => ("m", i.toLong, t0.plusHours(i.toLong), v) }
      .toDF("key", "event_id", "ts", "value")
    val got = Stats.counterDelta(df, Seq("key"), orderCol = "event_id")
      .orderBy("event_id").collect()
      .map(r => (Option(r.getAs[java.lang.Double]("delta")).map(_.toDouble), r.getAs[Boolean]("is_reset")))
    assert(got.toSeq === Seq((None, false), (Some(2.0), false), (Some(3.0), true), (Some(4.0), false)))
  }

  test("counterDeltaSplit == counterDelta (carry law, incl. null readings and one-row buckets)") {
    val rnd = new scala.util.Random(777L)
    val t0 = java.time.LocalDateTime.parse("2024-01-01T00:00")
    val df = (0 until 300).map { i =>
      val v: java.lang.Double = if (rnd.nextDouble() < 0.15) null
        else Double.box(rnd.nextInt(1000).toDouble)
      ("m" + i % 4, i.toLong, t0.plusMinutes((i * 13).toLong), v)
    }.toDF("key", "event_id", "ts", "value")
    def dump(f: org.apache.spark.sql.DataFrame) =
      f.orderBy("key", "event_id").collect()
        .map(r => (r.getString(0), r.getLong(1),
          Option(r.getAs[java.lang.Double]("delta")).map(_.toDouble),
          r.getAs[Boolean]("is_reset"))).toSeq
    val whole = dump(Stats.counterDelta(df, Seq("key"), orderCol = "event_id"))
    for (secs <- Seq(3600L, 86400L, 600L)) { // incl. one-row buckets at 600s
      assert(dump(Stats.counterDeltaSplit(df, Seq("key"), orderCol = "event_id",
        splitSeconds = secs, adaptiveThreshold = 0L)) === whole, s"splitSeconds=$secs diverged")
    }
    // adaptive default routes these small keys through the plain form
    assert(dump(Stats.counterDeltaSplit(df, Seq("key"), orderCol = "event_id")) === whole)
  }

  test("ohlc: per-period first/high/low/close; duplicate-ts ties break by value; nulls dropped") {
    val t0 = java.time.LocalDateTime.parse("2024-01-01T00:00")
    val rows = Seq(
      ("k", t0.plusMinutes(10), Some(5.0)), ("k", t0.plusMinutes(20), Some(2.0)),
      ("k", t0.plusMinutes(30), Some(9.0)), ("k", t0.plusMinutes(30), None),
      // second hour: duplicate-ts open tie -> lower value wins the struct sort
      ("k", t0.plusMinutes(70), Some(3.0)), ("k", t0.plusMinutes(70), Some(1.0)),
      ("k", t0.plusMinutes(80), Some(4.0)))
      .map { case (k, ts, v) => (k, ts, v.map(Double.box).orNull) }
      .toDF("key", "ts", "value")
    val got = graft.ts.Resample.ohlc(rows, Seq("key"), "hour")
      .orderBy("period").collect()
      .map(r => (r.getAs[Double]("open"), r.getAs[Double]("high"),
        r.getAs[Double]("low"), r.getAs[Double]("close"), r.getAs[Long]("n")))
    assert(got.toSeq === Seq((5.0, 9.0, 2.0, 9.0, 3L), (1.0, 4.0, 1.0, 4.0, 3L)))
  }
}
