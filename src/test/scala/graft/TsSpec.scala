package graft

import graft.ts._
import org.apache.spark.sql.functions._

/** Unit tests for the ts/ primitives, mirroring the reference's pandas
  * oracles (SURVEY.md §5): combine_first fold laws, islands fixtures,
  * interval algebra cases (hostore/utils/range/tests.py:8-95), grid/DST
  * boundary behavior.
  */
class GridSpec extends SparkSpec {
  test("spine inclusive/exclusive counts") {
    assert(Grid.spine(spark, ldt("2024-01-01T00:00"), ldt("2024-01-02T00:00"), 3600L).count() === 25)
    assert(Grid.spine(spark, ldt("2024-01-01T00:00"), ldt("2024-01-02T00:00"), 3600L, inclusiveRight = false).count() === 24)
    assert(Grid.spine(spark, ldt("2024-01-01T00:00"), ldt("2024-01-01T00:00"), 3600L).count() === 1)
  }

  // NTZ literals must carry the exact wall time regardless of the JVM
  // default timezone (ADVICE r1: java.sql.Timestamp.valueOf-built literals
  // shifted when JVM tz ≠ session tz; LocalDateTime literals cannot).
  test("NTZ literals are JVM-default-tz independent") {
    val saved = java.util.TimeZone.getDefault
    try {
      java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("Asia/Tokyo"))
      val sp = Grid.spine(spark, ldt("2024-01-01T00:00"), ldt("2024-01-01T02:00"), 3600L)
        .collect().map(_.getAs[java.time.LocalDateTime]("ts"))
      assert(sp.head === ldt("2024-01-01T00:00"))
      assert(sp.last === ldt("2024-01-01T02:00"))
      val hit = Grid.spine(spark, ldt("2024-01-01T00:00"), ldt("2024-01-01T05:00"), 3600L)
        .filter(org.apache.spark.sql.functions.col("ts") >=
          org.apache.spark.sql.functions.lit(ldt("2024-01-01T03:00")))
        .count()
      assert(hit === 3)
    } finally java.util.TimeZone.setDefault(saved)
  }

  test("freqSeconds parses pandas-style offsets") {
    assert(Grid.freqSeconds("1h") === 3600L)
    assert(Grid.freqSeconds("15min") === 900L)
    assert(Grid.freqSeconds("D") === 86400L)
    assertThrows[IllegalArgumentException](Grid.freqSeconds("2fortnights"))
  }

  test("monthly chunk index respects store tz across DST") {
    import spark.implicits._
    // 2024-03-31 23:30 UTC is 2024-04-01 01:30 in Europe/Paris (DST):
    // chunk must be April in Paris, March in UTC.
    val df = Seq(java.time.LocalDateTime.parse("2024-03-31T23:30")).toDF("ts")
    val paris = df.select(Grid.chunkIndexMonthly(col("ts"), "Europe/Paris")).head().getInt(0)
    val utc   = df.select(Grid.chunkIndexMonthly(col("ts"), "UTC")).head().getInt(0)
    assert(paris === 2024 * 12 + 4 - 1)
    assert(utc === 2024 * 12 + 3 - 1)
  }

  // VERDICT r16 #6: the fixed DST cases above mirror the reference's
  // fixtures; this property sweeps RANDOM DST-straddling ranges (every
  // spring-forward/fall-back transition of three zones, 2020-2025) at
  // 15min/1h and asserts the two invariants the fixtures spot-check:
  //  - grid length & step are absolute-time exact (engine-UTC spine,
  //    no wall-clock wobble: n = span/freq + 1, diffs = freq)
  //  - chunk indexes round-trip: the in-plan chunkIndexMonthly/Yearly
  //    equals the driver-side ZonedDateTime computation per row, and
  //    chunkRangeMonthly/Yearly are exactly (min, max) of the row set
  test("property: spine + chunk boundaries are DST-correct over random straddling ranges") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import java.time._
    val zones = Seq("Europe/Paris", "America/New_York", "Australia/Sydney")
    val transitions: Map[String, IndexedSeq[Instant]] = zones.map { tz =>
      val rules = ZoneId.of(tz).getRules
      val out = scala.collection.mutable.ArrayBuffer.empty[Instant]
      var t = rules.nextTransition(Instant.parse("2020-01-01T00:00:00Z"))
      while (t != null && t.getInstant.isBefore(Instant.parse("2026-01-01T00:00:00Z"))) {
        out += t.getInstant
        t = rules.nextTransition(t.getInstant.plusSeconds(1))
      }
      tz -> out.toIndexedSeq
    }.toMap
    val gen = for {
      tz <- Gen.oneOf(zones)
      tr <- Gen.oneOf(transitions(tz))
      before <- Gen.chooseNum(1L, 72 * 3600L)
      after <- Gen.chooseNum(1L, 72 * 3600L)
      freq <- Gen.oneOf(900L, 3600L)
    } yield (tz, tr, before, after, freq)
    val samples = (0 until 12).flatMap(i => gen(Gen.Parameters.default, Seed(1717L + i)))
    samples.foreach { case (tz, tr, before, after, freq) =>
      val start = LocalDateTime.ofInstant(tr.minusSeconds(before), ZoneOffset.UTC)
      val end = LocalDateTime.ofInstant(tr.plusSeconds(after), ZoneOffset.UTC)
      val rows = Grid.spine(spark, start, end, freq)
        .select(col("ts"),
          Grid.chunkIndexMonthly(col("ts"), tz).as("cm"),
          Grid.chunkIndexYearly(col("ts"), tz).as("cy"))
        .collect()
      val span = before + after
      assert(rows.length === span / freq + 1, s"grid length for $tz $tr $before $after $freq")
      val ts = rows.map(_.getAs[LocalDateTime]("ts"))
      assert(ts.sliding(2).forall {
        case Array(a, b) => Duration.between(a, b).getSeconds == freq
        case _           => true
      }, s"grid step wobbled across DST for $tz $tr $freq")
      // driver-side twin per row
      val zone = ZoneId.of(tz)
      rows.foreach { r =>
        val z = r.getAs[LocalDateTime]("ts").atZone(ZoneOffset.UTC).withZoneSameInstant(zone)
        assert(r.getAs[Int]("cm") === z.getYear * 12 + z.getMonthValue - 1,
          s"monthly chunk index mismatch at ${r.get(0)} in $tz")
        assert(r.getAs[Int]("cy") === z.getYear, s"yearly chunk index mismatch in $tz")
      }
      // pruning-bounds round-trip: lo is exactly the first grid point's
      // chunk (start IS a grid point — tighter would DROP data); hi must
      // cover every observed chunk, and is exact when end is a grid point
      // (otherwise end may sit in a later chunk than the last grid row)
      val (mLo, mHi) = Grid.chunkRangeMonthly(
        tr.minusSeconds(before).atZone(ZoneOffset.UTC), tr.plusSeconds(after).atZone(ZoneOffset.UTC), tz)
      val (yLo, yHi) = Grid.chunkRangeYearly(
        tr.minusSeconds(before).atZone(ZoneOffset.UTC), tr.plusSeconds(after).atZone(ZoneOffset.UTC), tz)
      val cms = rows.map(_.getAs[Int]("cm")); val cys = rows.map(_.getAs[Int]("cy"))
      assert(mLo === cms.min && yLo === cys.min, s"lo bound drifted for $tz $tr")
      assert(cms.max <= mHi && cys.max <= yHi, s"hi bound drops data for $tz $tr")
      if (span % freq == 0) assert(mHi === cms.max && yHi === cys.max, s"hi bound loose for $tz $tr")
    }
  }

  test("reindex pads missing grid slots with null") {
    import spark.implicits._
    val df = Seq(("a", java.time.LocalDateTime.parse("2024-01-01T01:00"), 1.0))
      .toDF("k", "ts", "value")
    val dense = Grid.reindex(df, Seq("k"), ldt("2024-01-01T00:00"), ldt("2024-01-01T03:00"), 3600L)
    assert(dense.count() === 4)
    assert(dense.filter(col("value").isNull).count() === 3)
  }
}

class CombineSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def series(rows: Seq[(String, String, java.lang.Double)]): DataFrame = {
    import spark.implicits._
    rows.map { case (k, t, v) => (k, java.time.LocalDateTime.parse(t), Option(v).map(_.toDouble)) }
      .toDF("k", "ts", "value")
  }

  test("combine_first: first non-null by list order wins (pandas parity)") {
    val s1 = series(Seq(("a", "2024-01-01T00:00", null), ("a", "2024-01-01T01:00", 1.0)))
    val s2 = series(Seq(("a", "2024-01-01T00:00", 10.0), ("a", "2024-01-01T01:00", 20.0),
      ("a", "2024-01-01T02:00", 30.0)))
    val out = Combine.combineFirst(Seq(s1, s2), Seq("k")).orderBy("ts").collect()
    assert(out.map(r => Option(r.get(2))).toSeq === Seq(Some(10.0), Some(1.0), Some(30.0)))
  }

  test("combine_first folds left over 3+ inputs") {
    val s1 = series(Seq(("a", "2024-01-01T00:00", null)))
    val s2 = series(Seq(("a", "2024-01-01T00:00", null)))
    val s3 = series(Seq(("a", "2024-01-01T00:00", 7.0)))
    val out = Combine.combineFirst(Seq(s1, s2, s3), Seq("k")).collect()
    assert(out.head.getDouble(2) === 7.0)
    // all-null at a ts → null survives
    val allNull = Combine.combineFirst(Seq(s1, s2), Seq("k")).collect()
    assert(allNull.head.isNullAt(2))
  }

  test("combineVersions: highest version wins, lower fills holes") {
    import spark.implicits._
    val df = Seq(
      ("p", 0, "2024-01-01T00:00", Some(1.0)), ("p", 0, "2024-01-01T01:00", Some(2.0)),
      ("p", 1, "2024-01-01T01:00", Some(99.0)), ("p", 1, "2024-01-01T02:00", None: Option[Double]))
      .map { case (k, v, t, x) => (k, v, java.time.LocalDateTime.parse(t), x) }
      .toDF("prm", "version", "ts", "value")
    val out = Combine.combineVersions(df, Seq("prm"), "version").orderBy("ts").collect()
    assert(out.map(r => Option(r.get(2))).toSeq === Seq(Some(1.0), Some(99.0), None))
  }

  test("combineOrdered: rank-join path keeps dense-rank ties and NULL order values") {
    import spark.implicits._
    // two rows share version 1 (a tie must NOT split their priority), and
    // one entry has a NULL version (must still rank — null-safe join)
    val df = Seq(
      ("p", Some(1), "2024-01-01T00:00", Some(10.0)),
      ("p", Some(1), "2024-01-01T01:00", Some(11.0)),
      ("p", Some(2), "2024-01-01T01:00", Some(99.0)),
      ("p", None: Option[Int], "2024-01-01T02:00", Some(7.0)))
      .map { case (k, v, t, x) => (k, v, java.time.LocalDateTime.parse(t), x) }
      .toDF("prm", "version", "ts", "value")
    // asc order, nulls first (Spark default): NULL entry is priority 1 but
    // only contributes where nothing else has data (02:00)
    val out = Combine.combineOrdered(df, Seq("prm"), Seq("version" -> true))
      .orderBy("ts").collect()
    assert(out.map(_.getDouble(2)).toSeq === Seq(10.0, 11.0, 7.0))
    // desc: version 2 wins its ts, version-1 rows fill the rest
    val outD = Combine.combineOrdered(df, Seq("prm"), Seq("version" -> false))
      .orderBy("ts").collect()
    assert(outD.map(_.getDouble(2)).toSeq === Seq(10.0, 99.0, 7.0))
  }

  test("asofJoin backward: nearest preceding incl equal ts, tolerance, no-match null") {
    import spark.implicits._
    val left = Seq(("k", "2024-01-01T00:30"), ("k", "2024-01-01T02:00"),
        ("k", "2024-01-01T09:00"), ("j", "2024-01-01T00:10"))
      .map { case (k, t) => (k, java.time.LocalDateTime.parse(t)) }.toDF("key", "ts")
    val right = Seq(("k", "2024-01-01T00:30", 1.0), ("k", "2024-01-01T01:00", 2.0))
      .map { case (k, t, v) => (k, java.time.LocalDateTime.parse(t), v) }
      .toDF("key", "ts", "v")
    val out = Asof.asofJoin(left, right, Seq("key"), "ts", Seq("v"),
      toleranceSecs = Some(3600L)).orderBy("key", "ts").collect()
    // j@00:10 -> no right rows for key j -> null
    // k@00:30 -> equal-ts right row matches (inclusive)
    // k@02:00 -> 01:00 row within 1h tolerance
    // k@09:00 -> nearest is 01:00 but 8h away -> nulled by tolerance
    assert(out.map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2))).toSeq ===
      Seq(None, Some(1.0), Some(2.0), None))
  }

  test("asofJoin matches a driver-side reference fold on random series (both directions)") {
    import spark.implicits._
    val rnd = new scala.util.Random(1234)
    val base = java.time.LocalDateTime.parse("2024-01-01T00:00")
    def randPts(nKeys: Int, n: Int): Seq[(String, java.time.LocalDateTime, Double)] =
      (0 until n).map { _ =>
        ("k" + rnd.nextInt(nKeys), base.plusMinutes(rnd.nextInt(500).toLong), rnd.nextDouble())
      }
    // right side unique per (key, ts) — the operator's documented contract
    val left = randPts(4, 120)
    val right = randPts(4, 80).groupBy(p => (p._1, p._2)).map(_._2.head).toSeq
    val ldf = left.toDF("key", "ts", "lv")
    val rdf = right.toDF("key", "ts", "v")
    val tol = 3600L
    for (dir <- Seq("backward", "forward")) {
      val got = Asof.asofJoin(ldf, rdf, Seq("key"), "ts", Seq("v"),
          toleranceSecs = Some(tol), direction = dir)
        .collect()
        .map(r => (r.getString(0), r.getAs[java.time.LocalDateTime]("ts"),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))
        .sortBy(t => (t._1, t._2.toString))
      val byKey = right.groupBy(_._1)
      val want = left.map { case (k, ts, _) =>
        val cands = byKey.getOrElse(k, Nil).filter { case (_, rts, _) =>
          if (dir == "backward") !rts.isAfter(ts) && rts.plusSeconds(tol).compareTo(ts) >= 0
          else !rts.isBefore(ts) && !rts.isAfter(ts.plusSeconds(tol))
        }
        val pick =
          if (cands.isEmpty) None
          else if (dir == "backward") Some(cands.maxBy(_._2.toString)._3)
          else Some(cands.minBy(_._2.toString)._3)
        (k, ts, pick)
      }.sortBy(t => (t._1, t._2.toString))
      assert(got.toSeq === want, s"direction=$dir")
    }
  }

  test("asofJoinSplit == asofJoin (boundary-carry law, both directions)") {
    import spark.implicits._
    val rnd = new scala.util.Random(4321)
    val base = java.time.LocalDateTime.parse("2024-01-01T00:00")
    def randPts(nKeys: Int, n: Int): Seq[(String, java.time.LocalDateTime, Double)] =
      (0 until n).map { _ =>
        ("k" + rnd.nextInt(nKeys), base.plusMinutes(rnd.nextInt(2000).toLong), rnd.nextDouble())
      }
    val ldf = randPts(3, 150).toDF("key", "ts", "lv")
    val rdf = randPts(3, 60).groupBy(p => (p._1, p._2)).map(_._2.head).toSeq.toDF("key", "ts", "v")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getAs[java.time.LocalDateTime]("ts"),
        r.getDouble(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .sortBy(t => (t._1, t._2.toString, t._3))
    // 1h buckets over a ~33h span → dozens of buckets, many right-free,
    // so boundary carries do real work; direction × tolerance matrix
    for (dir <- Seq("backward", "forward"); tol <- Seq(None, Some(5400L))) {
      val direct = rows(Asof.asofJoin(ldf, rdf, Seq("key"), "ts", Seq("v"), tol, dir))
      val split = rows(Asof.asofJoinSplit(ldf, rdf, Seq("key"), "ts", Seq("v"), tol, dir,
        splitSeconds = 3600L))
      assert(split === direct, s"direction=$dir tolerance=$tol")
    }
    // degenerate split: everything in one bucket must also agree
    val direct = rows(Asof.asofJoin(ldf, rdf, Seq("key"), "ts", Seq("v"), None, "backward"))
    val one = rows(Asof.asofJoinSplit(ldf, rdf, Seq("key"), "ts", Seq("v"), None, "backward",
      splitSeconds = 365L * 86400L))
    assert(one === direct)
  }

  test("asofJoin forward: nearest following incl equal ts") {
    import spark.implicits._
    val left = Seq(("k", "2024-01-01T00:30"), ("k", "2024-01-01T01:30"))
      .map { case (k, t) => (k, java.time.LocalDateTime.parse(t)) }.toDF("key", "ts")
    val right = Seq(("k", "2024-01-01T00:30", 1.0), ("k", "2024-01-01T02:00", 2.0))
      .map { case (k, t, v) => (k, java.time.LocalDateTime.parse(t), v) }
      .toDF("key", "ts", "v")
    val out = Asof.asofJoin(left, right, Seq("key"), "ts", Seq("v"),
      direction = "forward").orderBy("ts").collect()
    assert(out.map(_.getDouble(2)).toSeq === Seq(1.0, 2.0))
  }

  test("combineOrdered plan: same-direction keys need no window at all; mixed keys rank entries only") {
    import spark.implicits._
    val df = Seq(("p", 1, 2, java.time.LocalDateTime.parse("2024-01-01T00:00"), 1.0))
      .toDF("prm", "version", "rev", "ts", "value")
    // fast path: the fold priority is a min_by/max_by struct — one
    // aggregation, no window, no join anywhere in the plan
    val fast = Combine.combineOrdered(df, Seq("prm"), Seq("version" -> false))
      .queryExecution.optimizedPlan
    assert(fast.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }.isEmpty,
      s"fast path must not window:\n$fast")
    assert(fast.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }.isEmpty,
      s"fast path must not join:\n$fast")
    // mixed-direction keys: the Window must rank entry tuples only — its
    // input carrying ts/value would mean it sorts the raw rows (the
    // hot-series straggler shape)
    val mixed = Combine.combineOrdered(df, Seq("prm"),
        Seq("version" -> false, "rev" -> true))
      .queryExecution.optimizedPlan
    val wins = mixed.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(wins.nonEmpty, s"expected a rank window in plan:\n$mixed")
    wins.foreach { w =>
      val in = w.child.output.map(_.name).toSet
      assert(!in.contains("ts") && !in.contains("value"),
        s"window input must be entry tuples, got $in in plan:\n$mixed")
    }
  }
}

class GapsSpec extends SparkSpec {
  test("constantIslands finds runs incl. null runs (equalp semantics)") {
    import spark.implicits._
    val df = Seq(
      ("a", "2024-01-01T00:00", Some(1.0)), ("a", "2024-01-01T01:00", Some(1.0)),
      ("a", "2024-01-01T02:00", None: Option[Double]), ("a", "2024-01-01T03:00", None: Option[Double]),
      ("a", "2024-01-01T04:00", Some(1.0)))
      .map { case (k, t, v) => (k, java.time.LocalDateTime.parse(t), v) }
      .toDF("k", "ts", "value")
    val runs = Gaps.constantIslands(df, Seq("k")).orderBy("run_start").collect()
    assert(runs.length === 3)
    assert(runs.map(_.getLong(4)).toSeq === Seq(2L, 2L, 1L)) // run_len
  }

  // The run-length carry law: islands computed per (key, bucket) with a
  // one-row boundary carry + offset spine must equal the whole-series
  // window exactly — including runs spanning several buckets, null runs
  // at bucket edges, and the null-value-vs-no-previous-row distinction.
  test("constantIslandsSplit == constantIslands (boundary run-state law)") {
    import spark.implicits._
    val rnd = new scala.util.Random(55L)
    val t0 = java.time.LocalDateTime.parse("2024-01-01T00:00")
    val rows = for (k <- Seq("a", "b"); i <- 0 until 500) yield {
      // long constant stretches (span 1-day buckets), interleaved nulls
      val v: Option[String] =
        if (i % 97 < 9) None
        else Some("s" + (i / 53))
      (k, t0.plusHours(i.toLong), i.toLong, v.orNull)
    }
    val df = rows.toDF("k", "ts", "event_id", "value")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.select("k", "run_start", "run_end", "value", "run_len")
        .orderBy("k", "run_start").collect().map(_.toSeq).toSeq
    val ref = canon(Gaps.constantIslands(df, Seq("k"), "ts", "value", Seq("event_id")))
    // adaptiveThreshold = 0 forces EVERY key through the bucket-carry
    // path — the machinery under test; the default threshold would route
    // this 500-row fixture to the plain window and test nothing
    val split = canon(Gaps.constantIslandsSplit(df, Seq("k"), "ts", "value", Seq("event_id"),
      splitSeconds = 86400L, adaptiveThreshold = 0L))
    assert(split === ref)
    // degenerate: one bucket, and one-row-per-bucket (every run boundary
    // crosses a carry)
    val one = canon(Gaps.constantIslandsSplit(df, Seq("k"), "ts", "value", Seq("event_id"),
      splitSeconds = 365L * 86400L, adaptiveThreshold = 0L))
    assert(one === ref)
    val perRow = canon(Gaps.constantIslandsSplit(df, Seq("k"), "ts", "value", Seq("event_id"),
      splitSeconds = 3600L, adaptiveThreshold = 0L))
    assert(perRow === ref)
    // adaptive MIXED routing: key "a" light (plain path), key "b" heavy
    // (bucket path) under a threshold between their row counts — the
    // union of the two equivalent plans must still be exactly ref
    val extra = (0 until 300).map(i =>
      ("b", t0.plusHours((500 + i).toLong), (500 + i).toLong, "tail"))
    val df2 = df.unionByName(extra.toDF("k", "ts", "event_id", "value"))
    val ref2 = canon(Gaps.constantIslands(df2, Seq("k"), "ts", "value", Seq("event_id")))
    val mixed = canon(Gaps.constantIslandsSplit(df2, Seq("k"), "ts", "value", Seq("event_id"),
      splitSeconds = 86400L, adaptiveThreshold = 600L))
    assert(mixed === ref2)
  }

  test("holes with splitSeconds == holes (same holes through the split islands path)") {
    import spark.implicits._
    val rnd = new scala.util.Random(77L)
    val t0 = java.time.LocalDateTime.parse("2024-01-01T00:00")
    val rows = for (k <- Seq("a", "b"); i <- 0 until 24 * 20 if rnd.nextDouble() > 0.3)
      yield (k, t0.plusHours(i.toLong), 1.0)
    val df = rows.toDF("k", "ts", "value")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("k", "hole_start").collect().map(_.toSeq).toSeq
    val ref = canon(Gaps.holes(df, Seq("k"), ldt("2024-01-01T00:00"), ldt("2024-01-20T00:00"), 3600L))
    val split = canon(Gaps.holes(df, Seq("k"), ldt("2024-01-01T00:00"), ldt("2024-01-20T00:00"), 3600L,
      splitSeconds = Some(86400L)))
    assert(split === ref && ref.nonEmpty)
  }

  test("holes: missing grid slots + absent keys → full range") {
    import spark.implicits._
    val df = Seq(("a", "2024-01-01T00:00", 1.0), ("a", "2024-01-03T00:00", 1.0))
      .map { case (k, t, v) => (k, java.time.LocalDateTime.parse(t), v) }
      .toDF("k", "ts", "value")
    val requested = Seq("a", "b").toDF("k")
    val holes = Gaps.holes(df, Seq("k"), ldt("2024-01-01T00:00"), ldt("2024-01-04T00:00"),
      86400L, requestedKeys = Some(requested)).orderBy("k", "hole_start").collect()
    // a: holes at 01-02 and 01-04; b: whole range
    val aHoles = holes.filter(_.getString(0) == "a")
    val bHoles = holes.filter(_.getString(0) == "b")
    assert(aHoles.length === 2 && bHoles.length === 1)
    assert(bHoles.head.getAs[java.time.LocalDateTime]("hole_start") === ldt("2024-01-01T00:00"))
    assert(bHoles.head.getAs[java.time.LocalDateTime]("hole_end") === ldt("2024-01-04T00:00"))
  }

  test("holes margin widens but clamps to bounds") {
    import spark.implicits._
    val df = Seq(("a", "2024-01-02T00:00", 1.0))
      .map { case (k, t, v) => (k, java.time.LocalDateTime.parse(t), v) }
      .toDF("k", "ts", "value")
    val holes = Gaps.holes(df, Seq("k"), ldt("2024-01-01T00:00"), ldt("2024-01-03T00:00"),
      86400L, marginSecs = 3600L).orderBy("hole_start").collect()
    assert(holes.length === 2)
    assert(holes(0).getAs[java.time.LocalDateTime]("hole_start") === ldt("2024-01-01T00:00")) // clamped
    assert(holes(0).getAs[java.time.LocalDateTime]("hole_end") === ldt("2024-01-01T01:00"))   // widened
  }

  // Reference check_ts_completeness DataFrame input (utils/timeseries.py:54):
  // row-sum with pandas skipna — an existing all-null row sums to 0.0 and
  // is NOT a hole; only slots with no row at all are.
  test("holesMulti: row-summed columns; all-null row is not a hole") {
    import spark.implicits._
    val df = Seq(
      ("a", "2024-01-01T00:00", Some(1.0), Some(2.0)),
      ("a", "2024-01-02T00:00", None, Some(5.0)),             // partial null → present
      ("a", "2024-01-03T00:00", None, Option.empty[Double]))  // ALL null → still present (sum=0.0)
      .map { case (k, t, a, b) => (k, java.time.LocalDateTime.parse(t), a, b) }
      .toDF("k", "ts", "va", "vb")
    // grid 01-01..01-05 daily: only 01-04 and 01-05 have no row → one hole
    val hs = Gaps.holesMulti(df, Seq("k"), Seq("va", "vb"),
      ldt("2024-01-01T00:00"), ldt("2024-01-05T00:00"), 86400L).collect()
    assert(hs.length === 1)
    assert(hs(0).getAs[java.time.LocalDateTime]("hole_start") === ldt("2024-01-04T00:00"))
    assert(hs(0).getAs[java.time.LocalDateTime]("hole_end") === ldt("2024-01-05T00:00"))
  }

  // holes minDelta: boundary gaps below min_delta drop; interior + whole-
  // range keys survive (difference_missing threading, hostore.py:146-147).
  test("holes minDelta prunes short boundary gaps only") {
    import spark.implicits._
    val df = Seq(
      ("a", 1), ("a", 2), ("a", 3), ("a", 6), ("a", 7), ("a", 8), ("a", 9))
      .map { case (k, d) => (k, ldt("2024-01-01T00:00").plusDays(d), 1.0) }
      .toDF("k", "ts", "value")
    val req = Seq("a", "b").toDF("k")
    // daily grid over [0, 10]: a has leading hole d0 (1 slot), interior
    // d4-d5, trailing d10 (1 slot); b is fully missing.
    val hs = Gaps.holes(df, Seq("k"), ldt("2024-01-01T00:00"),
        ldt("2024-01-11T00:00"), 86400L, requestedKeys = Some(req),
        minDeltaSecs = 3 * 86400L) // boundary gap must be >= 3 days
      .collect().map(r => (r.getString(0),
        r.getAs[java.time.LocalDateTime]("hole_start"),
        r.getAs[java.time.LocalDateTime]("hole_end"))).toSet
    // a's 1-slot boundary holes = reference gap of 2 days < 3 → dropped;
    // interior d4-d5 kept; b's whole range kept.
    assert(hs === Set(
      ("a", ldt("2024-01-05T00:00"), ldt("2024-01-06T00:00")),
      ("b", ldt("2024-01-01T00:00"), ldt("2024-01-11T00:00"))))
  }
}

class IntervalsSpec extends SparkSpec {
  import Intervals.Range

  test("rangeJoin: inclusive bounds, multi-bin intervals, negative axis, no cross join") {
    import spark.implicits._
    val pts = Seq(("k", 0L, "p0"), ("k", 10L, "p10"), ("k", 25L, "p25"),
        ("k", -12L, "pm12"), ("j", 10L, "j10"))
      .toDF("key", "pt", "pid")
    val iv = Seq(("k", 0L, 10L, "a"), ("k", 8L, 30L, "b"), ("k", -15L, -11L, "c"))
      .toDF("key", "start", "end", "iid")
    val out = Intervals.rangeJoin(pts, iv, Seq("key"), "pt", binWidth = 7L)
      .select("pid", "iid").collect().map(r => (r.getString(0), r.getString(1))).toSet
    // p0 in a (start-inclusive), p10 in a (end-inclusive) AND b,
    // p25 in b (interval spans several 7-wide bins), pm12 in c (negatives),
    // j10 matches nothing (different key)
    assert(out === Set(("p0", "a"), ("p10", "a"), ("p10", "b"), ("p25", "b"), ("pm12", "c")))
    // plan sanity: binned equi-join, not a nested-loop cartesian
    val plan = Intervals.rangeJoin(pts, iv, Seq("key"), "pt", binWidth = 7L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must not plan a nested loop:\n$plan")
  }

  test("Range algebra: overlap/intersection/includes") {
    assert(Range(0, 10).overlaps(Range(5, 15)))
    assert(!Range(0, 10).overlaps(Range(11, 15)))
    assert(Range(0, 10).intersection(Range(5, 15)) === Some(Range(5, 10)))
    assert(Range(0, 10).intersection(Range(20, 30)) === None)
    assert(Range(0, 10).includes(Range(2, 8)))
    assert(Range(0, 10).contains(10))
  }

  test("Range.combine merges overlapping, keeps disjoint") {
    val merged = Range.combine(Seq(Range(5, 10), Range(0, 6), Range(20, 30), Range(29, 35)))
    assert(merged === Seq(Range(0, 10), Range(20, 35)))
  }

  test("Range.missing returns complement within bounds") {
    val gaps = Range.missing(Seq(Range(2, 4), Range(6, 8)), 0, 10)
    assert(gaps === Seq(Range(0, 2), Range(4, 6), Range(8, 10)))
    assert(Range.missing(Nil, 0, 5) === Seq(Range(0, 5)))
  }

  test("unionIntervals merges in-DataFrame per key") {
    import spark.implicits._
    val df = Seq(("a", 0L, 6L), ("a", 5L, 10L), ("a", 20L, 30L), ("b", 1L, 2L))
      .toDF("k", "start", "end")
    val out = Intervals.unionIntervals(df, Seq("k")).orderBy("k", "merged_start").collect()
    assert(out.length === 3)
    assert(out(0).getLong(1) === 0L && out(0).getLong(2) === 10L && out(0).getLong(3) === 2L)
  }
}

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def df3 = Seq(
    ("a", "2024-01-01T00:00", None: Option[Double]),
    ("a", "2024-01-01T01:00", Some(5.0)),
    ("a", "2024-01-01T02:00", None: Option[Double]),
    ("a", "2024-01-01T03:00", Some(9.0)),
    ("a", "2024-01-01T04:00", None: Option[Double]))
    .map { case (k, t, v) => (k, java.time.LocalDateTime.parse(t), v) }
    .toDF("k", "ts", "value")

  test("trimBounds drops leading/trailing nulls, keeps interior") {
    val out = Resample.trimBounds(df3, Seq("k")).orderBy("ts").collect()
    assert(out.length === 3)
    assert(out(1).isNullAt(2))
  }

  test("sliceWithDelay cuts from each key's own start") {
    val out = Resample.sliceWithDelay(df3, Seq("k"), 2 * 3600L).orderBy("ts").collect()
    assert(out.length === 3) // 02:00, 03:00, 04:00
  }

  test("normalize: minmax per key; constant → null") {
    val out = Resample.normalize(df3, Seq("k")).orderBy("ts").collect()
    assert(out(1).getDouble(3) === 0.0 && out(3).getDouble(3) === 1.0)
    val const = Seq(("a", java.time.LocalDateTime.parse("2024-01-01T00:00"), 5.0)).toDF("k", "ts", "value")
    assert(Resample.normalize(const, Seq("k")).collect().head.isNullAt(3))
  }

  test("ffill carries last non-null forward") {
    val out = Resample.ffill(df3, Seq("k")).orderBy("ts").collect()
    assert(out.map(r => Option(r.get(3))).toSeq === Seq(None, Some(5.0), Some(5.0), Some(9.0), Some(9.0)))
  }

  test("ffillSplit == ffill (bucket-carry law, incl. all-null buckets)") {
    val rnd = new scala.util.Random(88L)
    val t0 = java.time.LocalDateTime.parse("2024-01-01T00:00")
    // hourly points over 10 days, ~40% nulls, day-long null runs so some
    // 1-day buckets are entirely null and need the cross-bucket carry
    val rows = for (k <- Seq("a", "b"); i <- 0 until 240) yield {
      val v = if (i % 48 >= 24 || rnd.nextDouble() < 0.4) None else Some(rnd.nextDouble() * 10)
      (k, t0.plusHours(i.toLong), v)
    }
    val df = rows.map { case (k, t, v) => (k, t, v.map(Double.box).orNull) }
      .toDF("k", "ts", "value")
    def vals(d: org.apache.spark.sql.DataFrame) = d.orderBy("k", "ts").collect()
      .map(r => Option(r.get(3)).map(_.asInstanceOf[Double]))
    val direct = vals(Resample.ffill(df, Seq("k")))
    val split  = vals(Resample.ffillSplit(df, Seq("k"), splitSeconds = 86400L))
    assert(split.toSeq === direct.toSeq)
    // degenerate: single bucket
    val one = vals(Resample.ffillSplit(df, Seq("k"), splitSeconds = 365L * 86400L))
    assert(one.toSeq === direct.toSeq)
  }

  test("interpolateSplit == interpolate (two-sided bucket-carry law)") {
    val rnd = new scala.util.Random(91L)
    val t0 = java.time.LocalDateTime.parse("2024-01-01T00:00")
    // hourly points over 10 days with leading/trailing null stretches,
    // day-long null runs (all-null buckets needing BOTH carries), and
    // irregular interior nulls — the time-weighted lerp must be
    // bit-identical to the whole-series-window form
    val rows = for (k <- Seq("a", "b"); i <- 0 until 240) yield {
      val v =
        if (i < 5 || i >= 235) None                       // no extrapolation zones
        else if (i % 72 >= 40 && i % 72 < 70) None        // >day-long holes
        else if (rnd.nextDouble() < 0.3) None
        else Some(rnd.nextDouble() * 10)
      (k, t0.plusHours(i.toLong), v)
    }
    val df = rows.map { case (k, t, v) => (k, t, v.map(Double.box).orNull) }
      .toDF("k", "ts", "value")
    def vals(d: org.apache.spark.sql.DataFrame) = d.orderBy("k", "ts").collect()
      .map(r => Option(r.get(3)).map(_.asInstanceOf[Double]))
    val direct = vals(Resample.interpolate(df, Seq("k")))
    val split  = vals(Resample.interpolateSplit(df, Seq("k"), splitSeconds = 86400L))
    assert(split.toSeq === direct.toSeq)
    // degenerate: single bucket, and one-row-per-bucket (every carry path
    // crosses a boundary)
    val one = vals(Resample.interpolateSplit(df, Seq("k"), splitSeconds = 365L * 86400L))
    assert(one.toSeq === direct.toSeq)
    val perRow = vals(Resample.interpolateSplit(df, Seq("k"), splitSeconds = 3600L))
    assert(perRow.toSeq === direct.toSeq)
  }

  test("minFreq: exact min step in µs") {
    val out = Resample.minFreq(df3, Seq("k")).collect()
    assert(out.head.getLong(1) === 3600L * 1000000L)
  }

  test("splitTs: strict-before / at-after halves, optional bounds") {
    val (before, after) = Resample.splitTs(df3,
      at = org.apache.spark.sql.functions.lit(java.sql.Timestamp.valueOf("2024-01-01 02:00:00")).cast("timestamp_ntz"))
    assert(before.count() === 2 && after.count() === 3)
    val (b2, a2) = Resample.splitTs(df3,
      at = org.apache.spark.sql.functions.lit(java.sql.Timestamp.valueOf("2024-01-01 02:00:00")).cast("timestamp_ntz"),
      lo = Some(org.apache.spark.sql.functions.lit(java.sql.Timestamp.valueOf("2024-01-01 01:00:00")).cast("timestamp_ntz")))
    assert(b2.count() === 1 && a2.count() === 3)
  }

  test("upsampleWithProfile: ratio to period mean; zero-mean → flat copy (addLast=false)") {
    val df = Seq(
      ("a", "d1", 1, 10.0, 1.0), ("a", "d1", 2, 10.0, 3.0),
      ("a", "d2", 3, 8.0, 0.0), ("a", "d2", 4, 8.0, 0.0))
      .toDF("k", "day", "hour", "feat", "ref")
      .withColumn("ts", expr("timestamp_ntz '2024-01-01 00:00:00' + make_dt_interval(0, hour)"))
    val out = Resample.upsampleWithProfile(df, Seq("k"), "day", "feat", "ref", addLast = false)
      .orderBy("ts").collect()
    // d1: mean=2 → 10*1/2=5, 10*3/2=15 ; d2: mean=0 → flat 8
    assert(out.map(_.getAs[Double]("value")).toSeq === Seq(5.0, 15.0, 8.0, 8.0))
  }

  // Reference add_last (utils/timeseries.py:180,190-206): each period's
  // ref-mean also includes the NEXT period's first fine point; the appended
  // point's own output still comes from its home period (later ds_out
  // assignment wins). Hand-computed across the d1/d2 boundary:
  //   d1 refs (1, 3) + d2's first ref 2 → mean = 6/3 = 2
  //   d2 refs (2, 6) + nothing (last)  → mean = 8/2 = 4
  test("upsampleWithProfile addLast: next period's first point joins the mean") {
    val df = Seq(
      ("a", "d1", 1, 10.0, 1.0), ("a", "d1", 2, 10.0, 3.0),
      ("a", "d2", 3, 8.0, 2.0), ("a", "d2", 4, 8.0, 6.0))
      .toDF("k", "day", "hour", "feat", "ref")
      .withColumn("ts", expr("timestamp_ntz '2024-01-01 00:00:00' + make_dt_interval(0, hour)"))
    val out = Resample.upsampleWithProfile(df, Seq("k"), "day", "feat", "ref")
      .orderBy("ts").collect()
    // d1: 10*1/2=5, 10*3/2=15 ; d2: 8*2/4=4, 8*6/4=12
    assert(out.map(_.getAs[Double]("value")).toSeq === Seq(5.0, 15.0, 4.0, 12.0))
  }
}
