package graft.sync

import org.scalatest.funsuite.AnyFunSuite

/** Wire-timestamp tolerance (ADVICE r15): a reference-side server or a
  * tolerant client can emit any of the common ISO offset spellings, and
  * pandas/DRF isoformat OMITS the fraction when microseconds are zero.
  * All of them must land on the same NTZ-in-UTC wall time.
  */
class ParseTsSpec extends AnyFunSuite {

  private val want = java.time.LocalDateTime.parse("2024-06-01T12:30:15.123456")

  test("parseTs accepts naive, Z, +00:00, +00, +0000 spellings identically") {
    for (s <- Seq(
        "2024-06-01T12:30:15.123456",
        "2024-06-01T12:30:15.123456Z",
        "2024-06-01T12:30:15.123456+00:00",
        "2024-06-01T12:30:15.123456+00",
        "2024-06-01T12:30:15.123456+0000"))
      assert(SyncHttp.parseTs(s) === want, s)
  }

  test("parseTs converts genuine non-UTC offsets to UTC wall time") {
    assert(SyncHttp.parseTs("2024-06-01T14:30:15.123456+02:00") === want)
    assert(SyncHttp.parseTs("2024-06-01T07:00:15.123456-05:30") === want)
  }

  test("parseTs accepts fraction-less timestamps (DRF isoformat at zero micros)") {
    val midnight = java.time.LocalDateTime.parse("2024-06-01T00:00")
    assert(SyncHttp.parseTs("2024-06-01T00:00:00") === midnight)
    assert(SyncHttp.parseTs("2024-06-01T00:00:00Z") === midnight)
    assert(SyncHttp.parseTs("2024-06-01T00:00:00+00:00") === midnight)
    // millisecond-precision fraction (isoformat emits 3 digits)
    assert(SyncHttp.parseTs("2024-06-01T00:00:00.500Z") ===
      java.time.LocalDateTime.parse("2024-06-01T00:00:00.500"))
  }

  test("parseTs rejects garbage with a parse error, not a silent null") {
    intercept[java.time.format.DateTimeParseException] {
      SyncHttp.parseTs("not-a-timestamp")
    }
  }

  test("parseTs rejects offsets outside ZoneOffset's domain (ADVICE r17)") {
    for (s <- Seq(
        "2024-06-01T12:30:15.123456+25:00", // hour past ±18
        "2024-06-01T12:30:15.123456+9900", // colon-less, hour 99
        "2024-06-01T12:30:15.123456-19:00",
        "2024-06-01T12:30:15.123456+05:71")) // minute field > 59
      intercept[java.time.DateTimeException] { SyncHttp.parseTs(s) }
  }
}

/** The in-plan twin of parseTs ([[Sync.wireTs]]) must agree with it on
  * every spelling — ADVICE r16: the old rpad-based normalizer silently
  * truncated the offset off '...123456+02:00', storing a wall time 2h
  * off. Now offsets are converted to UTC by interval arithmetic.
  */
class WireTsSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions.col

  private def parse(ss: Seq[String]): Seq[java.time.LocalDateTime] = {
    import spark.implicits._
    ss.toDF("s").select(Sync.wireTs(col("s")).as("t"))
      .collect().toSeq.map(r => r.getAs[java.time.LocalDateTime]("t"))
  }

  test("wireTs agrees with parseTs on every tolerated spelling") {
    val spellings = Seq(
      "2024-06-01T12:30:15.123456",
      "2024-06-01T12:30:15.123456Z",
      "2024-06-01T12:30:15.123456+00:00",
      "2024-06-01T12:30:15.123456+00",
      "2024-06-01T12:30:15.123456+0000",
      "2024-06-01T14:30:15.123456+02:00", // the ADVICE r16 case
      "2024-06-01T14:30:15.123456+0200",
      "2024-06-01T07:00:15.123456-05:30",
      "2024-06-01T00:00:00",
      "2024-06-01T00:00:00Z",
      "2024-06-01T00:00:00+00:00",
      "2024-06-01T00:00:00.500Z",
      "2024-06-01T02:00:00+02",          // fraction-less with real offset
      "2024-06-01T00:00:00.5+00:00",     // short fraction + offset
      "2024-06-01T18:00:36+05:30:21")    // seconds-bearing offset (ISO-legal)
    assert(parse(spellings) === spellings.map(SyncHttp.parseTs))
  }

  test("wireTs nulls garbage and unrecognized tails (detectable), never silently shifts") {
    assert(parse(Seq(
      "not-a-timestamp",
      "2024-06-01",
      "2024-06-01T12:30:15.5junk",    // tail the extractor can't consume
      "2024-06-01T12:30:15+0530:21",  // colon-less minutes + colon seconds
      "2024-06-01 12:30:15"           // space separator (neither parser takes it)
    )) === Seq(null, null, null, null, null))
  }

  // ADVICE r17: the shape regex only constrains digit COUNT, so a bogus
  // two-digit offset hour ('+25:00') used to pass the shape check and
  // silently shift the stored value — the failure class the scaladoc
  // excludes. parseTs (ZoneOffset, max ±18:00) throws on the same inputs;
  // both twins must reject.
  test("wireTs nulls offsets outside ZoneOffset's domain, matching parseTs's rejection") {
    val bogus = Seq(
      "2024-06-01T12:30:15.123456+25:00",
      "2024-06-01T12:30:15.123456+9900",
      "2024-06-01T12:30:15.123456-19:00",
      "2024-06-01T12:30:15.123456+05:71",
      "2024-06-01T12:30:15.123456+18:00:01") // one second past the max
    assert(parse(bogus) === Seq(null, null, null, null, null))
    bogus.foreach(s =>
      intercept[java.time.DateTimeException] { SyncHttp.parseTs(s) })
    // the boundary itself is VALID both sides: ±18:00 exactly
    assert(parse(Seq("2024-06-02T06:30:15.123456+18:00")) ===
      Seq(SyncHttp.parseTs("2024-06-02T06:30:15.123456+18:00")))
  }
}
