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
}
