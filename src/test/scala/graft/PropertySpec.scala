package graft

import graft.ts.Intervals.Range
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY.md §5: the reference's fixed-seed randomness,
  * upgraded to laws). Plain ScalaCheck generators driven from a fixed
  * seed (no scalatestplus bridge in the offline dep set). Driver-side
  * pure functions only — the DataFrame equivalents are pinned by the
  * DuckDB oracle instead.
  */
class IntervalLawsSpec extends AnyFunSuite {

  private val genRange: Gen[Range] = for {
    s <- Gen.chooseNum(0L, 1000L)
    w <- Gen.chooseNum(0L, 100L)
  } yield Range(s, s + w)

  private val genRanges: Gen[List[Range]] = Gen.listOfN(12, genRange)

  private def samples[T](g: Gen[T], n: Int = 200): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("combine: output is sorted, disjoint, and covers exactly the union") {
    samples(genRanges).foreach { rs =>
      val merged = Range.combine(rs)
      assert(merged.sliding(2).forall {
        case Seq(a, b) => a.end < b.start
        case _         => true
      }, s"not disjoint/sorted for $rs")
      val points = rs.flatMap(r => Seq(r.start, r.end, (r.start + r.end) / 2))
      assert(points.forall(p => rs.exists(_.contains(p)) == merged.exists(_.contains(p))),
        s"coverage differs for $rs")
    }
  }

  test("combine is idempotent") {
    samples(genRanges).foreach { rs =>
      val once = Range.combine(rs)
      assert(Range.combine(once) === once)
    }
  }

  test("missing: gaps are uncovered and fill the range") {
    samples(genRanges).foreach { rs =>
      val lo = 0L; val hi = 1200L
      val gaps = Range.missing(rs, lo, hi)
      // interior of every gap is uncovered by inputs
      assert(gaps.forall(g => !rs.exists(r =>
        r.intersection(g).exists(i => i.end - i.start > 0))), s"gap overlaps input for $rs")
      // gaps + inputs cover every probe point in [lo, hi)
      val all = rs ++ gaps
      assert((lo until hi by 7L).forall(p => all.exists(_.contains(p))), s"hole left for $rs")
    }
  }

  test("intersection symmetry, containment, overlap consistency") {
    samples(Gen.zip(genRange, genRange)).foreach { case (a, b) =>
      assert(a.intersection(b) === b.intersection(a))
      a.intersection(b).foreach(i => assert(a.includes(i) && b.includes(i)))
      assert(a.overlaps(b) === a.intersection(b).isDefined)
    }
  }
}
