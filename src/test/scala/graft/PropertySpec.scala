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

/** The streaming heavy-hitters monitor's bulk Misra-Gries step claims
  * exact equivalence to unit-at-a-time MG — fuzz it against a literal
  * unit-step reference implementation over random weighted streams.
  */
class MgLawsSpec extends AnyFunSuite {
  import graft.streaming.StreamIngest.mgStep

  /** Textbook unit MG: one arrival of `term` into a ≤ k summary. */
  private def unitStep(c: Map[String, Long], term: String, k: Int): Map[String, Long] =
    if (c.contains(term)) c.updated(term, c(term) + 1L)
    else if (c.size < k) c.updated(term, 1L)
    else c.iterator.map { case (t, n) => t -> (n - 1L) }.filter(_._2 > 0L).toMap

  test("bulk mgStep == w unit steps, fuzzed over random weighted streams") {
    val rnd = new scala.util.Random(7701)
    (0 until 300).foreach { trial =>
      val k = 1 + rnd.nextInt(6)
      val stream = Seq.fill(20)((s"t${rnd.nextInt(10)}", 1L + rnd.nextInt(7)))
      var bulk = Map.empty[String, Long]
      var unit = Map.empty[String, Long]
      stream.foreach { case (t, w) =>
        bulk = mgStep(bulk, t, w, k)
        (0L until w).foreach(_ => unit = unitStep(unit, t, k))
        assert(bulk === unit,
          s"trial $trial diverged after ($t, $w) with k=$k: bulk=$bulk unit=$unit")
      }
    }
  }

  test("mgStep frequency guarantees, fuzzed: lower bound and frequent-item residency") {
    val rnd = new scala.util.Random(515)
    (0 until 100).foreach { trial =>
      val k = 2 + rnd.nextInt(6)
      val stream = Seq.fill(300)(s"t${rnd.nextInt(12)}")
      var c = Map.empty[String, Long]
      stream.foreach(t => c = mgStep(c, t, 1L, k))
      val n = stream.size.toLong
      val exact = stream.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      c.foreach { case (t, est) =>
        assert(est <= exact(t), s"trial $trial: overestimate for $t")
        assert(est >= exact(t) - n / (k + 1), s"trial $trial: bound broken for $t")
      }
      exact.foreach { case (t, f) =>
        if (f > n / (k + 1)) assert(c.contains(t), s"trial $trial: frequent $t evicted")
      }
    }
  }
}
