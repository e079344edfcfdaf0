package graft

import graft.ts.Combine
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test for the ordered-coalesce merge: the DataFrame
  * `combineFirst` must agree with a direct driver-side fold of pandas'
  * `combine_first` semantics (first non-null by input order at each ts) —
  * the reference's own tests state expectations via `ts_combine_first`
  * chains (tests/test_chunk_timeserie_store.py:275-281).
  */
class CombineLawsSpec extends SparkSpec {
  import spark.implicits._

  // a series = values at integer hours 0..5, each possibly null
  private val genSeries: Gen[Map[Int, Option[Double]]] = for {
    n    <- Gen.chooseNum(0, 6)
    hrs  <- Gen.pick(n, 0 to 5)
    vals <- Gen.listOfN(n, Gen.oneOf(Gen.const(None), Gen.chooseNum(-5, 5).map(v => Some(v.toDouble))))
  } yield hrs.zip(vals).toMap

  private val genStack: Gen[List[Map[Int, Option[Double]]]] =
    Gen.chooseNum(1, 4).flatMap(k => Gen.listOfN(k, genSeries))

  private def referenceFold(stack: List[Map[Int, Option[Double]]]): Map[Int, Option[Double]] = {
    val allTs = stack.flatMap(_.keys).distinct
    allTs.map { t =>
      // first input (by list order) that HAS t with a non-null value wins;
      // if every input's value at t is null/absent → null
      t -> stack.iterator.flatMap(_.get(t)).collectFirst { case Some(v) => v }
    }.toMap.map { case (k, v) => k -> v }
  }

  test("combineFirst == driver-side pandas-semantics fold (random stacks)") {
    val t0 = java.time.LocalDateTime.parse("2024-01-01T00:00")
    val cases = (0 until 60).flatMap(i => genStack.apply(Gen.Parameters.default, Seed(7L + i)))
    cases.zipWithIndex.foreach { case (stack, ci) =>
      val frames = stack.map { m =>
        val rows = m.toSeq.map { case (h, v) => ("k", t0.plusHours(h.toLong), v) }
        // empty frames need an explicit schema-compatible frame
        if (rows.isEmpty) Seq(("k", t0, Option.empty[Double])).toDF("k", "ts", "value").limit(0)
        else rows.toDF("k", "ts", "value")
      }
      val got = Combine.combineFirst(frames, Seq("k")).collect()
        .map(r => (r.getAs[java.time.LocalDateTime]("ts"), Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
      val want = referenceFold(stack).map { case (h, v) => (t0.plusHours(h.toLong), v) }
      assert(got === want, s"case $ci: stack=$stack")
    }
  }

  // the columnar form must be pointwise identical to the union form it
  // replaces in derived-update pipelines: a null new column means "no
  // update here" (exactly the rows the union form's caller filters out
  // of the new side), and both-null keeps the index entry as null
  test("updateMergeColumns == updateMerge over two projections of one frame (random)") {
    val t0 = java.time.LocalDateTime.parse("2024-01-01T00:00")
    val genWide: Gen[List[(Int, Option[Double], Option[Double])]] =
      Gen.chooseNum(0, 8).flatMap(n => Gen.pick(n, 0 to 7).flatMap { hrs =>
        Gen.listOfN(n, Gen.zip(
          Gen.oneOf(Gen.const(None), Gen.chooseNum(-5, 5).map(v => Some(v.toDouble))),
          Gen.oneOf(Gen.const(None), Gen.chooseNum(-5, 5).map(v => Some(v.toDouble)))))
          .map(vs => hrs.toList.zip(vs).map { case (h, (nv, ov)) => (h, nv, ov) })
      })
    val cases = (0 until 60).flatMap(i => genWide.apply(Gen.Parameters.default, Seed(21L + i)))
    cases.zipWithIndex.foreach { case (rows, ci) =>
      val wide =
        if (rows.isEmpty)
          Seq(("k", t0, Option.empty[Double], Option.empty[Double]))
            .toDF("k", "ts", "nv", "ov").limit(0)
        else rows.map { case (h, nv, ov) => ("k", t0.plusHours(h.toLong), nv, ov) }
          .toDF("k", "ts", "nv", "ov")
      def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[java.time.LocalDateTime]("ts"),
          Option(r.get(r.fieldIndex("value"))).map(_.asInstanceOf[Double]))).toMap
      val got = asMap(Combine.updateMergeColumns(wide, Seq("k"), "nv", "ov"))
      val want = asMap(Combine.updateMerge(
        wide.filter($"nv".isNotNull).select($"k", $"ts", $"nv".as("value")),
        wide.select($"k", $"ts", $"ov".as("value")),
        Seq("k")))
      assert(got === want, s"case $ci: rows=$rows")
    }
  }
}
