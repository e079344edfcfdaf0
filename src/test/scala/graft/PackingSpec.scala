package graft

import graft.pipeline.Packing
import org.apache.spark.sql.functions._

/** Sequence packing — the concat-then-split invariants that make the
  * layout valid for a training reader: per-shard offsets are contiguous
  * (no token lost or double-counted), pack ids are exactly the
  * fixed-budget cuts of the stream, straddling is boundary arithmetic,
  * and the whole layout is deterministic across reruns/repartitions.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (0L until 40L).map { i =>
    (i, Seq.fill((i % 7 + 1).toInt)(s"tok$i").mkString(" "))
  }.toDF("doc_id", "text")

  test("per-shard offsets are contiguous and packs are the budget cuts") {
    val out = Packing.packSequences(corpus, "doc_id", "text", budget = 5, numShards = 3)
      .collect()
    val byShard = out.groupBy(_.getLong(1))
    assert(byShard.size > 1, "fixture should spread over multiple shards")
    for ((_, rows) <- byShard) {
      val ordered = rows.sortBy(_.getLong(3))
      var expect = 0L
      for (r <- ordered) {
        assert(r.getLong(3) === expect, s"offset gap at doc ${r.getLong(0)}")
        expect += r.getLong(2)
      }
    }
    for (r <- out) {
      val (n, off, first, last) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(first === off / 5)
      assert(last === (off + n - 1) / 5)
      assert((last > first) === (off % 5 + n > 5), s"straddle flag wrong for doc ${r.getLong(0)}")
    }
  }

  test("deterministic under repartition; empty docs dropped") {
    val base = Packing.packSequences(corpus, "doc_id", "text", budget = 5, numShards = 3)
      .collect().map(_.toSeq).toSet
    val re = Packing.packSequences(corpus.repartition(7), "doc_id", "text", budget = 5, numShards = 3)
      .collect().map(_.toSeq).toSet
    assert(base === re)
    val withEmpty = corpus.union(Seq((99L, "  !!  ")).toDF("doc_id", "text"))
    val packed = Packing.packSequences(withEmpty, "doc_id", "text", budget = 5, numShards = 3)
    assert(packed.filter(col("id") === 99L).isEmpty)
    assert(packed.count() === 40L)
  }
}
