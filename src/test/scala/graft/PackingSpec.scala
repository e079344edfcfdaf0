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

  test("random corpora: layout matches the driver-side reference fold") {
    import graft.functions.PortableHash
    def h(id: Long) = PortableHash.const60(s"pack:$id") % PortableHash.P
    def refPack(ds: Seq[(Long, String)], budget: Int, numShards: Int): Map[Long, Seq[Long]] =
      ds.map { case (id, text) => (id, "[A-Za-z0-9]+".r.findAllIn(text).size.toLong) }
        .filter(_._2 > 0)
        .groupBy { case (id, _) => h(id) % numShards }
        .flatMap { case (shard, members) =>
          var off = 0L
          members.sortBy { case (id, _) => (h(id), id) }.map { case (id, n) =>
            val row = id -> Seq(shard, n, off, off / budget, (off + n - 1) / budget)
            off += n
            row
          }
        }.toMap
    val rnd = new scala.util.Random(4242L)
    for (trial <- 0 until 3) {
      val ds = (0L until 50L).map(i =>
        (i, Seq.fill(rnd.nextInt(12))("w" + rnd.nextInt(9)).mkString(" ")))
      val got = Packing.packSequences(ds.toDF("doc_id", "text"), "doc_id", "text",
          budget = 7, numShards = 4)
        .collect().map(r => r.getLong(0) -> (1 to 5).map(r.getLong).toSeq).toMap
      assert(got === refPack(ds, 7, 4), s"trial $trial")
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
