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

  test("curate: random corpora match the driver-side gate+dedup+sample+pack fold") {
    import graft.functions.PortableHash
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def score(id: Long, salt: String): Double =
      (PortableHash.const60(s"$salt:$id") % PortableHash.P).toDouble / PortableHash.P
    def hp(id: Long) = PortableHash.const60(s"curate-pack:$id") % PortableHash.P
    val rnd = new scala.util.Random(8080L)
    for (trial <- 0 until 3) {
      val ds = (0L until 60L).map { i =>
        val lang = if (rnd.nextBoolean()) "en" else "fr"
        // small vocab so exact dups occur across ids
        (i, Seq.fill(rnd.nextInt(10))("w" + rnd.nextInt(3)).mkString(" "), lang)
      }
      // reference fold
      val gated = ds.map { case (id, t, l) =>
        (id, t, l, "[A-Za-z0-9]+".r.findAllIn(t).size.toLong) }.filter(_._4 >= 2)
      val deduped = gated.groupBy(d => md5hex(d._2)).values.map(_.minBy(_._1)).toSeq
      val sampled = deduped.filter { case (id, _, l, _) =>
        score(id, "curate") < (if (l == "en") 0.7 else 0.3) }
      val expected = sampled.groupBy { case (id, _, _, _) => hp(id) % 3 }
        .flatMap { case (shard, members) =>
          var off = 0L
          members.sortBy { case (id, _, _, _) => (hp(id), id) }.map { case (id, _, l, n) =>
            val row = id -> Seq(l, n.toString, shard.toString, off.toString,
              (off / 6).toString, ((off + n - 1) / 6).toString)
            off += n
            row
          }
        }
      val got = graft.pipeline.Curation.curate(ds.toDF("doc_id", "text", "lang"),
          "doc_id", "text", "lang", minTokens = 2,
          fractions = Map("en" -> 0.7), defaultFraction = 0.3,
          budget = 6, numShards = 3)
        .collect().map(r => r.getLong(0) -> Seq(r.getString(1), r.getLong(2).toString,
          r.getLong(3).toString, r.getLong(4).toString,
          r.getLong(5).toString, r.getLong(6).toString)).toMap
      assert(got === expected.toMap, s"trial $trial")
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

  test("writePacked: one file per shard, rows in pack order, receipt totals match") {
    val outDir = tmpDir("packed_out")
    val packed = Packing.packSequences(corpus, "doc_id", "text", budget = 5, numShards = 3)
    val receipt = Packing.writePacked(packed, corpus, "doc_id", "text", outDir).collect()
    assert(receipt.map(_.getAs[Long]("n_docs")).sum === 40L)
    val back = spark.read.parquet(outDir)
    assert(back.count() === 40L)
    // trainer contract: a sequential read of each shard's file is the
    // concatenated stream — within every parquet file, start_off ascends
    val files = back
      .select(input_file_name().as("f"), col("shard").cast("long").as("shard"), col("start_off"))
      .collect()
    assert(files.map(_.getString(0)).distinct.length === 3, "one file per shard")
    files.groupBy(_.getString(0)).foreach { case (f, rows) =>
      assert(rows.map(_.getLong(1)).distinct.length === 1, s"$f mixes shards")
    }
    // read-back per shard sorted equals the manifest's offsets
    val manifest = packed.select(col("shard").cast("long"), col("start_off")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(files.map(r => (r.getLong(1), r.getLong(2))).sorted.toSeq === manifest.toSeq)
    // bodies present
    assert(back.filter(col("text").isNull).isEmpty)
  }
}
