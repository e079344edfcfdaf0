package graft

import org.apache.spark.sql.functions._
import graft.functions.{PortableHash, ShingleOps}
import graft.pipeline.{Dedup, TextAnalysis}

/** Bit-equivalence of the native one-pass shingle/token expressions
  * (graft.functions.ShingleOps) against the composed built-in chains
  * they replaced — the chains ARE the DuckDB oracle semantics, so this
  * suite is what keeps every shingle-family oracle twin valid after the
  * round-13 native rewrite. Inputs deliberately cover the nasty cases:
  * multi-byte UTF-8 (CJK, emoji, combining marks), Turkish İ (lowers to
  * ASCII 'i' + combining dot — an alnum byte BORN from case mapping),
  * repeated shingles (dedup), short docs (< n tokens), empty and
  * punctuation-only strings, and within-doc repeats at every position.
  */
class ShingleOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs: Seq[String] = {
    val rnd = new scala.util.Random(20260814L)
    val alphabets = Array(
      "abcdefgh", "ABCDEFGH", "0123456789", " \t\n.,;!?-_()[]'\"",
      "äöüßéàç", "日本語中文한국", "İıŞğ", "🌍🚀é́")
    val rand = (0 until 400).map { _ =>
      val len = rnd.nextInt(120)
      (0 until len).map { _ =>
        val a = alphabets(rnd.nextInt(alphabets.length))
        a.charAt(rnd.nextInt(a.length))
      }.mkString
    }
    val fixed = Seq(
      "", " ", "...", "a", "a b", "a b c", "a b c d e",
      "the cat sat the cat sat the cat sat", // heavy repeats
      "AB ab Ab aB",                          // case-folds to dups
      "word1 word2 word1 word2 word1",
      "İstanbul ISTANBUL istanbul",           // Turkish dotted capital
      "tab\tsep\nnewline  double space",
      "ünïcödé wörds ünïcödé wörds",
      "x" * 500,                              // one long token
      ("tok " * 300).trim)                    // many tokens
    rand ++ fixed
  }

  private def df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    .toDF("id", "text")

  /** The PRE-native shingle chain, built on regexTokens — a reference
    * fully independent of ShingleOps (Dedup.shingles itself now runs the
    * native tokenizer, so the spec rebuilds the original formulation).
    */
  private def regexShingles(text: org.apache.spark.sql.Column, n: Int) =
    flatten(transform(array(TextAnalysis.regexTokens(lower(text))), ws =>
      when(size(ws) >= n,
        array_distinct(
          transform(
            sequence(lit(1), size(ws) - (n - 1)),
            i => concat_ws(" ", slice(ws, i, lit(n))))))
        .otherwise(array().cast("array<string>"))))

  test("native tokens equal regexp_extract_all on raw and lowered text") {
    val got = df.select(col("id"), TextAnalysis.tokens(col("text")).as("a"),
      TextAnalysis.tokens(lower(col("text"))).as("b")).orderBy("id").collect()
    val want = df.select(col("id"), TextAnalysis.regexTokens(col("text")).as("a"),
      TextAnalysis.regexTokens(lower(col("text"))).as("b")).orderBy("id").collect()
    got.zip(want).foreach { case (g, w) =>
      assert(g.getSeq[String](1) === w.getSeq[String](1), s"raw id=${g.getLong(0)}")
      assert(g.getSeq[String](2) === w.getSeq[String](2), s"lowered id=${g.getLong(0)}")
    }
  }

  test("shingleHash60s equals transform(shingles, hashMod) in order, n=2,3,5") {
    for (n <- Seq(2, 3, 5)) {
      val got = df.select(col("id"),
        transform(ShingleOps.shingleHash60s(lower(col("text")), n),
          h => pmod(h, lit(PortableHash.P))).as("a")).orderBy("id").collect()
      val want = df.select(col("id"),
        transform(regexShingles(col("text"), n),
          s => PortableHash.hashMod(s)).as("a")).orderBy("id").collect()
      got.zip(want).foreach { case (g, w) =>
        assert(g.getSeq[Long](1) === w.getSeq[Long](1), s"n=$n id=${g.getLong(0)}")
      }
    }
  }

  test("shingleHashModSet equals the distinct mod-P value set, first occurrence") {
    for (n <- Seq(2, 3)) {
      val got = df.select(col("id"),
        ShingleOps.shingleHashModSet(lower(col("text")), n).as("a")).orderBy("id").collect()
      val want = df.select(col("id"),
        transform(regexShingles(col("text"), n),
          s => PortableHash.hashMod(s)).as("a")).orderBy("id").collect()
      got.zip(want).foreach { case (g, w) =>
        // value-dedup of the mod-P stream, first occurrence kept
        val expect = w.getSeq[Long](1).distinct
        assert(g.getSeq[Long](1) === expect, s"n=$n id=${g.getLong(0)}")
      }
    }
  }

  test("minhashSig equals the explode+groupBy aggregated form, bit for bit") {
    val n = 3; val numHashes = 32
    val native = Dedup.minhashSignature(df, "id", "text", n, numHashes)
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1))
    // the pre-round-13 aggregated formulation, verbatim
    val ex = df.select(col("id"), explode(regexShingles(col("text"), n)).as("s"))
      .select(col("id"), PortableHash.hashMod(col("s")).as("__b"))
    val consts = PortableHash.permConsts(numHashes)
    val mins = consts.zipWithIndex.map { case ((a, b), i) =>
      min(PortableHash.perm(col("__b"), a, b)).as(s"h$i") }
    val agg = ex.groupBy(col("id")).agg(mins.head, mins.tail: _*)
      .select(col("id"), array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1))
    assert(native.length === agg.length) // same docs survive (>= n tokens)
    native.zip(agg).foreach { case ((gi, gs), (wi, ws)) =>
      assert(gi === wi); assert(gs === ws, s"id=$gi")
    }
  }

  test("tokenBuckets equals the transform/zip_with feature chain in order") {
    for (nb <- Seq(64, 4096)) {
      val got = df.select(col("id"),
        ShingleOps.tokenBucketsCol(lower(col("text")), nb).as("a")).orderBy("id").collect()
      val hs0 = transform(TextAnalysis.regexTokens(lower(col("text"))),
        t => PortableHash.hashMod(t))
      val feats = flatten(transform(array(hs0), hs =>
        concat(hs,
          when(size(hs) >= 2,
            zip_with(slice(hs, lit(1), size(hs) - 1), slice(hs, lit(2), size(hs) - 1),
              (a, c) => pmod(a * lit(31L) + c, lit(PortableHash.P))))
            .otherwise(array().cast("array<long>")))))
      val want = df.select(col("id"),
        transform(feats, h => pmod(h, lit(nb.toLong))).as("a")).orderBy("id").collect()
      got.zip(want).foreach { case (g, w) =>
        assert(g.getSeq[Long](1) === w.getSeq[Long](1), s"nb=$nb id=${g.getLong(0)}")
      }
    }
  }

  test("windowHashMods equals the positional hashMod(concat_ws(slice)) chain") {
    for (w <- Seq(1, 3, 5)) {
      val got = df.select(col("id"),
        ShingleOps.windowHashModsCol(lower(col("text")), w).as("a")).orderBy("id").collect()
      val want = df.select(col("id"),
        flatten(transform(array(TextAnalysis.regexTokens(lower(col("text")))), ws =>
          when(size(ws) >= w,
            transform(sequence(lit(1), size(ws) - (w - 1)),
              i => PortableHash.hashMod(concat_ws(" ", slice(ws, i, lit(w))))))
            .otherwise(array().cast("array<long>")))).as("a")).orderBy("id").collect()
      got.zip(want).foreach { case (g, ww) =>
        assert(g.getSeq[Long](1) === ww.getSeq[Long](1), s"w=$w id=${g.getLong(0)}")
      }
    }
  }

  test("tokenBucketLamSum equals explode(tokenBuckets) + λ lookup + sum, bit for bit") {
    for (nb <- Seq(64, 4096)) {
      // a deterministic λ table with negative, positive, and zero entries
      val lam = Array.tabulate(nb)(b => (b * 2654435761L % 2000001L) - 1000000L)
      val got = df.select(col("id"),
        ShingleOps.tokenBucketLamSumCol(lower(col("text")), nb, lam).as("r"))
        .orderBy("id").collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1)))
      // the pre-round-14 shape: per-occurrence buckets exploded, λ joined,
      // integer micro-units summed per doc — rebuilt on the PINNED
      // tokenBuckets expression (itself chain-pinned above)
      val lamMap = map(lam.zipWithIndex.flatMap { case (v, b) =>
        Seq(lit(b.toLong), lit(v)) }: _*)
      val want = df.select(col("id"),
        ShingleOps.tokenBucketsCol(lower(col("text")), nb).as("bs"))
        .select(col("id"), explode_outer(col("bs")).as("b"))
        .groupBy("id").agg(
          sum(when(col("b").isNotNull, 1L).otherwise(0L)).as("n"),
          coalesce(sum(element_at(lamMap, col("b"))), lit(0L)).as("s"))
        .orderBy("id").collect()
        .map(r => (r.getLong(0), Seq(r.getLong(1), r.getLong(2))))
      assert(got.length === want.length)
      got.zip(want).foreach { case ((gi, gr), (wi, wr)) =>
        assert(gi === wi)
        assert(gr === wr, s"nb=$nb id=$gi")
      }
    }
  }

  test("minhashSigFromMods over the set stage equals the fused text signature, bit for bit") {
    val n = 3; val numHashes = 32
    // round-15 derived form: sig = arithmetic over the mod-P hash set
    val derived = df.select(col("id"),
        ShingleOps.minhashSigFromModsCol(
          ShingleOps.shingleHashModSet(lower(col("text")), n), numHashes).as("sig"))
      .filter(size(col("sig")) > 0)
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1))
    val direct = Dedup.minhashSignature(df, "id", "text", n, numHashes)
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1))
    assert(derived.length === direct.length)
    derived.zip(direct).foreach { case ((gi, gs), (wi, ws)) =>
      assert(gi === wi); assert(gs === ws, s"id=$gi")
    }
  }

  test("explode(tokenTf) equals explode(tokens) + groupBy(id, term) count as a row set") {
    val got = df.select(col("id"),
        explode(ShingleOps.tokenTfCol(lower(col("text")))).as(Seq("term", "tf")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    val want = df.select(col("id"),
        explode(TextAnalysis.regexTokens(lower(col("text")))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w) => assert(g === w) }
  }

  test("explode(winnowFps) equals the exploded window/sort winnow pipeline as a row set") {
    import org.apache.spark.sql.expressions.Window
    for ((w, k) <- Seq((5, 4), (1, 1), (3, 8), (2, 2))) {
      val got = df.select(col("id"),
          explode(ShingleOps.winnowFpsCol(lower(col("text")), w, k)).as("__wmin"))
        .select(col("id"), (col("__wmin") % (1L << 32)).as("pos"),
          expr(s"__wmin div ${1L << 32}").as("fp"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      // the pre-round-16 DataFrame form: posexplode the PINNED window
      // hashes, pack keys, frame-bounded window min, tail filter, distinct
      val wins = df
        .select(col("id"),
          posexplode(ShingleOps.windowHashModsCol(lower(col("text")), w)).as(Seq("__p0", "__h")))
        .select(col("id"), (col("__p0") + 1).cast("long").as("pos"), col("__h"))
        .withColumn("__key", col("__h") * (1L << 32) + col("pos"))
      val ord = Window.partitionBy(col("id")).orderBy(col("pos"))
      val want = wins
        .withColumn("__n", count(lit(1)).over(ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .withColumn("__wmin", min(col("__key")).over(ord.rowsBetween(0, k - 1)))
        .filter(col("pos") <= greatest(lit(1L), col("__n") - (k - 1)))
        .select(col("id"), (col("__wmin") % (1L << 32)).as("pos"),
          expr(s"__wmin div ${1L << 32}").as("fp"))
        .distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      assert(got.toSeq === want.toSeq, s"w=$w k=$k")
    }
  }

  test("explode(bigramTf) equals the zip_with bigram explode + groupBy count as a row set") {
    val got = df.select(col("id"),
        explode(ShingleOps.bigramTfCol(lower(col("text")))).as("__b"))
      .select(col("id"), col("__b.prev"), col("__b.cur"), col("__b.tf"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).sorted
    val toks = TextAnalysis.regexTokens(lower(col("text")))
    val bigrams = flatten(transform(array(toks), ws =>
      when(size(ws) >= 2,
        zip_with(slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
          (a, b) => struct(a.as("prev"), b.as("cur"))))
        .otherwise(array().cast("array<struct<prev:string,cur:string>>"))))
    val want = df.select(col("id"), explode(bigrams).as("__b"))
      .groupBy(col("id"), col("__b.prev").as("prev"), col("__b.cur").as("cur"))
      .agg(count(lit(1)).as("tf"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).sorted
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w2) => assert(g === w2) }
  }

  // r18: the shared bigram stage carries one (last_token, "", 0) vocab
  // marker row per non-empty doc so distinct(prev) IS the corpus
  // vocabulary — bigramPerplexity's smoothing V without a second text
  // pass. Pin both halves: the real rows (cur != "") are exactly the
  // bigramTf rows, and distinct(prev) equals the composed distinct-token
  // count over ALL docs (single-token docs included).
  test("bigramBase: real rows == bigramTf; marker rows complete the vocabulary") {
    val stage = graft.pipeline.TextAnalysis.bigramBase(df, "id", "text")
    val gotReal = stage.filter(col("cur") =!= "")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).sorted
    val wantReal = df.select(col("id"),
        explode(ShingleOps.bigramTfCol(lower(col("text")))).as("__b"))
      .select(col("id"), col("__b.prev"), col("__b.cur"), col("__b.tf"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).sorted
    assert(gotReal.toSeq === wantReal.toSeq)
    val gotVocab = stage.agg(countDistinct(col("prev"))).collect().head.getLong(0)
    val wantVocab = df.select(explode(TextAnalysis.regexTokens(lower(col("text")))).as("t"))
      .agg(countDistinct(col("t"))).collect().head.getLong(0)
    assert(gotVocab === wantVocab)
    // markers carry tf 0 — any consumer that forgets the filter cannot
    // corrupt a Σ tf count
    assert(stage.filter(col("cur") === "").agg(sum(col("tf"))).collect()
      .head.getLong(0) === 0L)
  }

  test("bandHashes equals md5(concat_ws(slice)) per band, byte for byte") {
    val bands = 8; val rows = 4
    val sig = df.select(col("id"),
      ShingleOps.minhashSigCol(lower(col("text")), 3, bands * rows).as("sig"))
      .filter(size(col("sig")) > 0)
    val got = sig.select(col("id"),
        ShingleOps.bandHashesCol(col("sig"), bands, rows).as("bh"))
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getSeq[String](1))
    val want = sig.select(col("id"),
        transform(sequence(lit(0), lit(bands - 1)),
          b => md5(concat_ws(",",
            transform(slice(col("sig"), b * rows + 1, lit(rows)), _.cast("string"))))).as("bh"))
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getSeq[String](1))
    assert(got.length === want.length && got.nonEmpty)
    got.zip(want).foreach { case ((gi, gs), (wi, ws)) =>
      assert(gi === wi); assert(gs === ws, s"id=$gi")
    }
    // short / empty signature mirrors slice semantics
    val edge = Seq((1L, Seq(5L, 7L)), (2L, Seq.empty[Long])).toDF("id", "sig")
    val g2 = edge.select(col("id"), ShingleOps.bandHashesCol(col("sig"), 2, 4).as("bh"))
      .orderBy("id").collect().map(_.getSeq[String](1))
    val w2 = edge.select(col("id"),
        transform(sequence(lit(0), lit(1)),
          b => md5(concat_ws(",",
            transform(slice(col("sig"), b * 4 + 1, lit(4)), _.cast("string"))))).as("bh"))
      .orderBy("id").collect().map(_.getSeq[String](1))
    assert(g2.toSeq === w2.toSeq)
  }

  test("null text yields null arrays (explode drops the row), empty text yields empty") {
    val d = Seq((1L, null: String), (2L, ""), (3L, "?!")).toDF("id", "text")
    val r = d.select(col("id"),
      ShingleOps.shingleHash60s(lower(col("text")), 3).as("a"),
      ShingleOps.minhashSigCol(lower(col("text")), 3, 8).as("s"),
      ShingleOps.tokenBucketsCol(lower(col("text")), 64).as("b"))
      .orderBy("id").collect()
    assert(r(0).isNullAt(1) && r(0).isNullAt(2) && r(0).isNullAt(3))
    assert(r(1).getSeq[Long](1).isEmpty && r(1).getSeq[Long](2).isEmpty &&
      r(1).getSeq[Long](3).isEmpty)
    assert(r(2).getSeq[Long](1).isEmpty && r(2).getSeq[Long](2).isEmpty &&
      r(2).getSeq[Long](3).isEmpty)
  }
}
