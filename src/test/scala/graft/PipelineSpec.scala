package graft

import graft.pipeline._
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog", "en"),
    (1L, "the quick brown fox jumps over the lazy dog", "en"),  // exact dup of 0
    (2L, "the quick brown fox jumps over the sleepy dog", "en"), // near dup of 0
    (3L, "completely different content about spark engines and parquet files", "en"),
    (4L, "short", "en"))
    .toDF("doc_id", "text", "lang")

  test("exact dedup groups and drop list") {
    val groups = Dedup.exactGroups(docs, "doc_id", "text")
    assert(groups.count() === 4)
    assert(groups.filter(col("n_docs") === 2).select("keep_id").head().getLong(0) === 0L)
    val drop = Dedup.exactDropList(docs, "doc_id", "text").collect()
    assert(drop.map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("shingles: distinct n-grams; short docs → empty array (no descending sequence)") {
    val sh = docs.select(Dedup.shingles(col("text"), 3).as("sh"))
      .collect().map(_.getSeq[String](0))
    assert(sh(0).contains("the quick brown"))
    assert(sh(4).isEmpty) // "short" has < 3 words — must NOT produce garbage
  }

  test("ngram Jaccard finds near-dups, not unrelated docs (explicit block)") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = 0.3,
        blockCols = Seq("lang"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L))) // exact dup → jaccard 1.0
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L))) // near dup
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  // No block key → the default routes through MinHash-LSH banding
  // (scale-safe on an unlabeled corpus). 16 bands × 2 rows: a 0.55-Jaccard
  // pair survives banding w.p. ~1-(1-0.55²)^16 ≈ 0.997 — and the hash
  // family is deterministic, so this is a pinned outcome, not a flake.
  test("ngram Jaccard on an unlabeled corpus: LSH banding recalls dups, exact scores") {
    val pairs = Dedup.ngramJaccardPairsLsh(docs, "doc_id", "text", n = 3, minJaccard = 0.3,
        bands = 16, rowsPerBand = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((0L, 1L)) === 1.0)                       // exact dup, exact score
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L)))
    assert(math.abs(pairs((0L, 2L)) - 5.0 / 9.0) < 1e-9)  // true Jaccard, not sig estimate
    assert(!pairs.keys.exists { case (a, b) => a == 3L || b == 3L })
    // default entry point (no blockCols) must at minimum recall exact dups
    val deflt = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(deflt.contains((0L, 1L)))
  }

  test("embedding cosine pairs on unlabeled vectors: LSH-bucket default blocks") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.01f, 0.0f, 0.0f)), // near-parallel to 0
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),   // orthogonal
      (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f)))  // antipodal
      .toDF("doc_id", "vec")
    val pairs = Dedup.embeddingCosinePairs(vecs, "doc_id", "vec", minCos = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // sign-LSH: near-parallel vectors share every plane sign → same bucket
    assert(pairs === Set((0L, 1L)))
  }

  test("minhash LSH recalls exact dups with sig_sim 1.0") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", n = 3, bands = 8, rowsPerBand = 4)
      .collect()
    val exact = pairs.find(r => r.getLong(0) == 0L && r.getLong(1) == 1L)
    assert(exact.isDefined && exact.get.getDouble(2) === 1.0)
  }

  test("simhash: identical text → distance 0; near-dup pairs surface") {
    val sigs = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("sig")).collect()
    assert(sigs(0).getLong(1) === sigs(1).getLong(1))
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
  }
}

class VectorExprSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("native dot_product == interpreted HOF fold (bit-identical)") {
    val rnd = new scala.util.Random(42)
    val vecs = (0 until 50).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1))).toDF("id", "v")
    val a = vecs.select(col("id"), col("v").as("va"))
    val b = vecs.select((col("id") + 1).as("id"), col("v").as("vb"))
    val both = a.join(b, "id")
      .select(
        graft.pipeline.Similarity.dot(col("va"), col("vb")).as("native"),
        graft.pipeline.Similarity.dotHof(col("va"), col("vb")).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getDouble(0) === r.getDouble(1))) // exact, not approx
  }

  test("dot_product registers for SQL and handles double arrays + length mismatch") {
    graft.functions.VectorExpressions.register(spark)
    val r = spark.sql("SELECT dot_product(array(1.0D, 2.0D, 3.0D), array(2.0D, 3.0D)) AS d").head()
    assert(r.getDouble(0) === 1.0 * 2 + 2.0 * 3) // min-length semantics
    val n = spark.sql("SELECT dot_product(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS d").head()
    assert(n.isNullAt(0))
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),  // close to 0
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 1.0f)))
    .toDF("vec_id", "embedding")

  test("brute-force cosine top-k: nearest neighbor is the close vector") {
    val out = Similarity.bruteForceTopK(vecs.filter(col("vec_id") === 0), vecs, k = 2)
      .orderBy("rank").collect()
    assert(out.length === 2)
    assert(out(0).getLong(1) === 1L) // rank-1 neighbor of 0 is 1
    assert(out(0).getDouble(2) > 0.99)
  }

  test("lsh bucket: identical vectors share a bucket; topk self-consistent") {
    val out = Similarity.lshTopK(vecs.filter(col("vec_id") === 0), vecs, k = 2, numPlanes = 4)
      .collect()
    // vector 1 is near-parallel to 0 → same half-space for almost any plane set
    assert(out.exists(r => r.getLong(1) === 1L))
  }

  test("ivf: near-parallel vectors share a cell; recall matches brute force on them") {
    // clusters around 3 axes; queries are cluster members
    val corpus = Seq(
      (0L, Array(1.0f, 0.01f, 0.0f)), (1L, Array(0.98f, 0.02f, 0.0f)), (2L, Array(0.95f, 0.0f, 0.05f)),
      (3L, Array(0.0f, 1.0f, 0.01f)), (4L, Array(0.02f, 0.97f, 0.0f)),
      (5L, Array(0.0f, 0.05f, 0.99f)), (6L, Array(0.01f, 0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    // nlist = corpus size → every vector is its own centroid; nprobe=2
    // guarantees the query's own cell is probed → its nearest neighbor
    // (same cluster, near-parallel) must be recalled at rank 1
    val ivf = Similarity.ivfTopK(corpus.filter(col("vec_id").isin(0L, 3L, 5L)), corpus,
        k = 1, nlist = 7, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val bf = Similarity.bruteForceTopK(corpus.filter(col("vec_id").isin(0L, 3L, 5L)), corpus, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(ivf === bf)
  }
}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token count / quality metrics") {
    val df = Seq((1L, "the cat and the hat is on 42 mats")).toDF("doc_id", "text")
    val q = TextAnalysis.qualityScore(df).head()
    assert(q.getAs[Int]("n_tokens") === 9)
    assert(q.getAs[Double]("stopword_ratio") > 0.3) // the, and, the, is
  }

  test("lang scores discriminate en vs fr stopwords") {
    val df = Seq(
      (1L, "the king and the queen of france is here"),
      (2L, "le roi et la reine des les francais des le"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.langScores(df).orderBy("doc_id").collect()
    assert(out(0).getAs[Int]("score_en") > out(0).getAs[Int]("score_fr"))
    assert(out(1).getAs[Int]("score_fr") > out(1).getAs[Int]("score_en"))
  }

  test("fingerprint: order-sensitive, whitespace-insensitive, stable") {
    val df = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha  beta   gamma"),
      (3L, "gamma beta alpha")).toDF("doc_id", "text")
    val fp = df.select(TextAnalysis.fingerprint(col("text"))).collect().map(_.getLong(0))
    assert(fp(0) === fp(1)) // extra whitespace ignored (token stream equal)
    assert(fp(0) !== fp(2)) // order matters
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("synthetic media plumbing: schema, deterministic payload, features") {
    val ids = Seq(0L, 1L, 2L, 3L).toDF("doc_id")
    val media = Multimodal.syntheticMedia(ids, "doc_id")
    assert(media.columns.toSeq === Multimodal.mediaSchema.fieldNames.toSeq)
    val feats = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(feats.length === 4)
    assert(feats.forall(_.n_bytes === 32)) // sha256 payload stub
    assert(feats.forall(_.feature.length === 8))
    assert(feats(0).kind === "image" && feats(1).kind === "audio" && feats(2).kind === "video")
    // determinism: same id → same features on re-run
    val again = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(again(0).byte_mean === feats(0).byte_mean)
  }

  test("resize + frame-sample stubs: shapes and flatMap fan-out") {
    val ids = (0L until 9L).toDF("doc_id")
    val media = Multimodal.syntheticMedia(ids, "doc_id")
    val thumbs = Multimodal.resize(media, 8, 4).collect()
    assert(thumbs.length === 9 && thumbs.forall(t => t.pixels.length === 32))
    val frames = Multimodal.sampleFrames(media, 3).collect()
    // kinds cycle image/audio/video by id % 3 → 3 videos × 3 frames
    assert(frames.length === 9)
    assert(frames.map(_.frame_idx).distinct.sorted.toSeq === Seq(0, 1, 2))
    assert(frames.forall(f => f.offset_ms >= 0 && f.offset_ms <= 1000))
  }
}
