package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`): brute-force cosine top-k as the exact baseline, and a
  * random-hyperplane-LSH bucketed variant as the scale path (bucket join
  * instead of cross join — the 100 TB shape).
  * All vector math is Catalyst `zip_with`/`aggregate` (codegen'd); floats
  * are cast to double BEFORE arithmetic so results are deterministic and
  * engine-portable.
  */
object Similarity {

  /** Native codegen'd dot product (graft.functions.DotProduct) — widens
    * to double per element, sums left-to-right; bit-identical to the
    * portable `CAST(..)*CAST(..)` fold.
    */
  def dot(a: Column, b: Column): Column = graft.functions.VectorExpressions.dot_product(a, b)

  /** Interpreted HOF formulation — kept as the portability cross-check
    * the tests compare the native expression against.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors of each query vector against the corpus.
    * The query side is expected to be small (it is broadcast); the corpus
    * streams — cost O(|Q|·|corpus|·dim) with NO shuffle of the corpus.
    *
    * The per-query top-k is EXACT TWO-PHASE (the `capPerDomain` pattern):
    * phase 1 ranks within (query_id, salt-bucket of vec_id) — `numSalts`
    * deterministic hash buckets — and keeps each bucket's top k, so
    * phase 2's per-query window sees at most k·numSalts rows REGARDLESS
    * of corpus size. A single `Window.partitionBy(query_id)` here would
    * shuffle every (corpus × query) row into one partition per query and
    * sort the whole corpus in one task — the scale-killer shape this
    * replaces. Exactness: a row in the query's true top-k is in its
    * bucket's top-k (the bucket is a subset), so phase 1 drops no
    * winner; both phases order by (cos_sim desc, vec_id), so the result
    * is independent of `numSalts` (law-tested).
    * Output: (query_id, vec_id, cos_sim, rank).
    */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 5,
      numSalts: Int = 64): DataFrame = {
    require(numSalts >= 1, s"numSalts must be >= 1, got $numSalts")
    // norms hoisted out of the pair join: one pass per vector, not per pair
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__qn", sqrt(dot(col("__qv"), col("__qv"))))
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("__cv"))
      .withColumn("__cn", sqrt(dot(col("__cv"), col("__cv"))))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim", dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
      .select("query_id", "vec_id", "cos_sim")
    val ord = Seq(col("cos_sim").desc, col("vec_id").asc)
    val w1 = Window
      .partitionBy(col("query_id"), pmod(xxhash64(col("vec_id")), lit(numSalts.toLong)))
      .orderBy(ord: _*)
    val survivors = scored
      .withColumn("__rn", row_number().over(w1))
      .filter(col("__rn") <= k)
      .drop("__rn")
    val w2 = Window.partitionBy(col("query_id")).orderBy(ord: _*)
    survivors
      .withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cos_sim", "rank")
  }

  /** Max vector dimensionality the literal hyperplane matrix covers.
    * Raise if a corpus carries wider embeddings (the matrix is a literal;
    * unused tail components are free).
    */
  val MaxDim = 256

  /** Sign-LSH bucket id: `numPlanes` deterministic hyperplanes → one bit
    * each. Vectors in the same bucket are cosine-close with high
    * probability. The plane matrix is generated Scala-side from md5
    * (graft.functions.PortableHash.planes) and embedded as ARRAY LITERALS
    * in the plan — zero per-row hashing, reproducible runs (the
    * no-Math.random discipline of distributed jobs), and the DuckDB
    * oracle embeds the exact same literals.
    */
  def lshBucket(vec: Column, numPlanes: Int = 12): Column =
    graft.functions.VectorExpressions.lsh_bucket(vec, numPlanes, MaxDim)

  /** The higher-order-function formulation [[lshBucket]]'s native
    * expression is law-tested value-identical to (PipelineSpec) — kept
    * as the executable statement of the semantics (per-plane left-to-
    * right fold, null/overlength → bit 0 via `otherwise`), never on a
    * hot path: the chain runs numPlanes interpreted folds per corpus
    * row.
    */
  private[graft] def lshBucketDecl(vec: Column, numPlanes: Int = 12): Column = {
    val planes = graft.functions.PortableHash.planes(numPlanes, MaxDim)
    val bits = (0 until numPlanes).map { p =>
      val w = slice(lit(planes(p)), lit(1), size(vec))
      val proj = aggregate(
        zip_with(vec, w, (x, c) => x.cast("double") * c),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(0L)
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** IVF-flat ANN (the inverted-file index shape): the corpus is coarse-
    * quantized into `nlist` centroid cells; each query searches only its
    * `nprobe` nearest cells with exact cosine. Centroids are a
    * DETERMINISTIC sample of corpus vectors (md5-ordered ids — no
    * iterative k-means, no Math.random; re-runs build the identical
    * index), broadcast everywhere they're used.
    *
    * Plan shape at 100 TB: centroid table is tiny (nlist rows) →
    * broadcast; cell assignment is one narrow pass over the corpus
    * (broadcast nested loop vs nlist rows + one max_by aggregation); the
    * probe is an equi-join on cell id — the corpus never cross-joins the
    * queries, and raising nlist shrinks candidate cells linearly.
    * Output: (query_id, vec_id, cos_sim, rank).
    */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 5,
      nlist: Int = 16,
      nprobe: Int = 2): DataFrame = {
    val cents = corpus
      .select(col(idCol).cast("string").as("__cid"), col(vecCol).as("__cent"))
      .withColumn("__cn0", sqrt(dot(col("__cent"), col("__cent"))))
      .filter(col("__cn0") > 0)
      .orderBy(md5(col("__cid")))
      .limit(nlist)
    // nearest centroid per corpus vector (cosine): broadcast the centroid
    // table, score nlist candidates per row, keep the argmax
    // (cos desc, cid) ordering makes ties deterministic — exact-duplicate
    // centroid vectors otherwise make the argmax engine-dependent
    def assign(df: DataFrame, id: String, vec: String, keep: Int): DataFrame = {
      val scored = df.crossJoin(broadcast(cents))
        .withColumn("__cos_c",
          dot(col(vec), col("__cent")) / (sqrt(dot(col(vec), col(vec))) * col("__cn0")))
      val w = Window.partitionBy(col(id)).orderBy(col("__cos_c").desc, col("__cid"))
      scored.withColumn("__r", row_number().over(w)).filter(col("__r") <= keep)
        .select(col(id), col(vec), col("__cid").as("__cell"))
    }
    val c = assign(
      corpus.select(col(idCol).as("vec_id"), col(vecCol).as("__cv")), "vec_id", "__cv", 1)
      .withColumn("__cn", sqrt(dot(col("__cv"), col("__cv"))))
    val q = assign(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv")), "query_id", "__qv", nprobe)
      .withColumn("__qn", sqrt(dot(col("__qv"), col("__qv"))))
    val scored = c.join(broadcast(q), Seq("__cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim", dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cos_sim", "rank")
    // no dedup needed: a corpus vector lives in exactly one cell, so each
    // (query, vec) pair joins at most once even with nprobe > 1
  }

  /** IVF-flat ANN with a TRAINED coarse quantizer: cells come from the
    * deterministic k-means codebook ([[Clustering.kmeansCentroids]])
    * instead of a raw sample — better-balanced cells, so recall per
    * probed cell is higher and the worst cell (the skew bound on a
    * probe) is smaller. Assignment matches training: squared-euclidean
    * argmin against the k centroid LITERALS folded into one codegen'd
    * expression — no centroid join at all; the probe stage keeps
    * `nprobe` nearest cells per query (sorted (dist, cell) structs,
    * sliced, exploded) and candidates come from an equi-join on the
    * cell id, exactly like [[ivfTopK]].
    * Output: (query_id, vec_id, cos_sim, rank).
    */
  def ivfTopKTrained(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 5,
      nlist: Int = 8,
      nprobe: Int = 2,
      iters: Int = 2,
      cacheKey: Option[String] = None): DataFrame = {
    import graft.pipeline.Clustering
    val cents = Clustering.kmeansCentroids(corpus, idCol, vecCol, nlist, iters,
      cacheKey = cacheKey)
    def withDists(df: DataFrame, vec: String): DataFrame =
      df.withColumn("__v", transform(col(vec), x => x.cast("double")))
        .withColumn("__ds", Clustering.centroidDists(col("__v"), cents))
    val c = withDists(corpus.select(col(idCol).as("vec_id"), col(vecCol).as("__cv")), "__cv")
      .withColumn("__cell", (array_position(col("__ds"), array_min(col("__ds"))) - 1).cast("long"))
      .withColumn("__cn", sqrt(dot(col("__cv"), col("__cv"))))
      .select("vec_id", "__cv", "__cell", "__cn")
    // nprobe nearest cells: array_sort on (dist, idx) structs is the
    // same (dist asc, cell asc) order the oracle's row_number uses.
    // __ds is BOUND as a lambda variable — referencing it directly inside
    // the per-cell lambda would inline the whole distance-array
    // construction into every element_at (see Dedup.shingles)
    val probes = slice(
      array_sort(flatten(transform(array(col("__ds")), ds =>
        transform(sequence(lit(0), lit(cents.length - 1)),
          i => struct(element_at(ds, i + 1).as("d"), i.cast("long").as("cell")))))),
      1, nprobe)
    val q = withDists(queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv")), "__qv")
      .withColumn("__probe", explode(probes))
      .withColumn("__cell", col("__probe.cell"))
      .withColumn("__qn", sqrt(dot(col("__qv"), col("__qv"))))
      .select("query_id", "__qv", "__cell", "__qn")
    val scored = c.join(broadcast(q), Seq("__cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim", dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cos_sim", "rank")
  }

  /** Trained-IVF ANN on the int8-quantized form — [[lshTopKInt8]]'s
    * storage-trim composition applied to the IVF index: both sides are
    * [[quantizeInt8]]-ed and the k-means codebook, cell assignment,
    * probes, and cosine all run on the integer-valued vectors (scales
    * cancel in cosine; training on the quantized corpus keeps codebook
    * and data in the same space). Same cost shape as [[ivfTopKTrained]];
    * cos_sim carries quantization error — re-rank the shortlist against
    * the float column when exactness matters.
    */
  def ivfTopKInt8(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 5,
      nlist: Int = 8,
      nprobe: Int = 2,
      iters: Int = 2,
      cacheKey: Option[String] = None): DataFrame = {
    def asIntVec(df: DataFrame) = quantizeInt8(df, idCol, vecCol)
      .select(col("id").as(idCol),
        transform(col("qvec"), x => x.cast("double")).as(vecCol))
    // materialize the quantized corpus ONCE: k-means training + cell
    // assignment run several actions over it, and in production the int8
    // column is persisted storage, not a projection recomputed per pass
    ivfTopKTrained(asIntVec(queries), graft.StageCache.mat(asIntVec(corpus)),
      idCol, vecCol, k, nlist, nprobe, iters,
      cacheKey = cacheKey.map(_ + ":int8"))
  }

  /** Train the `m` per-subspace PQ codebooks: subspace `j` is the
    * contiguous dim-slice `[j·ds+1, (j+1)·ds]` and gets its own
    * deterministic k-means fit ([[Clustering.kmeansCentroids]] — md5
    * init, quantized means) over the corpus restricted to that slice.
    * All m fits scan ONE materialized (id, double-vector) stage; each
    * fit is m-independent so the codebooks are reusable across pqEncode
    * / pqTopK calls via `cacheKey` (the trained-IVF precedent).
    */
  private def pqBooks(
      corpusD: DataFrame,
      m: Int,
      ksub: Int,
      iters: Int,
      ds: Int,
      cacheKey: Option[String],
      vcol: String = "__v"): Array[Array[Seq[Double]]] = {
    import graft.pipeline.Clustering
    (0 until m).map { j =>
      val sub = corpusD.select(col("vec_id"),
        slice(col(vcol), j * ds + 1, ds).as("__s"))
      Clustering.kmeansCentroids(sub, "vec_id", "__s", ksub, iters,
        cacheKey = cacheKey.map(ck => s"$ck:pq:m$m:ds$ds:sub$j"))
    }.toArray
  }

  /** Per-subspace code columns: argmin squared-euclidean against the
    * subspace codebook literals — first index achieving the array min,
    * exactly [[Clustering.kmeans]]'s assignment rule (ties → lowest
    * code), so the DuckDB replay's `(dist, cl)` row_number agrees.
    */
  private def pqCodeCols(
      v: Column, books: Array[Array[Seq[Double]]], ds: Int): Seq[Column] = {
    import graft.pipeline.Clustering
    books.toSeq.zipWithIndex.map { case (b, j) =>
      val dists = Clustering.centroidDists(slice(v, j * ds + 1, ds), b)
      (array_position(dists, array_min(dists)) - 1).cast("long")
    }
  }

  /** Normalized double-cast projection both PQ entry points train and
    * encode from — materialized once: training runs m·(1+iters) actions
    * over it, and in production the (id, vector) projection is the
    * persisted index input, not a per-pass recompute.
    */
  private def pqCorpus(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    graft.StageCache.mat(df.select(col(idCol).as("vec_id"),
      transform(col(vecCol), x => x.cast("double")).as("__v")))

  /** Product-quantization encoding (Jégou, Douze, Schmid, "Product
    * quantization for nearest neighbor search", IEEE TPAMI 2011): each
    * vector becomes `m` small codes — the id of its nearest codeword in
    * each of the m per-subspace k-means codebooks. At ksub ≤ 256 a code
    * is one byte, so a 64-dim float vector (256 B) compresses to m bytes
    * — the storage artifact an exhaustive ADC scan reads at 100 TB
    * instead of the raw floats. One codegen'd projection pass encodes
    * the corpus (codebooks are literals — no join).
    * Output: (id, codes array&lt;long&gt;), codes[j] ∈ [0, ksub).
    */
  def pqEncode(
      df: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      m: Int = 4,
      ksub: Int = 8,
      iters: Int = 2,
      dim: Int = 64,
      cacheKey: Option[String] = None): DataFrame = {
    require(m >= 1 && dim % m == 0, s"need dim divisible by m; got dim=$dim m=$m")
    val ds = dim / m
    val corpusD = pqCorpus(df, idCol, vecCol)
    val books = pqBooks(corpusD, m, ksub, iters, ds, cacheKey)
    corpusD.select(col("vec_id").as("id"),
      array(pqCodeCols(col("__v"), books, ds): _*).as("codes"))
  }

  /** OPQ rotation — the PARAMETRIC optimized-product-quantization
    * pre-transform (Ge, He, Ke, Sun, "Optimized Product Quantization",
    * CVPR 2013 §4; FAISS ships it as the `OPQx` transform): a d×d
    * orthonormal rotation applied before PQ so the m subspaces carry
    * BALANCED variance — naive dim-order slicing lets a few
    * high-variance dimensions dominate one subspace's codebook while
    * others quantize noise, which is exactly the independence/balance
    * assumption PQ's distortion bound needs. The parametric (Gaussian)
    * solution is: rotate to the PCA basis, then PERMUTE the components
    * by greedy eigenvalue allocation — eigenvalues in descending order,
    * each assigned to the non-full subspace with the smallest current
    * log-variance product (balancing Π λ across buckets). A permuted
    * orthonormal basis is still orthonormal, so L2 distances — and
    * therefore the exact search PQ approximates — are preserved.
    *
    * Fit cost at 100 TB: the covariance is the one-pass d²-statistic
    * [[embeddingCovariance]] pass (corpus never moves); the eigen solve
    * and the allocation are driver-side on the d×d matrix. The returned
    * rows become plan LITERALS downstream — no join, no shuffle.
    */
  def opqRotation(
      corpus: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      m: Int = 4,
      dim: Int = 64,
      cacheKey: Option[String] = None): Array[Array[Double]] = {
    require(m >= 1 && dim % m == 0, s"need dim divisible by m; got dim=$dim m=$m")
    def fit(): Array[Array[Double]] = {
      val cov = embeddingCovariance(corpus, idCol, vecCol, cacheKey)
      val (evals, basis) = pcaBasis(cov, dim)
      val ds = dim / m
      // greedy eigenvalue allocation: λ descending (pcaBasis order),
      // each to the emptiest-variance non-full bucket
      val bucketLog = new Array[Double](m)
      val buckets = Array.fill(m)(List.empty[Int])
      (0 until dim).foreach { i =>
        val open = (0 until m).filter(buckets(_).length < ds)
        val j = open.minBy(bucketLog)
        buckets(j) ::= i
        bucketLog(j) += math.log(math.max(evals(i), 1e-12))
      }
      // subspace j's components occupy rotated rows [j·ds, (j+1)·ds),
      // eigenvalue-descending within the bucket (undo the prepend)
      buckets.flatMap(_.reverse.map(basis)).toArray
    }
    cacheKey match {
      case Some(key) => ModelCache.getOrFit(s"opqrot:$key:$vecCol:m$m:d$dim")(fit())
      case None => fit()
    }
  }

  /** ITERATIVE (non-parametric) OPQ — the full Ge et al. CVPR'13 §3
    * alternating optimization behind the parametric seed
    * [[opqRotation]]: repeat { fix R → fit the m per-subspace codebooks
    * on the rotated corpus; fix codebooks → solve the orthogonal
    * Procrustes problem min_R Σ‖R·x − ŷ‖² = V·Uᵀ for the SVD
    * U·Σ·Vᵀ of the d×d cross-scatter M = Σ x·ŷᵀ } — each half-step can
    * only tighten its own objective, and because a fresh k-means fit is
    * seeded independently per round (not warm-started), the RETURNED
    * rotation is the round with the LOWEST measured distortion
    * (parametric seed included), making `distortion(refined) ≤
    * distortion(parametric)` a guarantee by construction, not an
    * asymptotic hope.
    *
    * Fit cost at 100 TB, per round: one codebook fit (m·(1+iters)
    * bounded k-means actions over the one materialized projection), ONE
    * exact cross-scatter pass (the [[embeddingCovariance]] discipline:
    * micro-unit quantization, primitive-long accumulation flushed to
    * BigInt before overflow — bit-identical at any partition count),
    * and one distortion aggregation; the SVD is driver-side on d×d.
    * The corpus never moves; the returned rows become plan literals
    * like the parametric path. Deterministic end-to-end (exact scatter,
    * fixed-order Jacobi SVD, md5-seeded k-means).
    */
  def opqRotationRefined(
      corpus: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      m: Int = 4,
      ksub: Int = 8,
      iters: Int = 2,
      dim: Int = 64,
      rounds: Int = 3,
      cacheKey: Option[String] = None): Array[Array[Double]] = {
    require(m >= 1 && dim % m == 0, s"need dim divisible by m; got dim=$dim m=$m")
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    val ds = dim / m
    def fit(): Array[Array[Double]] = {
      val corpusD = pqCorpus(corpus, idCol, vecCol)
      var cur = opqRotation(corpus, idCol, vecCol, m, dim, cacheKey)
      var best = cur
      var bestD = opqDistortion(corpusD, cur, m, ksub, iters, ds)
      var r = 0
      var degenerate = false
      while (r < rounds && !degenerate) {
        procrustesStep(corpusD, cur, m, ksub, iters, ds, dim) match {
          case None => degenerate = true // empty/degenerate corpus: keep best
          case Some(next) =>
            val d2 = opqDistortion(corpusD, next, m, ksub, iters, ds)
            if (d2 < bestD) { best = next; bestD = d2 }
            cur = next
        }
        r += 1
      }
      best
    }
    cacheKey match {
      case Some(key) =>
        ModelCache.getOrFit(
          s"opqrotit:$key:$vecCol:m$m:d$dim:k$ksub:i$iters:r$rounds")(fit())
      case None => fit()
    }
  }

  /** Test-visible distortion probe: mean PQ distortion of `rot` over
    * `corpus` — the objective [[opqRotationRefined]]'s keep-best rule
    * guarantees is never worse than the parametric seed's.
    */
  private[graft] def opqDistortionOf(
      corpus: DataFrame, idCol: String, vecCol: String,
      rot: Array[Array[Double]], m: Int, ksub: Int, iters: Int, dim: Int): Double =
    opqDistortion(pqCorpus(corpus, idCol, vecCol), rot, m, ksub, iters, dim / m)

  /** Rotated-corpus frame (vec_id, __v = R·x) built from rotation-row
    * literals — the internal sibling of [[projectEmbeddings]] over the
    * already-double-cast [[pqCorpus]] stage.
    */
  private def rotatedCorpus(
      corpusD: DataFrame, rot: Array[Array[Double]]): DataFrame =
    corpusD.select(col("vec_id"),
      array(rot.map(b => dot(col("__v"), array(b.map(lit): _*))): _*).as("__v"))

  /** Mean PQ distortion of rotation `rot`: fit the m codebooks on the
    * rotated corpus, then avg over rows of Σ_j min-codeword squared
    * distance in subspace j — the objective both OPQ variants minimize.
    */
  private def opqDistortion(
      corpusD: DataFrame, rot: Array[Array[Double]],
      m: Int, ksub: Int, iters: Int, ds: Int): Double = {
    val zf = rotatedCorpus(corpusD, rot)
    val books = pqBooks(zf, m, ksub, iters, ds, cacheKey = None)
    val per = (0 until m).map { j =>
      array_min(Clustering.centroidDists(slice(col("__v"), j * ds + 1, ds), books(j)))
    }.reduce(_ + _)
    val row = zf.agg(avg(per).as("d")).head()
    if (row.isNullAt(0)) Double.MaxValue else row.getDouble(0)
  }

  /** One Procrustes half-step: codebooks fit on the current rotation,
    * reconstruction ŷ per row from its nearest codewords, exact d×d
    * cross-scatter M = Σ x·ŷᵀ, and the orthogonal solution V·Uᵀ off
    * M's SVD. None when the corpus is empty.
    */
  private def procrustesStep(
      corpusD: DataFrame, rot: Array[Array[Double]],
      m: Int, ksub: Int, iters: Int, ds: Int, dim: Int): Option[Array[Array[Double]]] = {
    val zf = rotatedCorpus(corpusD, rot)
    val books = pqBooks(zf, m, ksub, iters, ds, cacheKey = None)
    // x and ŷ side by side in ONE frame, no join: z = R·x rebuilt as an
    // expression over the corpus stage's x, then ŷ = concatenation of
    // each subspace's nearest codeword (the PQ reconstruction), selected
    // by the same ties-to-lowest argmin the encoder uses
    val zCol = array(rot.map(b => dot(col("__v"), array(b.map(lit): _*))): _*)
    def yFromZ(z: Column): Column = concat(books.toSeq.zipWithIndex.map { case (b, j) =>
      val dists = Clustering.centroidDists(slice(z, j * ds + 1, ds), b)
      val code = (array_position(dists, array_min(dists)) - 1).cast("int")
      element_at(array(b.map(cw => array(cw.map(lit): _*)): _*), code + 1)
    }: _*)
    // z bound as a lambda variable so the m subspace slices share ONE
    // evaluation of the d² rotation (the projectEmbeddings binding trick)
    val yCol = flatten(transform(array(zCol), z => yFromZ(z)))
    val xy = corpusD.select(col("__v").as("__x"), yCol.as("__y"))
    crossMoments(xy).map { case (_, mBig) =>
      val mm = Array.tabulate(dim, dim)((i, j) => mBig(i * dim + j).toDouble / 1e12)
      val (u, _, v) = svdSquare(mm)
      // B = V·Uᵀ maximizes tr(B·M): B(r)(c) = Σ_k v_k(r)·u_k(c)
      Array.tabulate(dim, dim)((r, c) => {
        var t = 0.0; var k = 0
        while (k < dim) { t += v(k)(r) * u(k)(c); k += 1 }
        t
      })
    }
  }

  /** OPQ encoding — [[pqEncode]] over the rotated corpus: the stored
    * index artifact of [[opqTopK]] (m small codes per vector, codebooks
    * fit in the rotated space). Same output contract as pqEncode.
    */
  def opqEncode(
      df: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      m: Int = 4,
      ksub: Int = 8,
      iters: Int = 2,
      dim: Int = 64,
      rotation: Option[Array[Array[Double]]] = None,
      cacheKey: Option[String] = None): DataFrame = {
    val rot = rotation.getOrElse(opqRotation(df, idCol, vecCol, m, dim, cacheKey))
    require(rot.length == dim && rot.forall(_.length == dim),
      s"rotation must be $dim x $dim, got ${rot.length} x ${rot.headOption.map(_.length)}")
    pqEncode(projectEmbeddings(df, idCol, vecCol, rot), idCol, "proj",
      m, ksub, iters, dim, cacheKey = cacheKey.map(_ + opqKeySuffix(m, rot)))
  }

  /** Codebook cache-key suffix for the OPQ entry points: the rotation is
    * a fit-determining input (codebooks are fit in the ROTATED space),
    * so its content fingerprint is part of the key — two calls sharing a
    * `cacheKey` but passing different explicit rotations must not reuse
    * each other's codebooks. Deterministic (bit-content fold), so the
    * fitted-default path still cache-hits across queries.
    */
  private def opqKeySuffix(m: Int, rot: Array[Array[Double]]): String = {
    var h = 17L
    var i = 0
    while (i < rot.length) {
      val r = rot(i)
      var j = 0
      while (j < r.length) {
        h = h * 31 + java.lang.Double.doubleToLongBits(r(j)); j += 1
      }
      i += 1
    }
    s":opq:m$m:r${java.lang.Long.toHexString(h)}"
  }

  /** OPQ-ADC approximate top-k: [[opqRotation]] composed in front of
    * the plain [[pqTopK]] scan — both sides are rotated by the SAME
    * orthonormal literal basis ([[projectEmbeddings]]: native
    * dot-product codegen, no join), then codebook fit, encoding, LUTs,
    * and the salted two-phase top-k all run unchanged in the rotated
    * space. Since the rotation preserves L2, the result approximates
    * the same exact search as [[pqTopK]], with strictly better-balanced
    * codebooks (the OPQ guarantee); `rotation = identity` reproduces
    * [[pqTopK]] bit-for-bit (the SimilaritySpec law — dot against a
    * one-hot literal row is exact), which pins the composition.
    * Output: (query_id, vec_id, adc_dist, rank), adc in ROTATED space
    * = approximate squared L2 in the original space.
    */
  def opqTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 5,
      m: Int = 4,
      ksub: Int = 8,
      iters: Int = 2,
      dim: Int = 64,
      numSalts: Int = 64,
      rotation: Option[Array[Array[Double]]] = None,
      cacheKey: Option[String] = None): DataFrame = {
    val rot = rotation.getOrElse(opqRotation(corpus, idCol, vecCol, m, dim, cacheKey))
    require(rot.length == dim && rot.forall(_.length == dim),
      s"rotation must be $dim x $dim, got ${rot.length} x ${rot.headOption.map(_.length)}")
    val corpusR = projectEmbeddings(corpus, idCol, vecCol, rot)
    val queriesR = projectEmbeddings(queries, idCol, vecCol, rot)
    pqTopK(queriesR, corpusR, idCol, "proj", k, m, ksub, iters, dim, numSalts,
      cacheKey = cacheKey.map(_ + opqKeySuffix(m, rot)))
  }

  /** PQ-ADC approximate top-k (asymmetric distance computation): the
    * corpus is scanned as its m-byte PQ codes; each query precomputes a
    * lookup table of m×ksub exact sub-distances to every codeword, and
    * the approximate distance is the m-term LUT sum
    * `adc = Σ_j ‖q_j − cent_j[code_j(x)]‖²` — no float arithmetic per
    * corpus row beyond m array lookups and m−1 adds. This is the
    * classic memory-bandwidth trade that keeps an EXHAUSTIVE scan
    * feasible at 100 TB: the scan reads m bytes per vector (not dim
    * floats), queries broadcast with their LUTs, the corpus never
    * shuffles, and the per-query top-k is the salted two-phase window
    * ([[bruteForceTopK]]'s pattern — no single task ever sorts a
    * corpus). Ranking by (adc asc, vec_id) is total, so the result is
    * independent of `numSalts`.
    * Output: (query_id, vec_id, adc_dist, rank) — adc_dist is the
    * approximate SQUARED euclidean distance.
    */
  def pqTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 5,
      m: Int = 4,
      ksub: Int = 8,
      iters: Int = 2,
      dim: Int = 64,
      numSalts: Int = 64,
      cacheKey: Option[String] = None): DataFrame = {
    import graft.pipeline.Clustering
    require(m >= 1 && dim % m == 0, s"need dim divisible by m; got dim=$dim m=$m")
    require(numSalts >= 1, s"numSalts must be >= 1, got $numSalts")
    val ds = dim / m
    val corpusD = pqCorpus(corpus, idCol, vecCol)
    val books = pqBooks(corpusD, m, ksub, iters, ds, cacheKey)
    val enc = corpusD.select(col("vec_id") +:
      pqCodeCols(col("__v"), books, ds).zipWithIndex.map { case (c, j) => c.as(s"__c$j") }: _*)
    val q = queries
      .select(col(idCol).as("query_id"),
        transform(col(vecCol), x => x.cast("double")).as("__qv"))
      .select(col("query_id") +: books.toSeq.zipWithIndex.map { case (b, j) =>
        Clustering.centroidDists(slice(col("__qv"), j * ds + 1, ds), b).as(s"__lut$j")
      }: _*)
    // left-assoc LUT sum — the oracle's `q0.dist + q1.dist + …` is the
    // same fold order, so adc is bit-identical across engines
    val adc = (0 until m)
      .map(j => element_at(col(s"__lut$j"), (col(s"__c$j") + 1).cast("int")))
      .reduce(_ + _)
    val scored = enc.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("adc_dist", adc)
      .select("query_id", "vec_id", "adc_dist")
    val ord = Seq(col("adc_dist").asc, col("vec_id").asc)
    val w1 = Window
      .partitionBy(col("query_id"), pmod(xxhash64(col("vec_id")), lit(numSalts.toLong)))
      .orderBy(ord: _*)
    val w2 = Window.partitionBy(col("query_id")).orderBy(ord: _*)
    scored
      .withColumn("__rn", row_number().over(w1))
      .filter(col("__rn") <= k)
      .drop("__rn")
      .withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "adc_dist", "rank")
  }

  /** IVF-PQ ANN — the composed billion-scale index (Jégou et al. TPAMI'11
    * §V, "IVFADC"; what FAISS ships as IndexIVFPQ): a coarse k-means
    * quantizer routes each vector to one of `nlist` cells, and the
    * RESIDUAL `v − centroid(cell)` is product-quantized with ONE shared
    * m-subspace codebook (residuals cluster near 0, so one codebook
    * serves every cell). A query probes its `nprobe` nearest cells and
    * ADC-scores only those cells' candidates — against per-(query, cell)
    * LUTs built from the query's OWN residual in that cell, so
    * `adc = Σ_j ‖(q−c)_j − cent_j[code_j(x)]‖² ≈ ‖q − x‖²` for x in
    * cell c. Combines IVF's candidate pruning (scan nprobe/nlist of the
    * corpus) with PQ's m-byte compression of what IS scanned.
    *
    * Scale shape: the stored index is (cell, m codes) per vector — the
    * coarse assignment and codes are literal-codebook projections (no
    * joins); candidates come from an equi-join on the cell id against
    * the BROADCAST (query, cell, LUTs) frame (nprobe·|Q| rows); the
    * per-query top-k is the salted two-phase window. The corpus never
    * shuffles; a corpus vector lives in exactly one cell, so no
    * cross-probe dup pairs.
    *
    * Deterministic end-to-end (every fit is [[Clustering.kmeansCentroids]]);
    * the DuckDB oracle replays the coarse chain AND all m residual
    * chains in SQL. Degenerate law (SimilaritySpec): nprobe = nlist +
    * one codeword per vector + zero PQ iterations is EXACT squared-L2
    * search — the residual algebra telescopes,
    * `‖(q−c) − (x−c)‖² = ‖q−x‖²`.
    * Output: (query_id, vec_id, adc_dist, rank).
    */
  def ivfPqTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 5,
      nlist: Int = 8,
      nprobe: Int = 2,
      m: Int = 4,
      ksub: Int = 8,
      iters: Int = 2,
      dim: Int = 64,
      numSalts: Int = 64,
      cacheKey: Option[String] = None): DataFrame = {
    import graft.pipeline.Clustering
    require(m >= 1 && dim % m == 0, s"need dim divisible by m; got dim=$dim m=$m")
    require(nprobe >= 1 && nprobe <= nlist, s"need 1 <= nprobe <= nlist; got $nprobe/$nlist")
    val ds = dim / m
    val corpusD = pqCorpus(corpus, idCol, vecCol)
    val coarse = Clustering.kmeansCentroids(corpusD, "vec_id", "__v", nlist, iters,
      cacheKey = cacheKey.map(_ + ":ivfpq:coarse"))
    val coarseLit = typedlit(coarse.map(_.toSeq).toSeq)
    def residual(v: Column, cell: Column): Column =
      zip_with(v, element_at(coarseLit, (cell + 1).cast("int")), (a, b) => a - b)
    // residual frame materialized ONCE: the m codebook fits re-scan it
    val rdv = graft.StageCache.mat {
      val ds0 = Clustering.centroidDists(col("__v"), coarse)
      corpusD
        .withColumn("__cell", (array_position(ds0, array_min(ds0)) - 1).cast("long"))
        .select(col("vec_id"), col("__cell"),
          residual(col("__v"), col("__cell")).as("__r"))
    }
    val books = pqBooks(rdv, m, ksub, iters, ds,
      cacheKey.map(_ + ":ivfpq-res"), vcol = "__r")
    val enc = rdv.select(col("vec_id") +: col("__cell") +:
      pqCodeCols(col("__r"), books, ds).zipWithIndex
        .map { case (c, j) => c.as(s"__c$j") }: _*)
    // query side: nprobe nearest cells, then per-(query, cell) residual LUTs
    val qD = queries.select(col(idCol).as("query_id"),
      transform(col(vecCol), x => x.cast("double")).as("__qv"))
    val qds = Clustering.centroidDists(col("__qv"), coarse)
    val probes = slice(
      array_sort(flatten(transform(array(qds), dsx =>
        transform(sequence(lit(0), lit(coarse.length - 1)),
          i => struct(element_at(dsx, i + 1).as("d"), i.cast("long").as("cell")))))),
      1, nprobe)
    val q = qD
      .withColumn("__probe", explode(probes))
      .withColumn("__cell", col("__probe.cell"))
      .withColumn("__qr", residual(col("__qv"), col("__cell")))
      .select(col("query_id") +: col("__cell") +: books.toSeq.zipWithIndex.map {
        case (b, j) =>
          Clustering.centroidDists(slice(col("__qr"), j * ds + 1, ds), b).as(s"__lut$j")
      }: _*)
    val adc = (0 until m)
      .map(j => element_at(col(s"__lut$j"), (col(s"__c$j") + 1).cast("int")))
      .reduce(_ + _)
    val scored = enc.join(broadcast(q), Seq("__cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("adc_dist", adc)
      .select("query_id", "vec_id", "adc_dist")
    val ord = Seq(col("adc_dist").asc, col("vec_id").asc)
    val w1 = Window
      .partitionBy(col("query_id"), pmod(xxhash64(col("vec_id")), lit(numSalts.toLong)))
      .orderBy(ord: _*)
    val w2 = Window.partitionBy(col("query_id")).orderBy(ord: _*)
    scored
      .withColumn("__rn", row_number().over(w1))
      .filter(col("__rn") <= k)
      .drop("__rn")
      .withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "adc_dist", "rank")
  }

  /** Multi-probe probe-bucket list for a query vector: the base sign-LSH
    * bucket plus `numProbes - 1` variants with the LOWEST-MARGIN bit
    * flipped (smallest |projection| = the hyperplane the vector sits
    * closest to = the bit most likely to differ for a true neighbor) —
    * the classic multi-probe LSH recall boost (Lv et al., VLDB'07)
    * without building extra hash tables. All buckets are distinct (base
    * XOR distinct single bits), so a downstream equi-join yields each
    * candidate pair at most once.
    *
    * Every computed array (projections, base bucket) is BOUND once as a
    * lambda variable via `transform(array(x), v => ...)` — referencing
    * them directly would inline the full projection fold into every use
    * (CSE cannot reach lambda bodies).
    */
  def lshProbeBuckets(vec: Column, numPlanes: Int = 12, numProbes: Int = 3): Column = {
    require(numProbes >= 1 && numProbes <= numPlanes + 1,
      s"numProbes must be in [1, numPlanes+1]; got $numProbes")
    val planes = graft.functions.PortableHash.planes(numPlanes, MaxDim)
    val projs = array((0 until numPlanes).map { p =>
      val w = slice(lit(planes(p)), lit(1), size(vec))
      aggregate(zip_with(vec, w, (x, c) => x.cast("double") * c),
        lit(0.0), (acc, x) => acc + x)
    }: _*)
    // 2^p as a column: pow is exact for p < 53; shiftleft needs a literal
    def pow2(p: Column): Column = pow(lit(2.0), p.cast("double")).cast("long")
    flatten(transform(array(projs), ps => {
      val base = aggregate(sequence(lit(0), lit(numPlanes - 1)), lit(0L),
        (acc, p) => acc + when(element_at(ps, p + 1) >= 0, pow2(p)).otherwise(lit(0L)))
      // bit indices by ascending |projection| (ties → bit index): the
      // first numProbes-1 are the flips, probed in that order
      val flipOrder = slice(
        array_sort(transform(sequence(lit(0), lit(numPlanes - 1)),
          p => struct(abs(element_at(ps, p + 1)).as("m"), p.cast("long").as("p")))),
        1, numProbes - 1)
      flatten(transform(array(base), b =>
        concat(array(b), transform(flipOrder, s => b.bitwiseXOR(pow2(s.getField("p")))))))
    }))
  }

  /** Multi-probe variant of [[lshTopK]]: each query searches its own
    * bucket PLUS the `numProbes - 1` lowest-margin bit-flip buckets —
    * recall approaches brute force as numProbes grows while the corpus
    * side still partitions by a single bucket id (the corpus is hashed
    * once; only the small query side explodes ×numProbes). Same
    * output/cost shape as [[lshTopK]]: equi-join on the bucket key, exact
    * cosine within candidates, per-query top-k window on the candidate
    * set. Output: (query_id, vec_id, cos_sim, rank).
    */
  def lshTopKMultiProbe(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 5,
      numPlanes: Int = 12,
      numProbes: Int = 3): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("bucket", explode(lshProbeBuckets(col("__qv"), numPlanes, numProbes)))
      .withColumn("__qn", sqrt(dot(col("__qv"), col("__qv"))))
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("__cv"))
      .withColumn("bucket", lshBucket(col("__cv"), numPlanes))
      .withColumn("__cn", sqrt(dot(col("__cv"), col("__cv"))))
    // a corpus vector lives in exactly ONE bucket and a query's probe
    // buckets are pairwise distinct, so no (query, vec) pair joins twice
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim", dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cos_sim", "rank")
  }

  /** Symmetric per-vector int8 quantization of an embedding column — the
    * standard ANN storage trim (4× smaller than float32, ~8× smaller
    * than the double-cast working form): `scale = max|v_i| / 127`,
    * `q_i = round(v_i / scale) ∈ [-127, 127]`. Deterministic (ties away
    * from zero in both engines); an all-zero vector quantizes to zeros
    * with scale 0. A pure codegen'd projection — no shuffle, composes
    * with any scan; candidate generation (LSH/IVF cell joins) can run
    * entirely on the int8 form, with exact re-ranking reading the
    * float column only for the shortlist.
    *
    * Output: (id, qvec array<int>, scale) — `dequantized ≈ q_i * scale`.
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        graft.functions.VectorExpressions.quantize_int8(col(vecCol)).as("__q"))
      .select(col("id"), col("__q.qvec").as("qvec"), col("__q.scale").as("scale"))

  /** The higher-order-function formulation [[quantizeInt8]]'s native
    * expression is law-tested value-identical to (PipelineSpec) — kept
    * as the executable statement of the semantics, never on a hot path:
    * the interpreted lambda chain costs >10× the native pass once
    * Catalyst duplicates it into inferred explode filters.
    */
  private[graft] def quantizeInt8Decl(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        transform(col(vecCol), x => x.cast("double")).as("__v"))
      .withColumn("__ma", array_max(transform(col("__v"), x => abs(x))))
      .withColumn("scale", col("__ma") / lit(127.0))
      .withColumn("qvec",
        when(col("__ma") > 0,
          transform(col("__v"), x => round(x / col("scale"), 0).cast("int")))
        .otherwise(transform(col("__v"), _ => lit(0))))
      .select("id", "qvec", "scale")

  /** LSH ANN running entirely on the int8-quantized form — the 100 TB
    * storage path made executable: both sides are [[quantizeInt8]]-ed and
    * the whole candidate + scoring pipeline reads ONLY the int8 vectors
    * (4× less scan I/O than float32). The per-vector scales cancel in
    * cosine, so quantized cosine is exactly the integer-vector cosine —
    * no dequantization anywhere; products (≤127²·dim) stay exactly
    * representable, so the arithmetic is engine-portable. Bucket signs
    * come from the quantized projections (agrees with the float buckets
    * up to rounding at the hyperplane margin). Output as [[lshTopK]];
    * cos_sim carries quantization error ~1e-2 — re-rank the shortlist
    * against the float column when exactness matters.
    */
  def lshTopKInt8(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 5,
      numPlanes: Int = 12): DataFrame = {
    def asIntVec(df: DataFrame) = quantizeInt8(df, idCol, vecCol)
      .select(col("id").as(idCol),
        transform(col("qvec"), x => x.cast("double")).as(vecCol))
    lshTopK(asIntVec(queries), asIntVec(corpus), idCol, vecCol, k, numPlanes)
  }

  /** LSH-bucketed ANN: join queries to corpus on bucket id (equi-join —
    * shuffle on the short bucket key, not a cross join), then exact cosine
    * + top-k within candidates. Recall < 1 by construction; raise
    * `numPlanes` ↓bucket size, or use [[lshTopKMultiProbe]] for recall.
    * Output: (query_id, vec_id, cos_sim, rank).
    */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 5,
      numPlanes: Int = 12): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("bucket", lshBucket(col("__qv"), numPlanes))
      .withColumn("__qn", sqrt(dot(col("__qv"), col("__qv"))))
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("__cv"))
      .withColumn("bucket", lshBucket(col("__cv"), numPlanes))
      .withColumn("__cn", sqrt(dot(col("__cv"), col("__cv"))))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim", dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cos_sim", "rank")
  }

  /** FAISS-style two-stage search, stage two: exact re-ranking of an ANN
    * shortlist against the full-precision vectors. The shortlist's
    * (query_id, vec_id) pairs — from [[lshTopKInt8]]/[[ivfTopKInt8]] (or
    * any candidate generator whose scores carry quantization error) —
    * are joined back to the FLOAT vector columns and re-scored with
    * exact cosine; output is the top `k` per query in exact-score order.
    * The int8 stage generates candidates reading 4x less corpus I/O;
    * this stage restores exact scores and ordering while reading float
    * vectors for only |shortlist| rows.
    *
    * Plan shape: the shortlist joined to its query vectors is
    * |Q|·shortK rows — broadcast; the corpus streams through ONE
    * broadcast hash join on the id (no corpus shuffle, no cross join),
    * and the top-k window runs on the tiny re-scored candidate set.
    * Output: (query_id, vec_id, cos_sim, rank) — rank 1..k by exact
    * cosine, `vec_id` tie-break.
    */
  def rerankExact(
      shortlist: DataFrame,
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 5): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__qn", sqrt(dot(col("__qv"), col("__qv"))))
    val sq = shortlist.select(col("query_id"), col("vec_id"))
      .join(q, Seq("query_id"))
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("__cv"))
      .withColumn("__cn", sqrt(dot(col("__cv"), col("__cv"))))
    val scored = c.join(broadcast(sq), Seq("vec_id"))
      .withColumn("cos_sim", dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cos_sim", "rank")
  }

  /** ANN index quality: recall@k of an approximate top-k result set
    * against the exact one — the standard figure of merit for tuning
    * the LSH/IVF knobs (planes, probes, cells) before committing an
    * index shape to a 100 TB corpus. Both inputs are (query_id, vec_id,
    * ...) top-k frames (any of [[lshTopK]]/[[ivfTopK]]/the int8 paths vs
    * [[bruteForceTopK]]). Per query: |approx ∩ exact| / |exact| — a
    * broadcast-sized join of two k·|queries| frames, never touching the
    * corpus. Output: (query_id, n_exact, n_hit, recall).
    */
  def recallAtK(approx: DataFrame, exact: DataFrame): DataFrame = {
    val a = approx.select(col("query_id"), col("vec_id")).distinct()
      .withColumn("__hit", lit(1))
    exact.select(col("query_id"), col("vec_id"))
      .join(a, Seq("query_id", "vec_id"), "left")
      .groupBy("query_id")
      .agg(
        count(lit(1)).cast("long").as("n_exact"),
        sum(coalesce(col("__hit"), lit(0))).cast("long").as("n_hit"))
      .withColumn("recall", col("n_hit").cast("double") / col("n_exact"))
  }

  // ---- covariance + PCA (the IVF/whitening preprocessing path) ---------

  /** Exact upper-triangle covariance of the embedding column, long form
    * (i, j, n, cov) for i ≤ j — the d×d statistic behind PCA/whitening.
    * Components are quantized to integer micro-units BEFORE summing and
    * every sum is exact integer arithmetic — associative-commutative-
    * EXACT at any partition count or corpus size (the q_kmeans_inertia
    * lesson), with the covariance derived by one fixed chain of IEEE
    * divisions at the very end.
    *
    * Shape: this is the ONE place the engine drops to `mapPartitions`
    * (SURVEY §2.10 tier (d)) — the per-row work is d(d+1)/2 = 2080
    * products into a SHARED accumulator, which Catalyst can only express
    * by materializing 2080 (pos, product) rows per input row for the
    * hash aggregate (measured 18 s vs 0.2 s at the 10× fixture: 40M-row
    * explode + decimal buffer adds vs primitive long fused
    * multiply-adds). One imperative pass per partition; each partition
    * emits one (count, d, d²) partial — the corpus never moves, and the
    * driver sees only d²-sized statistics. [[embeddingCovarianceExpr]]
    * keeps the declarative twin this is law-tested bit-identical to.
    */
  def embeddingCovariance(
      df: DataFrame, idCol: String, vecCol: String,
      cacheKey: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    import org.apache.spark.sql.{Row, types => T}
    // the reduced moment triple (n, Σx_i, Σx_i·x_j) is a fitted
    // statistic — d²-sized, corpus-derived, deterministic — so it
    // registers in the ModelCache when the caller names the input:
    // covariance, whitening, and the PCA basis all read ONE pass
    def moments(): Option[(Long, Array[BigInt], Array[BigInt])] = {
      def fit() = covMoments(df, vecCol)
      cacheKey match {
        case Some(key) => ModelCache.getOrFit(s"covmoments:$key:$vecCol")(fit())
        case None => fit()
      }
    }
    val schema = T.StructType(Seq(
      T.StructField("i", T.LongType, nullable = false),
      T.StructField("j", T.LongType, nullable = false),
      T.StructField("n", T.LongType, nullable = false),
      T.StructField("cov", T.DoubleType, nullable = false)))
    moments() match {
      case None => spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      case Some((n, dims, pairs)) =>
        val d = dims.length
        // the same fixed chain of IEEE ops as the declarative form:
        // ((sxy/1e12) − (sx/1e6)·(sy/1e6)/n) / n, with BigInt→double the
        // identical correctly-rounded conversion decimal(38,0)→double does
        val rows = for {
          i <- 0 until d; j <- i until d
        } yield {
          val k = i * d - i * (i - 1) / 2 + (j - i) // upper-triangle row-major
          val cov = (pairs(k).toDouble / 1e12
            - (dims(i).toDouble / 1e6) * (dims(j).toDouble / 1e6) / n) / n
          Row(i.toLong, j.toLong, n, cov)
        }
        spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    }
  }

  /** The exact integer moment triple (n, per-dim sums, upper-triangle
    * product sums) behind [[embeddingCovariance]] — one imperative pass
    * per partition: quantize each component to
    * integer micro-units (HALF_UP via BigDecimal.valueOf — the exact
    * rounding Catalyst's round() performs, so this is bit-identical to
    * [[embeddingCovarianceExpr]]), accumulate d first moments and
    * d(d+1)/2 upper-triangle products in PRIMITIVE LONG arrays, and
    * flush to BigInt accumulators BEFORE any overflow is possible (the
    * per-row capacity bound max(m², m) is tracked against 4e18): exact
    * at any row count and any partitioning, for component magnitudes up
    * to |x| ≤ 2000 (beyond which a single micro-unit product q_i·q_j
    * would itself overflow Long — the pass fails loudly there rather
    * than silently wrapping). The
    * corpus never leaves the executors — each partition emits one
    * (count, d, d² BigInt) partial, combined pairwise by exact integer
    * addition (treeReduce, order-free). None when the input has no
    * non-null vectors.
    */
  private def covMoments(
      df: DataFrame, vecCol: String): Option[(Long, Array[BigInt], Array[BigInt])] = {
    val partials = df
      .select(transform(col(vecCol), x => x.cast("double")).as("__v"))
      .rdd.mapPartitions { it =>
        var d = -1
        var n = 0L
        var dimL: Array[Long] = null; var pairL: Array[Long] = null
        var dimB: Array[BigInt] = null; var pairB: Array[BigInt] = null
        var cap = 0L
        def flush(): Unit = {
          var i = 0
          while (i < dimL.length) { dimB(i) += dimL(i); dimL(i) = 0L; i += 1 }
          i = 0
          while (i < pairL.length) { pairB(i) += pairL(i); pairL(i) = 0L; i += 1 }
          cap = 0L
        }
        it.foreach { row =>
          // a null vector contributes nothing, like the declarative
          // twin (whose explode skips null arrays) — and n excludes it
          val v = if (row.isNullAt(0)) null else row.getSeq[Double](0)
          if (v != null) {
          if (d < 0) {
            d = v.length
            dimL = new Array[Long](d); pairL = new Array[Long](d * (d + 1) / 2)
            dimB = Array.fill(d)(BigInt(0)); pairB = Array.fill(d * (d + 1) / 2)(BigInt(0))
          }
          require(v.length == d,
            s"embeddingCovariance: ragged vector widths ($d vs ${v.length})")
          val q = new Array[Long](d)
          var m = 0L
          var i = 0
          while (i < d) {
            q(i) = java.math.BigDecimal.valueOf(v(i) * 1e6)
              .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
            if (math.abs(q(i)) > m) m = math.abs(q(i))
            i += 1
          }
          // |q| ≤ 2e9 keeps every single product q_i·q_j (≤ m² = 4e18)
          // AND the rowBound bookkeeping itself inside Long — above it,
          // m·m overflows SILENTLY and corrupts the very cap check that
          // guards the accumulators, so fail loudly instead (|x| > 2000
          // is far outside any embedding normalization; rescale first)
          require(m <= 2000000000L,
            s"embeddingCovariance: component magnitude ${m / 1e6} exceeds the " +
              "2000.0 exact-arithmetic envelope (micro-unit products must fit " +
              "in Long); rescale the embeddings before covariance")
          val rowBound = math.max(m * m, m)
          if (cap > 4000000000000000000L - rowBound) flush()
          cap += rowBound
          var k = 0
          i = 0
          while (i < d) {
            dimL(i) += q(i)
            var j = i
            val qi = q(i)
            while (j < d) { pairL(k) += qi * q(j); k += 1; j += 1 }
            i += 1
          }
          n += 1
          }
        }
        if (d < 0) Iterator.empty
        else { flush(); Iterator.single((n, dimB, pairB)) }
      }
    if (partials.isEmpty()) None
    else Some(partials.treeReduce({ case ((n1, d1, p1), (n2, d2, p2)) =>
      require(d1.length == d2.length,
        s"embeddingCovariance: ragged vector widths across partitions (${d1.length} vs ${d2.length})")
      var i = 0
      while (i < d1.length) { d1(i) += d2(i); i += 1 }
      i = 0
      while (i < p1.length) { p1(i) += p2(i); i += 1 }
      (n1 + n2, d1, p1)
    }, depth = 2))
  }

  /** Exact d×d cross-scatter M = Σ x·ŷᵀ over paired vector columns
    * (`__x`, `__y`) — the [[covMoments]] discipline applied to the OPQ
    * Procrustes statistic: micro-unit HALF_UP quantization of both
    * sides, primitive-long product accumulation flushed to BigInt before
    * overflow is possible, one partial per partition combined by exact
    * integer addition (order-free, so bit-identical at any partition
    * count). Returns (row count, flattened row-major d×d BigInt sums of
    * q_x(i)·q_y(j)); None when no non-null pairs exist. Rows with either
    * side null contribute nothing.
    */
  private def crossMoments(
      df: DataFrame): Option[(Long, Array[BigInt])] = {
    val partials = df
      .select(transform(col("__x"), x => x.cast("double")).as("__x"),
        transform(col("__y"), y => y.cast("double")).as("__y"))
      .rdd.mapPartitions { it =>
        var d = -1
        var n = 0L
        var accL: Array[Long] = null
        var accB: Array[BigInt] = null
        var cap = 0L
        def flush(): Unit = {
          var i = 0
          while (i < accL.length) { accB(i) += accL(i); accL(i) = 0L; i += 1 }
          cap = 0L
        }
        def quant(v: Seq[Double]): (Array[Long], Long) = {
          val q = new Array[Long](v.length)
          var mx = 0L
          var i = 0
          while (i < q.length) {
            q(i) = java.math.BigDecimal.valueOf(v(i) * 1e6)
              .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
            if (math.abs(q(i)) > mx) mx = math.abs(q(i))
            i += 1
          }
          (q, mx)
        }
        it.foreach { row =>
          val x = if (row.isNullAt(0)) null else row.getSeq[Double](0)
          val y = if (row.isNullAt(1)) null else row.getSeq[Double](1)
          if (x != null && y != null) {
            if (d < 0) {
              d = x.length
              accL = new Array[Long](d * d)
              accB = Array.fill(d * d)(BigInt(0))
            }
            require(x.length == d && y.length == d,
              s"crossMoments: ragged vector widths ($d vs ${x.length}/${y.length})")
            val (qx, mx) = quant(x)
            val (qy, my) = quant(y)
            // same exact-arithmetic envelope as covMoments: any single
            // micro-unit product must fit in Long
            require(mx <= 2000000000L && my <= 2000000000L,
              s"crossMoments: component magnitude ${math.max(mx, my) / 1e6} exceeds " +
                "the 2000.0 exact-arithmetic envelope; rescale the embeddings first")
            val rowBound = math.max(mx * my, math.max(mx, my))
            if (cap > 4000000000000000000L - rowBound) flush()
            cap += rowBound
            var i = 0
            var k = 0
            while (i < d) {
              val qi = qx(i)
              var j = 0
              while (j < d) { accL(k) += qi * qy(j); k += 1; j += 1 }
              i += 1
            }
            n += 1
          }
        }
        if (d < 0) Iterator.empty
        else { flush(); Iterator.single((n, accB)) }
      }
    if (partials.isEmpty()) None
    else Some(partials.treeReduce({ case ((n1, a1), (n2, a2)) =>
      require(a1.length == a2.length,
        s"crossMoments: ragged widths across partitions (${a1.length} vs ${a2.length})")
      var i = 0
      while (i < a1.length) { a1(i) += a2(i); i += 1 }
      (n1 + n2, a1)
    }, depth = 2))
  }

  /** Driver-side SVD of a square d×d matrix via the in-house
    * [[jacobiEigen]]: MᵀM = V·Σ²·Vᵀ gives V and the singular values;
    * U's columns are M·v_i/σ_i, Gram-Schmidt-polished, with a
    * deterministic standard-basis completion for (near-)zero singular
    * values. Returns (U columns, σ descending, V columns) with
    * M ≈ U·Σ·Vᵀ, both U and V orthonormal.
    */
  private[graft] def svdSquare(
      mIn: Array[Array[Double]]): (Array[Array[Double]], Array[Double], Array[Array[Double]]) = {
    val d = mIn.length
    val s = Array.ofDim[Double](d, d)
    var i = 0
    while (i < d) {
      var j = 0
      while (j < d) {
        var t = 0.0; var k = 0
        while (k < d) { t += mIn(k)(i) * mIn(k)(j); k += 1 }
        s(i)(j) = t; j += 1
      }
      i += 1
    }
    val (evals, v) = jacobiEigen(s) // v(i) = components of the i-th right-singular vector
    val sig = evals.map(e => math.sqrt(math.max(e, 0.0)))
    val eps = (if (sig.nonEmpty) sig(0) else 0.0) * 1e-9
    val u = Array.ofDim[Double](d, d)
    def orthogonalize(w: Array[Double], upTo: Int): Double = {
      var p = 0
      while (p < upTo) {
        var dp = 0.0; var k = 0
        while (k < d) { dp += w(k) * u(p)(k); k += 1 }
        k = 0
        while (k < d) { w(k) -= dp * u(p)(k); k += 1 }
        p += 1
      }
      math.sqrt(w.map(x => x * x).sum)
    }
    i = 0
    while (i < d) {
      var done = false
      if (sig(i) > eps) {
        val w = new Array[Double](d)
        var r = 0
        while (r < d) {
          var t = 0.0; var k = 0
          while (k < d) { t += mIn(r)(k) * v(i)(k); k += 1 }
          w(r) = t; r += 1
        }
        val nrm = orthogonalize(w, i)
        if (nrm > 1e-12) {
          var k = 0
          while (k < d) { u(i)(k) = w(k) / nrm; k += 1 }
          done = true
        }
      }
      if (!done) {
        // deterministic completion: the standard basis vector with the
        // LARGEST residual against the span built so far (Σ residual²
        // over all e_j is exactly d−i, so the max is ≥ √((d−i)/d) > 0 —
        // always completable; ties break to the lowest index). This
        // path is the NORM for the OPQ scatter, whose rank is bounded
        // by the codebook span (≤ m·(ksub−1)+1 < d in typical configs).
        var bestE = -1
        var bestN = 0.0
        var bestW: Array[Double] = null
        var e = 0
        while (e < d) {
          val w = new Array[Double](d)
          w(e) = 1.0
          val nrm = orthogonalize(w, i)
          if (nrm > bestN + 1e-15) { bestN = nrm; bestE = e; bestW = w }
          e += 1
        }
        require(bestE >= 0 && bestN > 1e-9,
          s"svdSquare: could not complete an orthonormal U basis (best residual $bestN)")
        var k = 0
        while (k < d) { u(i)(k) = bestW(k) / bestN; k += 1 }
        done = true
      }
      i += 1
    }
    (u, sig, v)
  }

  /** Declarative (pure-Catalyst) twin of [[embeddingCovariance]] — the
    * formulation the DuckDB oracle mirrors term for term, kept as the
    * cross-check the law tests pin the imperative pass against
    * (bit-identical output at any partition count).
    */
  private[graft] def embeddingCovarianceExpr(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val q = transform(col(vecCol), x => round(x.cast("double") * 1e6).cast("long"))
    val qdf = df.select(col(idCol).as("id"), q.as("__q"))
    // per-dim first-moment sums from a d-sized explode — the d²-sized
    // pair explode then carries ONLY the product, a third of the bytes
    val dims = qdf.select(posexplode(col("__q")).as(Seq("__i", "__qx")))
      .groupBy(col("__i").cast("long").as("i"))
      .agg(sum(col("__qx").cast("decimal(38,0)")).as("__s"))
    // the d² hot path explodes a PURE LONG ARRAY of products — no
    // per-pair struct allocation (measured ~1.7× over structs at the 10×
    // fixture); the (i, j) pair index is decoded AFTER the 2080-group
    // aggregation from the flattened position, arithmetically:
    //   rev = T−1−pos indexes the triangle from the end (block lengths
    //   1..d), r = ⌊(√(8·rev+1)−1)/2⌋ the reversed row. IEEE sqrt of a
    //   perfect square is exact (correctly-rounded), so the floors are
    //   boundary-safe and both engines decode identically.
    val g = qdf
      .select(posexplode(flatten(transform(sequence(lit(0), size(col("__q")) - 1), i =>
        transform(sequence(i, size(col("__q")) - 1), j =>
          element_at(col("__q"), i + 1) * element_at(col("__q"), j + 1)))))
        .as(Seq("__pos", "__qxy")))
      .groupBy("__pos").agg(
        count(lit(1)).as("n"),
        sum(col("__qxy").cast("decimal(38,0)")).as("__sxy"))
    val tot = g.agg((max(col("__pos")) + 1).cast("long").as("__T"))
    g.crossJoin(broadcast(tot))
      .withColumn("__rev", col("__T") - 1 - col("__pos"))
      .withColumn("__r", floor((sqrt(col("__rev").cast("double") * 8 + 1) - 1) / 2).cast("long"))
      .withColumn("__d", floor((sqrt(col("__T").cast("double") * 8 + 1) - 1) / 2).cast("long"))
      .withColumn("i", col("__d") - 1 - col("__r"))
      .withColumn("j",
        col("__d") - 1 - (col("__rev") - (col("__r") * (col("__r") + 1) / lit(2)).cast("long")))
      .join(broadcast(dims.select(col("i"), col("__s").as("__sx"))), Seq("i"))
      .join(broadcast(dims.select(col("i").as("j"), col("__s").as("__sy"))), Seq("j"))
      .select(col("i"), col("j"), col("n"),
        ((col("__sxy").cast("double") / 1e12
          - (col("__sx").cast("double") / 1e6) * (col("__sy").cast("double") / 1e6)
            / col("n")) / col("n")).as("cov"))
  }

  /** Driver-side PCA from a collected covariance frame: cyclic Jacobi
    * eigen-solver on the d×d matrix (d is the EMBEDDING width — 64-1024;
    * the corpus never touches the driver, only the d² statistic), top-k
    * eigenvectors by eigenvalue. Returns (eigenvalues, basis rows),
    * basis orthonormal, eigenvalues descending.
    */
  def pcaBasis(cov: DataFrame, k: Int): (Array[Double], Array[Array[Double]]) = {
    val rows = cov.select("i", "j", "cov").collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getDouble(2)))
    val d = rows.map(_._2).max + 1
    val a = Array.ofDim[Double](d, d)
    rows.foreach { case (i, j, c) => a(i)(j) = c; a(j)(i) = c }
    val (evals, vecs) = jacobiEigen(a)
    (evals.take(k), vecs.take(k))
  }

  /** Cyclic Jacobi eigen-solver on a symmetric d×d matrix (driver-side;
    * d is an embedding width, never a corpus size). Returns ALL d
    * (eigenvalue, eigenvector-components) pairs, eigenvalues descending,
    * eigenvectors orthonormal. Deterministic: fixed sweep order, fixed
    * convergence thresholds. MUTATES its argument (callers pass a local
    * copy).
    */
  private[graft] def jacobiEigen(
      a: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a.length
    val v = Array.tabulate(d, d)((r, c) => if (r == c) 1.0 else 0.0)
    // cyclic Jacobi: rotate away the largest off-diagonal until negligible
    var sweep = 0
    var off = Double.MaxValue
    while (off > 1e-12 && sweep < 100) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var r = p + 1
        while (r < d) {
          off = math.max(off, math.abs(a(p)(r)))
          if (math.abs(a(p)(r)) > 1e-14) {
            val theta = 0.5 * math.atan2(2 * a(p)(r), a(r)(r) - a(p)(p))
            val (c, s) = (math.cos(theta), math.sin(theta))
            var k2 = 0
            while (k2 < d) { // rotate rows/cols p and r of A
              val (akp, akr) = (a(k2)(p), a(k2)(r))
              a(k2)(p) = c * akp - s * akr
              a(k2)(r) = s * akp + c * akr
              k2 += 1
            }
            k2 = 0
            while (k2 < d) {
              val (apk, ark) = (a(p)(k2), a(r)(k2))
              a(p)(k2) = c * apk - s * ark
              a(r)(k2) = s * apk + c * ark
              val (vkp, vkr) = (v(k2)(p), v(k2)(r))
              v(k2)(p) = c * vkp - s * vkr
              v(k2)(r) = s * vkp + c * vkr
              k2 += 1
            }
          }
          r += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    (order.map(i => a(i)(i)).toArray,
      order.map(i => (0 until d).map(r => v(r)(i)).toArray).toArray)
  }

  /** Project embeddings onto a PCA basis (optionally mean-centered):
    * basis rows become LITERAL arrays in the plan — like the k-means
    * centroid assignment, no join, no shuffle, pure codegen'd projection.
    * Output: (idCol, proj: array<double>) with proj(k) = ⟨x − μ, b_k⟩.
    *
    * Each component is the NATIVE [[graft.functions.VectorExpressions
    * .dot_product]] (tight primitive codegen loop), not an interpreted
    * `aggregate(zip_with(...))` fold — at the 10× fixture the HOF form
    * spent ~2/3 of q_pca_topk's wall in per-element interpretation.
    * Bit-identical values: both widen to double before multiplying and
    * sum left-to-right. The centered source is BOUND as a lambda
    * variable (evaluated once per row); referencing it directly in all
    * k dot products would let CollapseProject re-evaluate the centering
    * k times (CSE never reaches inside the expression forest).
    */
  def projectEmbeddings(
      df: DataFrame, idCol: String, vecCol: String,
      basis: Array[Array[Double]], mean: Option[Array[Double]] = None): DataFrame = {
    def dots(src: Column): Column =
      array(basis.map(b => dot(src, array(b.map(lit): _*))): _*)
    val proj = mean match {
      case Some(m) =>
        val mLit = array(m.map(lit): _*)
        val centered = zip_with(transform(col(vecCol), v => v.cast("double")),
          mLit, (a, b) => a - b)
        flatten(transform(array(centered), c => dots(c)))
      case None => dots(col(vecCol)) // float array widens inside dot_product
    }
    df.select(col(idCol), proj.as("proj"))
  }

  /** Per-group embedding dispersion — mean squared euclidean distance
    * over all ordered pairs within a group (source, language, cluster),
    * the corpus-diversity statistic curation reads before deciding
    * whether a source adds variety or repeats itself. Computed WITHOUT
    * materializing pairs, via the identity
    * `Σ_{i≠j} ||x_i − x_j||² = 2n·Σ||x_i||² − 2·||Σx_i||²` — one pass for
    * the per-row norm sums, one per-dimension sum aggregation for the
    * group mean vector; cost is O(rows·dim), never O(rows²).
    *
    * Exactness (the q_kmeans_inertia discipline): components quantize to
    * integer micro-units; per-row Σq² stays in Long (|q| ≤ ~3e9 would be
    * needed to overflow — embedding components are unit-scale); the
    * squares of per-dimension SUMS go through decimal(38,0) (a
    * billion-row group's dimension sum squares past Long); the 6-dp
    * output is exact integer half-up division, so DuckDB replays it
    * bit-for-bit. Groups with one vector emit null dispersion.
    *
    * Output: (groupCol, n_vecs, dispersion) — dispersion in squared
    * original units.
    */
  def embeddingDispersion(
      df: DataFrame,
      groupCol: String,
      vecCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val q = transform(col(vecCol), x => round(x.cast("double") * 1e6, 0).cast("long"))
    val base = df.filter(col(vecCol).isNotNull)
      .select(col(groupCol).as("grp"), q.as("__q"))
    // per-row squared norm in micro²-units; Long-exact at unit scale
    val rows = base
      .withColumn("__s2", aggregate(col("__q"), lit(0L), (a, x) => a + x * x))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_vecs"), sum(col("__s2").cast(dec)).as("__S2"))
    // per-dimension sums, then Σ_d Sd² in decimal (Sd² can pass Long)
    val dimSums = base
      .select(col("grp"), posexplode(col("__q")).as(Seq("__d", "__qx")))
      .groupBy("grp", "__d").agg(sum(col("__qx")).as("__Sd"))
      .groupBy("grp")
      .agg(sum(col("__Sd").cast(dec) * col("__Sd").cast(dec)).as("__SS"))
    // dispersion = (2n·S2 − 2·ΣSd²) / (n(n−1)·1e12), emitted at 6 dp by
    // exact integer half-up division ((2a+b) div 2b)
    val den = (col("n_vecs") * (col("n_vecs") - 1)).cast(dec) * lit(1000000000000L).cast(dec)
    val num = (col("n_vecs").cast(dec) * col("__S2") - col("__SS")) * lit(2).cast(dec)
    // left join + zero-coalesce: a group whose vectors are all EMPTY
    // arrays emits no per-dimension rows, but its pairwise distances are
    // all 0 — it must report dispersion 0.0, not vanish
    rows.join(dimSums, Seq("grp"), "left")
      .withColumn("__SS", coalesce(col("__SS"), lit(0).cast(dec)))
      .withColumn("num6", num * lit(1000000L).cast(dec))
      .withColumn("den6", den)
      .withColumn("dispersion",
        when(col("n_vecs") > 1,
          expr("(num6 * 2 + den6) div (den6 * 2)").cast("double") / 1e6))
      .select(col("grp").as(groupCol), col("n_vecs"), col("dispersion"))
  }
}
