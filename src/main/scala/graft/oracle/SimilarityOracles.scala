package graft.oracle

import graft.pipeline.{Sampling, TextAnalysis}

/** DuckDB oracle twins for the Similarity query family — split out of
  * SparkEntry.oracleSql (r17, maintenance: the single file had reached
  * 4k lines). VERBATIM moves: every SQL string and helper is unchanged,
  * and the assembled map's key set is identical, so the Verify dump is
  * byte-identical. Portability rules are documented on SparkEntry.
  */
private[graft] object SimilarityOracles {

  /** Hoisted hyperplane lists for the sign-LSH oracle twins: ONE
    * MATERIALIZED single-row CTE of pre-divided DOUBLE lists (`pl.pN`),
    * cross-joined onto the scan that projects. Inlining each plane as a
    * list literal inside the projection lambda makes DuckDB re-construct
    * the 256-int list PER LAMBDA INVOCATION — measured 250x slower
    * (7.8s -> 0.03s on q_lsh_topk at sf0.01, identical rows). The
    * per-element arithmetic is unchanged (CAST(x AS DOUBLE) / 1000001.0
    * precomputed once per plane element, same sequential list_sum), so
    * the projections are bit-identical.
    */
  private[oracle] def planesCte(pls: Array[Array[Long]]): String =
    pls.zipWithIndex.map { case (ks, p) =>
      s"list_transform(${ks.mkString("[", ", ", "]")}, x -> CAST(x AS DOUBLE) / 1000001.0) AS p$p"
    }.mkString("pl AS MATERIALIZED (SELECT ", ",\n             ", ")")

  /** Nearest-centroid assignment CTE (squared euclidean, (dist, cl)
    * tie-break): `keep = 1` is k-means/corpus cell assignment, `keep > 1`
    * is the IVF probe ranking; `where` filters the assigned side.
    */
  private[oracle] def kmeansAssign(
      name: String, cents: String, dim: Int, keep: Int = 1, where: String = "",
      from: String = "dv", mat: Boolean = false): String =
    s"""$name AS ${if (mat) "MATERIALIZED " else ""}(
         SELECT vec_id, v, cl, dist FROM (
           SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS r FROM (
             SELECT d.vec_id, d.v, c.cl,
                    list_sum(list_transform(range(1, ${dim + 1}),
                      i -> (d.v[i] - c.cent[i]) * (d.v[i] - c.cent[i]))) AS dist
             FROM $from d CROSS JOIN $cents c$where))
         WHERE r <= $keep)"""

  /** Unrolled Lloyd's-iteration CTE chain (no leading WITH) — mirrors
    * [[graft.pipeline.Clustering.kmeansCentroids]] exactly: md5-ordered
    * init, squared-euclidean argmin with cluster-id tie-break,
    * per-dimension means rounded to 6 decimals, empty clusters keeping
    * their previous centroid. Ends at centroid table `c<iters>(cl, cent)`
    * — shared by the `q_kmeans` and `q_ivf_kmeans` oracles.
    */
  /** Default `dv` CTE: double-cast float embeddings. */
  private[oracle] val floatDvCte: String =
    """dv AS (
           SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings)"""

  /** `dv` CTE for the int8-quantized space ([[graft.pipeline.Similarity.quantizeInt8]]
    * twin): the kmeans chain and everything downstream then run on the
    * integer-valued vectors, mirroring the `ivfTopKInt8` composition.
    */
  private[oracle] val int8DvCte: String =
    """qz_dv AS (
           SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v0
           FROM embeddings),
         qz_ma AS (SELECT vec_id, v0, list_max(list_transform(v0, x -> abs(x))) AS ma FROM qz_dv),
         dv AS (
           SELECT vec_id,
                  CASE WHEN ma > 0 THEN list_transform(v0, x -> round(x / (ma / 127)))
                       ELSE list_transform(v0, x -> 0.0) END AS v
           FROM qz_ma)"""

  private[oracle] def kmeansCtes(k: Int, iters: Int, dim: Int): String =
    kmeansCtes(k, iters, dim, floatDvCte)
  private[oracle] def kmeansCtes(k: Int, iters: Int, dim: Int, dvCte: String): String =
    s"""$dvCte,
         ${chainCtes("", "dv", k, iters, dim)}"""

  /** One full Lloyd's chain with PREFIXED CTE names over an arbitrary
    * `(vec_id, v)` source table — `chainCtes("", "dv", …)` reproduces
    * [[kmeansCtes]]'s original text exactly; the PQ oracles instantiate
    * it once per subspace (`s0…`, `s1…`) over the per-subspace slice
    * CTEs. Ends at centroid table `<pfx>c<iters>(cl, cent)`.
    */
  private[oracle] def chainCtes(
      pfx: String, from: String, k: Int, iters: Int, dim: Int,
      mat: Boolean = false): String = {
    val matKw = if (mat) "MATERIALIZED " else ""
    def update(aName: String, prevC: String, mName: String, cName: String): String = {
      val meanCols = (1 to dim).map(i => s"round(avg(v[$i]), 6) AS d$i").mkString(", ")
      val centList = (1 to dim).map(i => s"m.d$i").mkString("[", ", ", "]")
      s"""$mName AS $matKw(SELECT cl, $meanCols FROM $aName GROUP BY cl),
         $cName AS $matKw(
           SELECT c.cl, CASE WHEN m.cl IS NULL THEN c.cent ELSE $centList END AS cent
           FROM $prevC c LEFT JOIN $mName m ON m.cl = c.cl)"""
    }
    val iterCtes = (0 until iters).map { i =>
      kmeansAssign(s"${pfx}a$i", s"${pfx}c$i", dim, from = from, mat = mat) + ",\n         " +
        update(s"${pfx}a$i", s"${pfx}c$i", s"${pfx}m$i", s"${pfx}c${i + 1}")
    }.mkString(",\n         ")
    s"""${pfx}c0 AS $matKw(
           SELECT CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS BIGINT) AS cl,
                  v AS cent
           FROM (SELECT vec_id, v FROM $from
                 ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $k)),
         $iterCtes"""
  }

  /** Shared PQ CTE stack: per-subspace slice views (`s<j>dv` — DuckDB
    * list slicing is 1-based inclusive, matching Spark's `slice(v,
    * j·ds+1, ds)`), one [[chainCtes]] codebook fit per subspace, one
    * corpus assignment per subspace, and the joined m-column code table
    * `enc(vec_id, c0…c<m-1>)` — mirrors
    * [[graft.pipeline.Similarity.pqEncode]].
    */
  private[oracle] def pqEncCtes(m: Int, ksub: Int, iters: Int, dim: Int): String =
    pqEncCtes(m, ksub, iters, dim, floatDvCte)
  private[oracle] def pqEncCtes(
      m: Int, ksub: Int, iters: Int, dim: Int, dvCte: String): String = {
    val ds = dim / m
    val subDvs = (0 until m).map { j =>
      s"s${j}dv AS (SELECT vec_id, v[${j * ds + 1}:${(j + 1) * ds}] AS v FROM dv)"
    }
    val chains = (0 until m).map(j => chainCtes(s"s$j", s"s${j}dv", ksub, iters, ds))
    val encs = (0 until m).map(j =>
      kmeansAssign(s"s${j}e", s"s${j}c$iters", ds, from = s"s${j}dv"))
    val encCols = (0 until m).map(j => s"e$j.cl AS c$j").mkString(", ")
    val encJoins = (1 until m).map(j => s" JOIN s${j}e e$j ON e$j.vec_id = e0.vec_id").mkString
    s"""WITH $dvCte,
         ${subDvs.mkString(",\n         ")},
         ${chains.mkString(",\n         ")},
         ${encs.mkString(",\n         ")},
         enc AS (SELECT e0.vec_id, $encCols FROM s0e e0$encJoins)"""
  }

  /** PQ code-table oracle — mirrors [[graft.pipeline.Similarity.pqEncode]]. */
  private[oracle] def pqCodesOracleSql(m: Int, ksub: Int, iters: Int, dim: Int): String =
    pqCodesOracleSql(m, ksub, iters, dim, floatDvCte)
  private[oracle] def pqCodesOracleSql(
      m: Int, ksub: Int, iters: Int, dim: Int, dvCte: String): String = {
    val cols = (0 until m).map(j => s"c$j").mkString(", ")
    s"""${pqEncCtes(m, ksub, iters, dim, dvCte)}
         SELECT vec_id, $cols FROM enc ORDER BY vec_id"""
  }

  /** PQ-ADC top-k oracle — mirrors [[graft.pipeline.Similarity.pqTopK]]:
    * per-subspace query-to-EVERY-codeword distances (keep = ksub), the
    * left-assoc m-term LUT sum, (adc asc, vec_id) ranking.
    */
  private[oracle] def pqTopKOracleSql(
      k: Int, m: Int, ksub: Int, iters: Int, dim: Int): String =
    pqTopKOracleSql(k, m, ksub, iters, dim, floatDvCte)
  private[oracle] def pqTopKOracleSql(
      k: Int, m: Int, ksub: Int, iters: Int, dim: Int, dvCte: String): String = {
    val ds = dim / m
    val qds = (0 until m).map(j =>
      kmeansAssign(s"s${j}q", s"s${j}c$iters", ds, keep = ksub,
        where = " WHERE d.vec_id < 10", from = s"s${j}dv"))
    val adc = (0 until m).map(j => s"q$j.dist").mkString(" + ")
    val qJoins = (1 until m)
      .map(j => s" JOIN s${j}q q$j ON q$j.vec_id = q0.vec_id AND q$j.cl = e.c$j")
      .mkString
    s"""${pqEncCtes(m, ksub, iters, dim, dvCte)},
         ${qds.mkString(",\n         ")},
         scored AS (
           SELECT q0.vec_id AS query_id, e.vec_id, $adc AS adc
           FROM enc e JOIN s0q q0 ON q0.cl = e.c0$qJoins
           WHERE e.vec_id <> q0.vec_id),
         r AS (
           SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc, vec_id) AS rank
           FROM scored)
         SELECT query_id, vec_id, round(adc, 6) AS adc_dist, CAST(rank AS BIGINT) AS rank
         FROM r WHERE rank <= $k ORDER BY query_id, rank"""
  }

  /** OPQ-ADC oracle — [[pqTopKOracleSql]] over a ROTATED `dv`: the
    * fitted rotation rows (published by the Spark evaluation, the
    * q_pca_topk pattern — the eigen solve + allocation are driver-side
    * and law-pinned, everything data-touching replays here) become
    * literal list rows, and the rotated components are the same
    * left-to-right Σ x_i·r_ki fold [[graft.pipeline.Similarity
    * .projectEmbeddings]] codegens, so the PQ chains downstream see
    * bit-identical inputs. `dv` is MATERIALIZED — the m subspace slices
    * would otherwise re-evaluate the d² rotation per reference.
    */
  private def rotatedDvCte(rotation: Array[Array[Double]], dim: Int): String = {
    val rows = rotation.zipWithIndex.map { case (r, i) =>
      r.mkString(s"($i, [", ", ", "])")
    }.mkString(",\n           ")
    s"""rot(comp, bv) AS (VALUES
           $rows),
         rl AS (SELECT list(bv ORDER BY comp) AS bs FROM rot),
         dv AS MATERIALIZED (
           SELECT vec_id,
                  list_transform(rl.bs, bv ->
                    list_sum(list_transform(range(1, ${dim + 1}),
                      i -> CAST(embedding[i] AS DOUBLE) * bv[i]))) AS v
           FROM embeddings CROSS JOIN rl)"""
  }

  private[graft] def opqTopKOracleSql(
      rotation: Array[Array[Double]],
      k: Int, m: Int, ksub: Int, iters: Int, dim: Int): String =
    pqTopKOracleSql(k, m, ksub, iters, dim, rotatedDvCte(rotation, dim))

  /** OPQ code-table oracle — [[pqCodesOracleSql]] over the rotated `dv`. */
  private[graft] def opqCodesOracleSql(
      rotation: Array[Array[Double]],
      m: Int, ksub: Int, iters: Int, dim: Int): String =
    pqCodesOracleSql(m, ksub, iters, dim, rotatedDvCte(rotation, dim))

  private[oracle] def kmeansOracleSql(k: Int, iters: Int, dim: Int): String =
    s"""WITH ${kmeansCtes(k, iters, dim)},
         ${kmeansAssign("af", s"c$iters", dim)}
         SELECT vec_id, cl AS cluster, round(dist, 6) AS dist
         FROM af ORDER BY vec_id"""

  /** Trained-IVF oracle: k-means codebook CTEs + corpus cell assignment
    * + nprobe query cells + exact cosine inside probed cells — mirrors
    * [[graft.pipeline.Similarity.ivfTopKTrained]].
    */
  private[oracle] def ivfKmeansOracleSql(
      k: Int, nlist: Int, nprobe: Int, iters: Int, dim: Int): String =
    ivfKmeansOracleSql(k, nlist, nprobe, iters, dim, floatDvCte)
  private[oracle] def ivfKmeansOracleSql(
      k: Int, nlist: Int, nprobe: Int, iters: Int, dim: Int, dvCte: String): String = {
    def norm(v: String) =
      s"sqrt(list_sum(list_transform(range(1, ${dim + 1}), i -> $v[i] * $v[i])))"
    s"""WITH ${kmeansCtes(nlist, iters, dim, dvCte)},
         ${kmeansAssign("ca", s"c$iters", dim)},
         cn AS (SELECT vec_id, v, cl AS cell, ${norm("v")} AS n FROM ca),
         ${kmeansAssign("qa", s"c$iters", dim, keep = nprobe, where = " WHERE d.vec_id < 10")},
         qn AS (SELECT vec_id AS query_id, v AS qv, cl AS cell, ${norm("v")} AS qn FROM qa),
         scored AS (
           SELECT q.query_id, c.vec_id,
                  list_sum(list_transform(range(1, ${dim + 1}),
                    i -> q.qv[i] * c.v[i])) / (q.qn * c.n) AS cos
           FROM cn c JOIN qn q USING (cell)
           WHERE c.vec_id <> q.query_id),
         r AS (
           SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
           FROM scored)
         SELECT query_id, vec_id, round(cos, 6) AS cos_sim, CAST(rank AS BIGINT) AS rank
         FROM r WHERE rank <= $k ORDER BY query_id, rank"""
  }

  /** IVF-PQ oracle — mirrors [[graft.pipeline.Similarity.ivfPqTopK]]:
    * coarse chain (`g` prefix) + corpus cell assignment + residual frame,
    * then one [[chainCtes]] PQ fit per RESIDUAL subspace, residual codes,
    * nprobe query cells with per-(query, cell) residual LUTs (cross join
    * to every codeword — no rank filter, the LUT needs them all), and
    * the left-assoc m-term ADC sum ranked (adc asc, vec_id).
    *
    * EVERY CTE here is MATERIALIZED (the q_ngram_jaccard precedent,
    * DedupOracles): without the hints DuckDB inlines the
    * multiply-referenced chains — `rdv` into all m subspace slices,
    * `gc<iters>` into four consumers, and each Lloyd's step's `c<i>`
    * into BOTH its assign and its update — so the coarse+residual
    * k-means work re-evaluates combinatorially per reference. Measured
    * at sf0.1: 95.1 s inlined → expected ~1 s materialized, identical
    * rows (the hint is semantics-neutral).
    */
  private[oracle] def ivfPqOracleSql(
      k: Int, nlist: Int, nprobe: Int, m: Int, ksub: Int, iters: Int, dim: Int): String = {
    val ds = dim / m
    def resList(a: String, c: String) =
      s"list_transform(range(1, ${dim + 1}), i -> $a.v[i] - $c.cent[i])"
    def subDist(q: String, c: String) =
      s"""list_sum(list_transform(range(1, ${ds + 1}),
                      i -> ($q.v[i] - $c.cent[i]) * ($q.v[i] - $c.cent[i])))"""
    val subRdvs = (0 until m).map { j =>
      s"s${j}rdv AS MATERIALIZED (SELECT vec_id, cell, v[${j * ds + 1}:${(j + 1) * ds}] AS v FROM rdv)"
    }
    val chains = (0 until m).map(j => chainCtes(s"s$j", s"s${j}rdv", ksub, iters, ds, mat = true))
    val encs = (0 until m).map(j =>
      kmeansAssign(s"s${j}e", s"s${j}c$iters", ds, from = s"s${j}rdv", mat = true))
    val encCols = (0 until m).map(j => s"e$j.cl AS c$j").mkString(", ")
    val encJoins = (1 until m).map(j => s" JOIN s${j}e e$j ON e$j.vec_id = e0.vec_id").mkString
    val qSubRdvs = (0 until m).map { j =>
      s"s${j}qr AS MATERIALIZED (SELECT vec_id, cell, v[${j * ds + 1}:${(j + 1) * ds}] AS v FROM qrdv)"
    }
    val qds = (0 until m).map { j =>
      s"""s${j}q AS MATERIALIZED (
           SELECT q.vec_id, q.cell, c.cl, ${subDist("q", "c")} AS dist
           FROM s${j}qr q CROSS JOIN s${j}c$iters c)"""
    }
    val adc = (0 until m).map(j => s"q$j.dist").mkString(" + ")
    val qJoins = (1 until m).map(j =>
      s" JOIN s${j}q q$j ON q$j.vec_id = q0.vec_id AND q$j.cell = e.cell AND q$j.cl = e.c$j")
      .mkString
    val matDvCte = floatDvCte.replaceFirst("dv AS \\(", "dv AS MATERIALIZED (")
    s"""WITH $matDvCte,
         ${chainCtes("g", "dv", nlist, iters, dim, mat = true)},
         ${kmeansAssign("gca", s"gc$iters", dim, mat = true)},
         rdv AS MATERIALIZED (
           SELECT a.vec_id, a.cl AS cell, ${resList("a", "c")} AS v
           FROM gca a JOIN gc$iters c ON c.cl = a.cl),
         ${subRdvs.mkString(",\n         ")},
         ${chains.mkString(",\n         ")},
         ${encs.mkString(",\n         ")},
         enc AS MATERIALIZED (SELECT e0.vec_id, r.cell, $encCols
                 FROM s0e e0$encJoins JOIN rdv r ON r.vec_id = e0.vec_id),
         ${kmeansAssign("gqa", s"gc$iters", dim, keep = nprobe, where = " WHERE d.vec_id < 10", mat = true)},
         qrdv AS MATERIALIZED (
           SELECT a.vec_id, a.cl AS cell, ${resList("a", "c")} AS v
           FROM gqa a JOIN gc$iters c ON c.cl = a.cl),
         ${qSubRdvs.mkString(",\n         ")},
         ${qds.mkString(",\n         ")},
         scored AS (
           SELECT q0.vec_id AS query_id, e.vec_id, $adc AS adc
           FROM enc e
           JOIN s0q q0 ON q0.cell = e.cell AND q0.cl = e.c0$qJoins
           WHERE e.vec_id <> q0.vec_id),
         r AS (
           SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc, vec_id) AS rank
           FROM scored)
         SELECT query_id, vec_id, round(adc, 6) AS adc_dist, CAST(rank AS BIGINT) AS rank
         FROM r WHERE rank <= $k ORDER BY query_id, rank"""
  }

  def sql: Map[String, String] = Map(
    "q_embed_dedup" ->
      """WITH a AS (SELECT vec_id AS id_a, embedding AS va, label FROM embeddings),
         b AS (SELECT vec_id AS id_b, embedding AS vb, label FROM embeddings),
         p AS (
           SELECT id_a, id_b,
             list_sum(list_transform(range(1, len(va) + 1),
               i -> CAST(va[i] AS DOUBLE) * CAST(vb[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(range(1, len(va) + 1),
                  i -> CAST(va[i] AS DOUBLE) * CAST(va[i] AS DOUBLE))))
              * sqrt(list_sum(list_transform(range(1, len(vb) + 1),
                  i -> CAST(vb[i] AS DOUBLE) * CAST(vb[i] AS DOUBLE))))) AS cos
           FROM a JOIN b USING (label) WHERE id_a < id_b)
         SELECT id_a, id_b, round(cos, 6) AS cos_sim
         FROM p WHERE cos >= 0.35 ORDER BY id_a, id_b""",

    // the pairwise-distance identity replayed on exact integer sums —
    // HUGEINT squares of dimension sums, same half-up 6-dp division
    "q_embed_dispersion" ->
      """WITH e AS (
           SELECT label, list_transform(embedding,
                    x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
           FROM embeddings WHERE embedding IS NOT NULL),
         r AS (SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
                      sum(CAST(list_sum(list_transform(q, x -> x * x)) AS HUGEINT)) AS s2
               FROM e GROUP BY 1),
         dx AS (SELECT label, unnest(range(0, len(q))) AS d, unnest(q) AS qx FROM e),
         ds AS (SELECT label, d, sum(qx) AS sd FROM dx GROUP BY 1, 2),
         ss AS (SELECT label, sum(CAST(sd AS HUGEINT) * CAST(sd AS HUGEINT)) AS ssq
                FROM ds GROUP BY 1),
         j AS (SELECT r.label, n_vecs,
                      (CAST(n_vecs AS HUGEINT) * coalesce(s2, 0) - coalesce(ssq, 0)) * 2 AS num,
                      CAST(n_vecs AS HUGEINT) * (n_vecs - 1) * 1000000000000 AS den
               FROM r LEFT JOIN ss ON r.label = ss.label)
         SELECT label, n_vecs,
                CASE WHEN n_vecs > 1
                     THEN CAST((num * 1000000 * 2 + den) // (den * 2) AS DOUBLE) / 1000000
                     ELSE NULL END AS dispersion
         FROM j ORDER BY label""",

    "q_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
         c AS (SELECT vec_id, embedding AS cv FROM embeddings),
         s AS (
           SELECT query_id, vec_id,
             list_sum(list_transform(range(1, len(qv) + 1),
               i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(range(1, len(qv) + 1),
                  i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
              * sqrt(list_sum(list_transform(range(1, len(cv) + 1),
                  i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE))))) AS cos
           FROM c CROSS JOIN q WHERE vec_id <> query_id),
         r AS (
           SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
           FROM s)
         SELECT query_id, vec_id, round(cos, 6) AS cos_sim, CAST(rank AS BIGINT) AS rank
         FROM r WHERE rank <= 5 ORDER BY query_id, rank""",

    "q_curate_diverse" -> {
      import graft.functions.PortableHash.sqlHashMod
      val divScore = Sampling.sqlHashScore("af.vec_id", "curate-div")
      val packScore = Sampling.sqlHashScore("doc_id", "curate-pack")
      val dvCte =
        """base AS (
           SELECT doc_id, lang,
                  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens,
                  md5(text) AS h
           FROM documents),
         g AS (SELECT * FROM base WHERE n_tokens >= 5),
         dd AS (SELECT doc_id, lang, n_tokens FROM (
                  SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn FROM g)
                WHERE rn = 1),
         dv AS (SELECT e.vec_id, list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS v
                FROM embeddings e JOIN dd ON dd.doc_id = e.vec_id)"""
      s"""WITH ${kmeansCtes(4, 2, 64, dvCte)},
         ${kmeansAssign("af", "c2", 64)},
         sz AS (SELECT cl, count(*) AS n FROM af GROUP BY cl),
         kept AS (
           SELECT af.vec_id AS doc_id, af.cl AS cluster
           FROM af JOIN sz ON sz.cl = af.cl
           WHERE $divScore < least(1.0, 32.0 / sz.n)),
         kd AS (SELECT k.doc_id, k.cluster, dd.lang, dd.n_tokens
                FROM kept k JOIN dd ON dd.doc_id = k.doc_id),
         sh AS (SELECT doc_id, cluster, lang, n_tokens,
                  (${sqlHashMod("('curate-pack:' || CAST(doc_id AS VARCHAR))")} % 4) AS shard,
                  $packScore AS pscore
                FROM kd),
         w AS (SELECT doc_id, cluster, lang, n_tokens, shard,
                  CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY shard
                    ORDER BY pscore, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
               FROM sh)
         SELECT doc_id, lang, n_tokens, cluster, shard, start_off,
                CAST(start_off // 512 AS BIGINT) AS pack_first,
                CAST((start_off + n_tokens - 1) // 512 AS BIGINT) AS pack_last
         FROM w ORDER BY doc_id"""
    },

    "q_ivf_topk" ->
      """WITH dotv AS (
           SELECT vec_id, embedding AS v,
                  sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
                    i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS n
           FROM embeddings),
         cents AS (
           SELECT CAST(vec_id AS VARCHAR) AS cid, v AS cent, n AS cn0
           FROM dotv WHERE n > 0
           ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 16),
         cscore AS (
           SELECT d.vec_id, c.cid AS cell,
                  row_number() OVER (PARTITION BY d.vec_id ORDER BY
                    list_sum(list_transform(range(1, len(d.v) + 1),
                      i -> CAST(d.v[i] AS DOUBLE) * CAST(c.cent[i] AS DOUBLE))) / (d.n * c.cn0) DESC,
                    c.cid) AS r
           FROM dotv d CROSS JOIN cents c),
         cassign AS (SELECT vec_id, cell FROM cscore WHERE r = 1),
         qscore AS (
           SELECT d.vec_id AS query_id, c.cid AS cell,
                  row_number() OVER (PARTITION BY d.vec_id ORDER BY
                    list_sum(list_transform(range(1, len(d.v) + 1),
                      i -> CAST(d.v[i] AS DOUBLE) * CAST(c.cent[i] AS DOUBLE))) / (d.n * c.cn0) DESC,
                    c.cid) AS r
           FROM dotv d CROSS JOIN cents c WHERE d.vec_id < 10),
         qcells AS (SELECT query_id, cell FROM qscore WHERE r <= 2),
         cand AS (
           SELECT q.query_id, ca.vec_id
           FROM qcells q JOIN cassign ca ON ca.cell = q.cell
           WHERE ca.vec_id <> q.query_id),
         scored AS (
           SELECT cand.query_id, cand.vec_id,
                  list_sum(list_transform(range(1, len(qd.v) + 1),
                    i -> CAST(qd.v[i] AS DOUBLE) * CAST(cd.v[i] AS DOUBLE))) / (qd.n * cd.n) AS cos
           FROM cand
           JOIN dotv qd ON qd.vec_id = cand.query_id
           JOIN dotv cd ON cd.vec_id = cand.vec_id),
         r AS (
           SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
           FROM scored)
         SELECT query_id, vec_id, round(cos, 6) AS cos_sim, CAST(rank AS BIGINT) AS rank
         FROM r WHERE rank <= 5 ORDER BY query_id, rank""",

    "q_lsh_topk" -> {
      import graft.functions.PortableHash.planeInts
      // Same plane width as the Spark side (Similarity.MaxDim, sliced to
      // the vector length by list_transform's range) — a narrower
      // hardcoded width would silently truncate the projection for
      // wider-than-64-dim embeddings and diverge from Spark.
      val pls = planeInts(8, graft.pipeline.Similarity.MaxDim)
      def proj(p: Int): String =
        s"list_sum(list_transform(range(1, len(v) + 1), i -> CAST(v[i] AS DOUBLE) * pl.p$p[i]))"
      val bucketExpr = (0 until 8).map { p =>
        s"CASE WHEN ${proj(p)} >= 0 THEN ${1L << p} ELSE 0 END"
      }.mkString("(", "\n                + ", ")")
      s"""WITH ${planesCte(pls)},
         cb AS MATERIALIZED (
           SELECT vec_id, embedding AS v,
                  CAST($bucketExpr AS BIGINT) AS bucket
           FROM embeddings, pl),
         q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM cb WHERE vec_id < 10),
         s AS (
           SELECT query_id, c.vec_id,
             list_sum(list_transform(range(1, len(qv) + 1),
               i -> CAST(qv[i] AS DOUBLE) * CAST(c.v[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(range(1, len(qv) + 1),
                  i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
              * sqrt(list_sum(list_transform(range(1, len(c.v) + 1),
                  i -> CAST(c.v[i] AS DOUBLE) * CAST(c.v[i] AS DOUBLE))))) AS cos
           FROM cb c JOIN q USING (bucket) WHERE c.vec_id <> query_id),
         r AS (
           SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
           FROM s)
         SELECT query_id, vec_id, round(cos, 6) AS cos_sim, CAST(rank AS BIGINT) AS rank
         FROM r WHERE rank <= 5 ORDER BY query_id, rank"""
    },

    // recall@k = |lsh top-5 ∩ exact top-5| / 5 per query: composes the
    // q_lsh_topk and q_cosine_topk chains (both hash-matched on their own)
    "q_ann_recall" -> {
      import graft.functions.PortableHash.planeInts
      val pls = planeInts(8, graft.pipeline.Similarity.MaxDim)
      def proj(p: Int): String =
        s"list_sum(list_transform(range(1, len(v) + 1), i -> CAST(v[i] AS DOUBLE) * pl.p$p[i]))"
      val bucketExpr = (0 until 8).map { p =>
        s"CASE WHEN ${proj(p)} >= 0 THEN ${1L << p} ELSE 0 END"
      }.mkString("(", "\n                + ", ")")
      s"""WITH ${planesCte(pls)},
         cb AS MATERIALIZED (
           SELECT vec_id, embedding AS v,
                  CAST($bucketExpr AS BIGINT) AS bucket
           FROM embeddings, pl),
         lq AS (SELECT vec_id AS query_id, v AS qv, bucket FROM cb WHERE vec_id < 10),
         ls AS (
           SELECT query_id, c.vec_id,
             list_sum(list_transform(range(1, len(qv) + 1),
               i -> CAST(qv[i] AS DOUBLE) * CAST(c.v[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(range(1, len(qv) + 1),
                  i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
              * sqrt(list_sum(list_transform(range(1, len(c.v) + 1),
                  i -> CAST(c.v[i] AS DOUBLE) * CAST(c.v[i] AS DOUBLE))))) AS cos
           FROM cb c JOIN lq USING (bucket) WHERE c.vec_id <> query_id),
         lr AS (
           SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
           FROM ls),
         approx AS (SELECT query_id, vec_id FROM lr WHERE rank <= 5),
         eq AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
         es AS (
           SELECT query_id, c.vec_id,
             list_sum(list_transform(range(1, len(qv) + 1),
               i -> CAST(qv[i] AS DOUBLE) * CAST(c.v[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(range(1, len(qv) + 1),
                  i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
              * sqrt(list_sum(list_transform(range(1, len(c.v) + 1),
                  i -> CAST(c.v[i] AS DOUBLE) * CAST(c.v[i] AS DOUBLE))))) AS cos
           FROM cb c CROSS JOIN eq WHERE c.vec_id <> query_id),
         er AS (
           SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
           FROM es),
         exact AS (SELECT query_id, vec_id FROM er WHERE rank <= 5)
         SELECT e.query_id,
                CAST(count(*) AS BIGINT) AS n_exact,
                CAST(count(a.vec_id) AS BIGINT) AS n_hit,
                round(CAST(count(a.vec_id) AS DOUBLE) / count(*), 6) AS recall
         FROM exact e LEFT JOIN approx a
           ON a.query_id = e.query_id AND a.vec_id = e.vec_id
         GROUP BY e.query_id ORDER BY e.query_id"""
    },

    "q_kmeans" -> kmeansOracleSql(k = 8, iters = 2, dim = 64),

    "q_kmeans_inertia" ->
      s"""WITH ${kmeansCtes(8, 2, 64)},
         ${kmeansAssign("af", "c2", 64)},
         g AS (
           -- sum in integer micro-units: exact and order-independent, the
           -- same construction as Clustering.clusterMetrics — a float sum
           -- can land one ulp either side of a rounding boundary depending
           -- on partial-aggregation order
           SELECT cl AS cluster, count(*) AS n_points,
                  sum(CAST(round(round(dist, 6) * 1000000) AS BIGINT)) AS micro,
                  max(round(dist, 6)) AS max_sqdist
           FROM af GROUP BY 1)
         SELECT cluster, n_points,
                round(CAST(n_points AS DOUBLE) / sum(n_points) OVER (), 6) AS share,
                round(CAST(micro AS DOUBLE) / 1000000.0, 6) AS inertia,
                round(CAST(micro AS DOUBLE) / 1000000.0 / n_points, 6) AS mean_sqdist,
                max_sqdist
         FROM g ORDER BY cluster""",

    "q_lsh_int8" -> {
      import graft.functions.PortableHash.planeInts
      val pls = planeInts(8, graft.pipeline.Similarity.MaxDim)
      def proj(p: Int): String =
        s"list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * pl.p$p[i]))"
      val bucketExpr = (0 until 8).map { p =>
        s"CASE WHEN ${proj(p)} >= 0 THEN ${1L << p} ELSE 0 END"
      }.mkString("(", "\n                + ", ")")
      s"""WITH ${planesCte(pls)},
         dv AS (
           SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS ma FROM dv),
         qz AS (
           SELECT vec_id,
                  CASE WHEN ma > 0
                       THEN list_transform(v, x -> round(x / (ma / 127)))
                       ELSE list_transform(v, x -> 0.0) END AS qv
           FROM m),
         cb AS MATERIALIZED (SELECT vec_id, qv, CAST($bucketExpr AS BIGINT) AS bucket FROM qz, pl),
         q AS (SELECT vec_id AS query_id, qv AS qq, bucket FROM cb WHERE vec_id < 10),
         s AS (
           SELECT query_id, c.vec_id,
             list_sum(list_transform(range(1, len(qq) + 1), i -> qq[i] * c.qv[i]))
             / (sqrt(list_sum(list_transform(range(1, len(qq) + 1), i -> qq[i] * qq[i])))
              * sqrt(list_sum(list_transform(range(1, len(c.qv) + 1), i -> c.qv[i] * c.qv[i])))) AS cos
           FROM cb c JOIN q USING (bucket) WHERE c.vec_id <> query_id),
         r AS (
           SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
           FROM s)
         SELECT query_id, vec_id, round(cos, 6) AS cos_sim, CAST(rank AS BIGINT) AS rank
         FROM r WHERE rank <= 5 ORDER BY query_id, rank"""
    },

    "q_ann_rerank" -> {
      // int8 LSH shortlist (rank <= 10; q_lsh_int8's machinery) re-scored
      // with exact float cosine, top-5 per query in exact order
      import graft.functions.PortableHash.planeInts
      val pls = planeInts(8, graft.pipeline.Similarity.MaxDim)
      def proj(p: Int): String =
        s"list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * pl.p$p[i]))"
      val bucketExpr = (0 until 8).map { p =>
        s"CASE WHEN ${proj(p)} >= 0 THEN ${1L << p} ELSE 0 END"
      }.mkString("(", "\n                + ", ")")
      s"""WITH ${planesCte(pls)},
         dv AS MATERIALIZED (
           SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS ma FROM dv),
         qz AS (
           SELECT vec_id,
                  CASE WHEN ma > 0
                       THEN list_transform(v, x -> round(x / (ma / 127)))
                       ELSE list_transform(v, x -> 0.0) END AS qv
           FROM m),
         cb AS MATERIALIZED (SELECT vec_id, qv, CAST($bucketExpr AS BIGINT) AS bucket FROM qz, pl),
         q AS (SELECT vec_id AS query_id, qv AS qq, bucket FROM cb WHERE vec_id < 10),
         s AS (
           SELECT query_id, c.vec_id,
             list_sum(list_transform(range(1, len(qq) + 1), i -> qq[i] * c.qv[i]))
             / (sqrt(list_sum(list_transform(range(1, len(qq) + 1), i -> qq[i] * qq[i])))
              * sqrt(list_sum(list_transform(range(1, len(c.qv) + 1), i -> c.qv[i] * c.qv[i])))) AS cos
           FROM cb c JOIN q USING (bucket) WHERE c.vec_id <> query_id),
         r AS (
           SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
           FROM s),
         short AS (SELECT query_id, vec_id FROM r WHERE rank <= 10),
         fv AS (
           SELECT vec_id, v,
                  sqrt(list_sum(list_transform(range(1, len(v) + 1), i -> v[i] * v[i]))) AS n
           FROM dv),
         rescored AS (
           SELECT sh.query_id, sh.vec_id,
                  list_sum(list_transform(range(1, len(qf.v) + 1),
                    i -> qf.v[i] * cf.v[i])) / (qf.n * cf.n) AS cos
           FROM short sh
           JOIN fv qf ON qf.vec_id = sh.query_id
           JOIN fv cf ON cf.vec_id = sh.vec_id),
         rr AS (
           SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
           FROM rescored)
         SELECT query_id, vec_id, round(cos, 6) AS cos_sim, CAST(rank AS BIGINT) AS rank
         FROM rr WHERE rank <= 5 ORDER BY query_id, rank"""
    },

    "q_embed_cov" ->
      """WITH e AS (
           SELECT vec_id,
                  list_transform(embedding,
                    x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
           FROM embeddings),
         d1 AS (
           SELECT i, sum(qx) AS sx
           FROM (SELECT unnest(range(0, len(q))) AS i, unnest(q) AS qx FROM e)
           GROUP BY i),
         -- pure-long-array hot path; (i, j) decoded from the flattened
         -- position (exact: IEEE sqrt of perfect squares) — mirrors
         -- Similarity.embeddingCovariance
         p AS (
           SELECT unnest(range(0, len(q) * (len(q) + 1) // 2)) AS pos,
                  unnest(flatten(list_transform(range(0, len(q)), i ->
                    list_transform(range(i, len(q)), j -> q[i+1] * q[j+1])))) AS qxy
           FROM e),
         g AS (SELECT pos, count(*) AS n, sum(qxy) AS sxy FROM p GROUP BY pos),
         t AS (SELECT max(pos) + 1 AS T FROM g),
         ix AS (
           SELECT pos, n, sxy, T,
                  T - 1 - pos AS rev,
                  CAST(floor((sqrt(CAST(T - 1 - pos AS DOUBLE) * 8 + 1) - 1) / 2) AS BIGINT) AS r,
                  CAST(floor((sqrt(CAST(T AS DOUBLE) * 8 + 1) - 1) / 2) AS BIGINT) AS d
           FROM g CROSS JOIN t),
         f AS (
           SELECT d - 1 - r AS i,
                  d - 1 - (rev - CAST(r * (r + 1) / 2 AS BIGINT)) AS j,
                  n, sxy
           FROM ix)
         SELECT CAST(f.i AS BIGINT) AS i, CAST(f.j AS BIGINT) AS j, CAST(n AS BIGINT) AS n,
                round((CAST(sxy AS DOUBLE) / 1000000000000.0
                      - (CAST(a.sx AS DOUBLE) / 1000000.0) * (CAST(b.sx AS DOUBLE) / 1000000.0)
                        / n) / n, 9) AS cov
         FROM f JOIN d1 a ON f.i = a.i JOIN d1 b ON f.j = b.i
         ORDER BY i, j""",

    "q_quantize_embed" ->
      """WITH dv AS (
           SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS ma FROM dv),
         q AS (
           SELECT vec_id, round(ma / 127, 9) AS scale,
                  CASE WHEN ma > 0
                       THEN list_transform(v, x -> CAST(round(x / (ma / 127)) AS BIGINT))
                       ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS qv
           FROM m),
         e AS (SELECT vec_id, scale, qv, unnest(range(1, len(qv) + 1)) AS dim FROM q)
         SELECT vec_id, CAST(dim AS BIGINT) AS dim, qv[dim] AS qval, scale
         FROM e ORDER BY vec_id, dim""",

    "q_semantic_dedup" -> {
      // mirrors Dedup.semanticDedup(k=8, iters=2, tau=0.4, subPlanes=8,
      // subProbes=2): block key = (cluster, sign-LSH bucket); the
      // lower-id side probes base + 1 lowest-margin flip (multi-probe)
      val dim = 64
      val subPlanes = 8
      val subProbes = 2
      import graft.functions.PortableHash.planeInts
      val pls = planeInts(subPlanes, graft.pipeline.Similarity.MaxDim)
      def proj(p: Int): String =
        s"list_sum(list_transform(range(1, len(v) + 1), i -> CAST(v[i] AS DOUBLE) * pl.p$p[i]))"
      val bucketExpr = (0 until subPlanes).map { p =>
        s"CASE WHEN ${proj(p)} >= 0 THEN ${1L << p} ELSE 0 END"
      }.mkString("(", "\n                + ", ")")
      val projUnion = (0 until subPlanes).map { p =>
        s"SELECT vec_id, $p AS j, ${proj(p)} AS pr FROM n, pl"
      }.mkString("\n           UNION ALL ")
      def norm(v: String) =
        s"sqrt(list_sum(list_transform(range(1, ${dim + 1}), i -> $v[i] * $v[i])))"
      s"""WITH ${planesCte(pls)},
         ${kmeansCtes(8, 2, dim)},
         ${kmeansAssign("af", "c2", dim)},
         n AS MATERIALIZED (SELECT vec_id, v, cl, ${norm("v")} AS nrm,
                      CAST($bucketExpr AS BIGINT) AS bucket
               FROM af, pl),
         pj AS ($projUnion),
         fl AS (
           SELECT vec_id, j,
                  row_number() OVER (PARTITION BY vec_id ORDER BY abs(pr), j) AS r
           FROM pj),
         ap AS (
           SELECT vec_id, v, cl, nrm, bucket FROM n
           UNION ALL
           SELECT n.vec_id, n.v, n.cl, n.nrm,
                  xor(n.bucket, CAST(pow(2, f.j) AS BIGINT)) AS bucket
           FROM n JOIN fl f ON f.vec_id = n.vec_id WHERE f.r <= ${subProbes - 1}),
         dups AS (
           SELECT b.vec_id, min(a.vec_id) AS dup_of
           FROM ap a JOIN n b
             ON a.cl = b.cl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
           WHERE a.nrm > 0 AND b.nrm > 0
             AND list_sum(list_transform(range(1, ${dim + 1}),
                   i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm) > 0.4
           GROUP BY b.vec_id)
         SELECT n.vec_id, n.cl AS cluster, d.dup_of, (d.dup_of IS NULL) AS keep
         FROM n LEFT JOIN dups d ON d.vec_id = n.vec_id
         ORDER BY n.vec_id"""
    },

    "q_ivf_kmeans" -> ivfKmeansOracleSql(k = 5, nlist = 8, nprobe = 2, iters = 2, dim = 64),

    "q_ivf_int8" -> ivfKmeansOracleSql(k = 5, nlist = 8, nprobe = 2, iters = 2, dim = 64, int8DvCte),

    "q_pq_codes" -> pqCodesOracleSql(m = 4, ksub = 8, iters = 2, dim = 64),

    "q_pq_topk" -> pqTopKOracleSql(k = 5, m = 4, ksub = 8, iters = 2, dim = 64),

    "q_ivfpq_topk" -> ivfPqOracleSql(k = 5, nlist = 8, nprobe = 2, m = 4, ksub = 8, iters = 2, dim = 64),

    "q_diversity_sample" -> {
      val score = graft.pipeline.Sampling.sqlHashScore("vec_id", "diversity")
      s"""WITH ${kmeansCtes(8, 2, 64)},
         ${kmeansAssign("af", "c2", 64)},
         sz AS (SELECT cl, count(*) AS n FROM af GROUP BY cl)
         SELECT af.vec_id, af.cl AS cluster,
                ($score < least(1.0, 16.0 / sz.n)) AS keep
         FROM af JOIN sz ON sz.cl = af.cl
         ORDER BY af.vec_id"""
    },

    "q_lsh_multiprobe" -> {
      import graft.functions.PortableHash.planeInts
      val nPlanes = 8
      val nProbes = 3
      val pls = planeInts(nPlanes, graft.pipeline.Similarity.MaxDim)
      def proj(p: Int): String =
        s"list_sum(list_transform(range(1, len(v) + 1), i -> CAST(v[i] AS DOUBLE) * pl.p$p[i]))"
      val bucketExpr = (0 until nPlanes).map { p =>
        s"CASE WHEN ${proj(p)} >= 0 THEN ${1L << p} ELSE 0 END"
      }.mkString("(", "\n                + ", ")")
      // per-plane projections of the QUERY vectors only, long form — the
      // row_number over (abs(proj), bit) is the flip order
      val projUnion = (0 until nPlanes).map { p =>
        s"SELECT vec_id, $p AS j, ${proj(p)} AS pr FROM eb, pl WHERE vec_id < 10"
      }.mkString("\n           UNION ALL ")
      s"""WITH ${planesCte(pls)},
         eb AS (SELECT vec_id, embedding AS v FROM embeddings),
         cb AS MATERIALIZED (SELECT vec_id, v, CAST($bucketExpr AS BIGINT) AS bucket FROM eb, pl),
         q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM cb WHERE vec_id < 10),
         pj AS ($projUnion),
         fl AS (
           SELECT vec_id, j,
                  row_number() OVER (PARTITION BY vec_id ORDER BY abs(pr), j) AS r
           FROM pj),
         qp AS (
           SELECT query_id, qv, bucket FROM q
           UNION ALL
           SELECT q.query_id, q.qv, xor(q.bucket, CAST(pow(2, f.j) AS BIGINT)) AS bucket
           FROM q JOIN fl f ON f.vec_id = q.query_id WHERE f.r <= ${nProbes - 1}),
         s AS (
           SELECT query_id, c.vec_id,
             list_sum(list_transform(range(1, len(qv) + 1),
               i -> CAST(qv[i] AS DOUBLE) * CAST(c.v[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(range(1, len(qv) + 1),
                  i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
              * sqrt(list_sum(list_transform(range(1, len(c.v) + 1),
                  i -> CAST(c.v[i] AS DOUBLE) * CAST(c.v[i] AS DOUBLE))))) AS cos
           FROM cb c JOIN qp USING (bucket) WHERE c.vec_id <> query_id),
         r AS (
           SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
           FROM s)
         SELECT query_id, vec_id, round(cos, 6) AS cos_sim, CAST(rank AS BIGINT) AS rank
         FROM r WHERE rank <= 5 ORDER BY query_id, rank"""
    },

  )
}
