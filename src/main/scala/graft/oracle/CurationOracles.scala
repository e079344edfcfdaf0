package graft.oracle

import graft.pipeline.{Sampling, TextAnalysis}

/** DuckDB oracle twins for the Curation query family — split out of
  * SparkEntry.oracleSql (r17, maintenance: the single file had reached
  * 4k lines). VERBATIM moves: every SQL string and helper is unchanged,
  * and the assembled map's key set is identical, so the Verify dump is
  * byte-identical. Portability rules are documented on SparkEntry.
  */
private[graft] object CurationOracles {
  import DedupOracles.{minhashSimsCtes}

  /** Shared CTE chain of the DSIR twins (q_dsir_scores / q_dsir_sample):
    * hashed uni+bigram feature buckets (MATERIALIZED — feeds the raw
    * counts, target counts, totals, AND per-doc counts), Laplace-smoothed
    * per-bucket log-ratios quantized to integer micro-units, per-doc
    * integer score sums. Mirrors Curation.featureBuckets/dsirLogRatios/
    * dsirScores with target = the doc_id%7==0 slice and B = 4096.
    */
  /** Unrolled logistic-regression training (Classifier.trainLogReg
    * twin): hashed uni+bigram buckets (B=256, the DSIR feature
    * machinery) plus the intercept bucket 256 (hit once per doc),
    * per-doc residuals quantized to integer micro-units, HUGEINT
    * gradient sums, weight updates rounded to micro-units — the same
    * exact-integer arithmetic Spark runs, so the learned weights match
    * bit for bit. `iters` GD steps are emitted as unrolled CTE blocks;
    * the final weights CTE is always `wf`.
    */
  private[oracle] def logregCtes(iters: Int, lr: Double, B: Int = 256): String = {
    import graft.functions.PortableHash.{sqlHashMod, P}
    val header = s"""d0 AS (
           SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
           FROM documents),
         h0 AS (
           SELECT doc_id, list_transform(toks, t -> ${sqlHashMod("t")}) AS hs
           FROM d0),
         f0 AS (
           SELECT doc_id,
                  list_concat(hs,
                    CASE WHEN len(hs) >= 2
                         THEN list_transform(range(1, len(hs)),
                                i -> (hs[i] * 31 + hs[i + 1]) % $P)
                         ELSE CAST([] AS BIGINT[]) END) AS feats
           FROM h0),
         fb AS (SELECT doc_id, (f % $B) AS b
                FROM (SELECT doc_id, unnest(feats) AS f FROM f0)),
         -- bucket $B is the intercept: one hit per document
         pd AS MATERIALIZED (
           SELECT doc_id, b, count(*) AS cnt FROM fb GROUP BY 1, 2
           UNION ALL SELECT doc_id, $B AS b, 1 AS cnt FROM documents),
         lab AS (SELECT doc_id, CASE WHEN n_chars >= 250 THEN 1.0 ELSE 0.0 END AS y
                 FROM documents),
         nn AS (SELECT count(*) AS n FROM documents)"""
    val steps = (1 to iters).map { k =>
      val resid =
        if (k == 1)
          s"""r1 AS (SELECT doc_id, CAST(round((0.5 - y) * 1e6) AS BIGINT) AS rm FROM lab)"""
        else
          s"""m$k AS (SELECT pd.doc_id,
                       CAST(sum(CAST(pd.cnt AS HUGEINT) * w${k - 1}.w) AS DOUBLE) / 1e6 AS m
                FROM pd JOIN w${k - 1} USING (b) GROUP BY pd.doc_id),
         r$k AS (SELECT lab.doc_id,
                       CAST(round((round(1.0 / (1.0 + exp(-(coalesce(m, 0.0)))), 6) - y)
                                  * 1e6) AS BIGINT) AS rm
                FROM lab LEFT JOIN m$k ON m$k.doc_id = lab.doc_id)"""
      val update =
        if (k == 1)
          s"""w1 AS MATERIALIZED (
           SELECT b, 0 - CAST(round($lr * CAST(g AS DOUBLE) / n) AS BIGINT) AS w
           FROM g1 CROSS JOIN nn)"""
        else
          s"""w$k AS MATERIALIZED (
           SELECT w${k - 1}.b, w${k - 1}.w - CAST(round($lr * CAST(g$k.g AS DOUBLE) / n) AS BIGINT) AS w
           FROM w${k - 1} JOIN g$k ON w${k - 1}.b = g$k.b CROSS JOIN nn)"""
      s"""$resid,
         g$k AS (SELECT b, sum(CAST(pd.cnt AS HUGEINT) * rm) AS g
                FROM pd JOIN r$k USING (doc_id) GROUP BY b),
         $update"""
    }.mkString(",\n         ")
    s"""$header,
         $steps,
         wf AS (SELECT * FROM w$iters)"""
  }

  private[oracle] lazy val dsirCtes: String = {
    import graft.functions.PortableHash.{sqlHashMod, P}
    s"""d0 AS (
           SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
           FROM documents),
         -- ONE md5 per token; the bigram hash derives arithmetically
         -- ((h1*31 + h2) mod P), mirroring Curation.featureBuckets
         h0 AS (
           SELECT doc_id, list_transform(toks, t -> ${sqlHashMod("t")}) AS hs
           FROM d0),
         f0 AS (
           SELECT doc_id,
                  list_concat(hs,
                    CASE WHEN len(hs) >= 2
                         THEN list_transform(range(1, len(hs)),
                                i -> (hs[i] * 31 + hs[i + 1]) % $P)
                         ELSE CAST([] AS BIGINT[]) END) AS feats
           FROM h0),
         fb AS MATERIALIZED (
           SELECT doc_id, (f % 4096) AS b
           FROM (SELECT doc_id, unnest(feats) AS f FROM f0)),
         cc AS (SELECT b, count(*) AS cq FROM fb GROUP BY b),
         tc AS (SELECT b, count(*) AS cp FROM fb WHERE doc_id % 7 = 0 GROUP BY b),
         tot AS (SELECT (SELECT count(*) FROM fb) AS tq,
                        (SELECT count(*) FROM fb WHERE doc_id % 7 = 0) AS tp),
         lam AS (
           SELECT cc.b,
                  CAST(round((ln(CAST(coalesce(cp, 0) + 1 AS DOUBLE) / (tp + 4096))
                            - ln(CAST(cq + 1 AS DOUBLE) / (tq + 4096))) * 1000000.0) AS BIGINT)
                    AS lam_micro
           FROM cc LEFT JOIN tc ON cc.b = tc.b CROSS JOIN tot),
         pd AS (SELECT doc_id, b, count(*) AS n FROM fb GROUP BY 1, 2),
         sc AS (
           SELECT doc_id, sum(n * lam_micro) AS s_micro, sum(n) AS nf
           FROM pd JOIN lam ON pd.b = lam.b GROUP BY doc_id)"""
  }

  def sql: Map[String, String] = Map(
    // the trained classifier, replayed: the full 12 unrolled GD
    // iterations with the identical exact-integer arithmetic (HUGEINT
    // gradient sums, micro-unit weights, 6-dp sigmoids) — w0=0 makes
    // iteration 1's probabilities exactly 0.5
    "q_logreg_train" ->
      s"""WITH ${logregCtes(iters = 12, lr = 3.0)}
         SELECT r.range AS bucket,
                CAST(coalesce(wf.w, 0) AS BIGINT) AS w_micro,
                CAST(coalesce(wf.w, 0) AS DOUBLE) / 1e6 AS weight
         FROM range(257) r LEFT JOIN wf ON wf.b = r.range
         ORDER BY bucket""",

    "q_logreg_score" ->
      s"""WITH ${logregCtes(iters = 12, lr = 3.0)},
         mf AS (
           SELECT pd.doc_id,
                  CAST(sum(CAST(pd.cnt AS HUGEINT) * coalesce(wf.w, 0)) AS DOUBLE) / 1e6 AS m
           FROM pd LEFT JOIN wf USING (b) GROUP BY pd.doc_id)
         SELECT d.doc_id,
                coalesce(mf.m, 0.0) AS margin,
                round(1.0 / (1.0 + exp(-(coalesce(mf.m, 0.0)))), 6) AS p,
                (round(1.0 / (1.0 + exp(-(coalesce(mf.m, 0.0)))), 6) >= 0.5) AS predicted,
                (d.n_chars >= 250) AS label
         FROM documents d LEFT JOIN mf USING (doc_id)
         ORDER BY d.doc_id""",

    "q_split_leakage" -> {
      import graft.functions.PortableHash.sqlHashMod
      val shard = s"(${sqlHashMod("('split:' || CAST(doc_id AS VARCHAR))")} % 10)"
      s"""WITH $minhashSimsCtes,
         p AS (SELECT id_a, id_b FROM sims WHERE sig_sim >= 0.5),
         sp AS (
           SELECT doc_id,
                  CASE WHEN $shard < 8 THEN 'train'
                       WHEN $shard = 8 THEN 'valid'
                       ELSE 'test' END AS split
           FROM documents),
         x AS (
           SELECT sa.split AS s_a, sb.split AS s_b
           FROM p JOIN sp sa ON sa.doc_id = p.id_a
                  JOIN sp sb ON sb.doc_id = p.id_b
           WHERE sa.split <> sb.split)
         SELECT least(s_a, s_b) AS split_a, greatest(s_a, s_b) AS split_b,
                count(*) AS n_pairs
         FROM x GROUP BY 1, 2 ORDER BY split_a, split_b"""
    },

    // largest-remainder replay: identical hash order (bucket, hash, id),
    // identical floor/remainder arithmetic on IEEE doubles
    "q_stratified_split" -> {
      import graft.functions.PortableHash.sqlHashMod
      val h = sqlHashMod("('strat:' || CAST(doc_id AS VARCHAR))")
      s"""WITH b AS (
           SELECT doc_id, lang, $h AS h FROM documents),
         r AS (SELECT doc_id, lang,
                      row_number() OVER (PARTITION BY lang ORDER BY h % 64, h, doc_id) - 1 AS rnk
               FROM b),
         t AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1),
         tg AS (SELECT lang, n,
                  CAST(floor(n * 0.8) AS BIGINT) AS fl0, n * 0.8 - floor(n * 0.8) AS rem0,
                  CAST(floor(n * 0.1) AS BIGINT) AS fl1, n * 0.1 - floor(n * 0.1) AS rem1,
                  CAST(floor(n * 0.1) AS BIGINT) AS fl2, n * 0.1 - floor(n * 0.1) AS rem2
                FROM t),
         bonus AS (SELECT lang, n, fl0, fl1, fl2,
                  n - (fl0 + fl1 + fl2) AS leftover,
                  (CASE WHEN rem1 > rem0 THEN 1 ELSE 0 END +
                   CASE WHEN rem2 > rem0 THEN 1 ELSE 0 END) AS rk0,
                  (CASE WHEN rem0 >= rem1 THEN 1 ELSE 0 END +
                   CASE WHEN rem2 > rem1 THEN 1 ELSE 0 END) AS rk1,
                  (CASE WHEN rem0 >= rem2 THEN 1 ELSE 0 END +
                   CASE WHEN rem1 >= rem2 THEN 1 ELSE 0 END) AS rk2
                FROM tg),
         th AS (SELECT lang,
                  fl0 + CASE WHEN rk0 < leftover THEN 1 ELSE 0 END AS t0,
                  fl1 + CASE WHEN rk1 < leftover THEN 1 ELSE 0 END AS t1
                FROM bonus)
         SELECT r.doc_id, r.lang,
                CASE WHEN rnk < t0 THEN 'train'
                     WHEN rnk < t0 + t1 THEN 'valid'
                     ELSE 'test' END AS split
         FROM r JOIN th ON r.lang = th.lang ORDER BY doc_id"""
    },

    "q_sample_shard" -> {
      import graft.functions.PortableHash.sqlHashMod
      val score = Sampling.sqlHashScore("doc_id", "sample")
      s"""SELECT doc_id, lang,
                (${sqlHashMod("('shard:' || CAST(doc_id AS VARCHAR))")} % 8) AS shard
         FROM documents
         WHERE $score < CASE WHEN lang = 'en' THEN 0.5 ELSE 0.2 END
         ORDER BY doc_id"""
    },

    "q_curation_pipeline" -> {
      import graft.functions.PortableHash.sqlHashMod
      val sampleScore = Sampling.sqlHashScore("doc_id", "curate")
      val packScore = Sampling.sqlHashScore("doc_id", "curate-pack")
      s"""WITH t AS (
           SELECT doc_id, lang, text,
                  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens
           FROM documents),
         q AS (SELECT * FROM t WHERE n_tokens >= 5),
         k AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(text)),
         dd AS (SELECT q.* FROM q JOIN k USING (doc_id)),
         sm AS (SELECT * FROM dd
                WHERE $sampleScore < CASE WHEN lang = 'en' THEN 0.6 ELSE 0.4 END),
         sh AS (SELECT doc_id, lang, n_tokens,
                  (${sqlHashMod("('curate-pack:' || CAST(doc_id AS VARCHAR))")} % 4) AS shard,
                  $packScore AS pscore
                FROM sm),
         w AS (SELECT doc_id, lang, n_tokens, shard,
                  CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY shard
                    ORDER BY pscore, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
               FROM sh)
         SELECT doc_id, lang, n_tokens, shard, start_off,
                CAST(start_off // 512 AS BIGINT) AS pack_first,
                CAST((start_off + n_tokens - 1) // 512 AS BIGINT) AS pack_last
         FROM w ORDER BY doc_id"""
    },

    "q_pack_sequences" -> {
      import graft.functions.PortableHash.sqlHashMod
      val score = Sampling.sqlHashScore("doc_id", "pack")
      s"""WITH t AS (
           SELECT doc_id,
                  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens,
                  (${sqlHashMod("('pack:' || CAST(doc_id AS VARCHAR))")} % 4) AS shard,
                  $score AS score
           FROM documents),
         w AS (
           SELECT doc_id, shard, n_tokens,
                  CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY shard
                    ORDER BY score, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
           FROM t WHERE n_tokens > 0)
         SELECT doc_id, shard, n_tokens, start_off,
                CAST(start_off // 512 AS BIGINT) AS pack_first,
                CAST((start_off + n_tokens - 1) // 512 AS BIGINT) AS pack_last
         FROM w ORDER BY doc_id"""
    },

    "q_mix_weights" ->
      """WITH g AS (
           SELECT source,
                  CAST(sum(len(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS BIGINT) AS n_tokens,
                  count(*) AS n_docs
           FROM documents GROUP BY source),
         s AS (
           SELECT source, n_tokens, n_docs,
                  CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER () AS share
           FROM g),
         r AS (SELECT *, pow(share, 0.5) AS raw FROM s)
         SELECT source, n_tokens, n_docs, round(share, 6) AS share,
                round(raw / sum(raw) OVER (), 6) AS weight
         FROM r ORDER BY source""",

    "q_mix_apply" -> {
      val score = Sampling.sqlHashScore("d.doc_id", "mix")
      s"""WITH g AS (
           SELECT source,
                  CAST(sum(len(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS BIGINT) AS n_tokens,
                  count(*) AS n_docs
           FROM documents GROUP BY source),
         s AS (
           SELECT source, n_tokens,
                  CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER () AS share
           FROM g),
         r AS (SELECT *, pow(share, 0.5) AS raw FROM s),
         w AS (SELECT source, n_tokens AS actual, raw / sum(raw) OVER () AS weight FROM r),
         rates AS (
           SELECT source,
                  CASE WHEN actual = 0 THEN 1.0
                       ELSE least(1.0, 10000.0 * weight / actual) END AS rate
           FROM w)
         SELECT d.doc_id, d.source,
                CAST(len(regexp_extract_all(d.text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens,
                round(rates.rate, 6) AS rate
         FROM documents d JOIN rates USING (source)
         WHERE $score < rates.rate
         ORDER BY d.doc_id"""
    },

    "q_mix_epochs" -> {
      val score = Sampling.sqlHashScore("doc_id", "mix")
      s"""WITH g AS (
           SELECT source,
                  CAST(sum(len(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS BIGINT) AS n_tokens,
                  count(*) AS n_docs
           FROM documents GROUP BY source),
         s AS (
           SELECT source, n_tokens,
                  CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER () AS share
           FROM g),
         r AS (SELECT *, pow(share, 0.5) AS raw FROM s),
         w AS (SELECT source, n_tokens AS actual, raw / sum(raw) OVER () AS weight FROM r),
         rates AS (
           SELECT source,
                  CASE WHEN actual = 0 THEN 1.0
                       ELSE 60000.0 * weight / actual END AS rate
           FROM w),
         c AS (
           SELECT d.doc_id, d.source,
                  CAST(len(regexp_extract_all(d.text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens,
                  rates.rate,
                  CAST(floor(rates.rate) AS BIGINT) +
                    CASE WHEN $score < rates.rate - floor(rates.rate) THEN 1 ELSE 0 END AS copies
           FROM documents d JOIN rates USING (source))
         SELECT doc_id, source, n_tokens, round(rate, 6) AS rate, copies
         FROM c WHERE copies >= 1
         ORDER BY doc_id"""
    },

    "q_quality_bins" ->
      """WITH c AS (
           SELECT lang,
                  quantile_cont(n_chars, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS cuts
           FROM documents GROUP BY lang)
         SELECT d.doc_id, d.lang, d.n_chars,
                CAST(1 + list_sum(list_transform(c.cuts,
                  t -> CASE WHEN CAST(d.n_chars AS DOUBLE) > t THEN 1 ELSE 0 END)) AS BIGINT) AS bin
         FROM documents d JOIN c USING (lang)
         ORDER BY d.doc_id""",

    "q_domain_cap" ->
      """SELECT doc_id, source, n_chars, rank FROM (
           SELECT doc_id, source, n_chars,
                  row_number() OVER (PARTITION BY source
                                     ORDER BY n_chars DESC, doc_id) AS rank
           FROM documents)
         WHERE rank <= 10 ORDER BY doc_id""",

    // DSIR twins share the hashed-feature + micro-unit-λ CTE chain; the
    // per-doc score is an integer sum (order-independent, engine-exact),
    // only the final projection divides back to a double
    "q_dsir_scores" -> {
      import graft.functions.PortableHash.sqlHash60
      s"""WITH $dsirCtes
         SELECT d.doc_id,
                CAST(coalesce(nf, 0) AS BIGINT) AS n_features,
                round(CAST(coalesce(s_micro, 0) AS DOUBLE) / 1000000.0, 6) AS score
         FROM documents d LEFT JOIN sc USING (doc_id)
         ORDER BY doc_id"""
    },

    "q_dsir_sample" -> {
      import graft.functions.PortableHash.sqlHashMod
      s"""WITH $dsirCtes,
         keyed AS (
           SELECT d.doc_id,
                  CAST(coalesce(s_micro, 0) AS DOUBLE) / 1000000.0 AS sc0,
                  CAST(coalesce(s_micro, 0) AS DOUBLE) / 1000000.0
                    - ln(-ln(CAST(${sqlHashMod("'dsir:' || CAST(doc_id AS VARCHAR)")} + 1 AS DOUBLE)
                             / 2147483648.0)) AS k
           FROM documents d LEFT JOIN sc USING (doc_id)),
         top AS (SELECT * FROM keyed ORDER BY k DESC, doc_id LIMIT 100)
         SELECT doc_id, round(sc0, 6) AS score, round(k, 6) AS gumbel_key
         FROM top ORDER BY doc_id"""
    },

  )
}
