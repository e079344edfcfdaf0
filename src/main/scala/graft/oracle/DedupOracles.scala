package graft.oracle

import graft.pipeline.{Sampling, TextAnalysis}

/** DuckDB oracle twins for the Dedup query family — split out of
  * SparkEntry.oracleSql (r17, maintenance: the single file had reached
  * 4k lines). VERBATIM moves: every SQL string and helper is unchanged,
  * and the assembled map's key set is identical, so the Verify dump is
  * byte-identical. Portability rules are documented on SparkEntry.
  */
private[graft] object DedupOracles {

  /** Shared CTE chain (no leading WITH) reproducing the MinHash-LSH
    * pipeline end-to-end in DuckDB SQL, ending at `sims(id_a, id_b,
    * sig_sim)` — used by both `q_minhash_lsh` (pairs) and
    * `q_dup_clusters` (recursive-CTE connected components over the same
    * pairs).
    *
    * The multiply-referenced CTEs are MATERIALIZED: DuckDB otherwise
    * re-evaluates a CTE per reference, so `sig` (referenced by all 8 band
    * branches) and everything downstream of the recursive closure was
    * re-running the whole minhash pipeline many times over — measured 44x
    * on q_dedup_best (19.2s -> 0.4s at sf0.01, identical rows). Purely an
    * evaluation-strategy hint; the relation is unchanged.
    *
    * `bok` mirrors [[graft.pipeline.Dedup.minhashLshPairs]]'s hot-band
    * cap (maxBandDf = 1000): band buckets above the cap generate no
    * candidates in EITHER engine.
    */
  private[oracle] lazy val minhashSimsCtes: String = {
    import graft.functions.PortableHash.{P, permConsts, sqlHashMod}
    val consts = permConsts(32)
    val minCols = consts.zipWithIndex.map { case ((a, b), i) =>
      s"min((b*$a + $b) % $P) AS h$i" }.mkString(",\n                  ")
    val sigList = (0 until 32).map(i => s"h$i").mkString("[", ", ", "]")
    val bandRows = (0 until 8).map { bb =>
      s"SELECT doc_id, sig, $bb AS band, md5(array_to_string(sig[${bb * 4 + 1}:${bb * 4 + 4}], ',')) AS bh FROM sig"
    }.mkString("\n           UNION ALL ")
    s"""d0 AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
           FROM documents),
         d AS MATERIALIZED (
           SELECT doc_id,
                  list_distinct(list_transform(range(1, len(toks) - 1),
                    i -> array_to_string(toks[i:i+2], ' '))) AS sh
           FROM d0),
         ex AS (SELECT doc_id, unnest(sh) AS shingle FROM d WHERE len(sh) > 0),
         hx AS (SELECT doc_id, ${sqlHashMod("shingle")} AS b FROM ex),
         mh AS (SELECT doc_id,
                  $minCols
                FROM hx GROUP BY doc_id),
         sig AS MATERIALIZED (SELECT doc_id, $sigList AS sig FROM mh),
         bands AS MATERIALIZED (
           $bandRows),
         bok AS (
           SELECT band, bh FROM bands GROUP BY band, bh HAVING count(*) <= 1000),
         cand AS (
           SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sig AS sa, b.sig AS sb
           FROM bands a JOIN bok ON a.band = bok.band AND a.bh = bok.bh
                JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
         sims AS MATERIALIZED (
           SELECT id_a, id_b,
                  CAST(list_sum(list_transform(range(1, 33),
                    i -> CASE WHEN sa[i] = sb[i] THEN 1 ELSE 0 END)) AS DOUBLE) / 32 AS sig_sim
           FROM cand)"""
  }

  def sql: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_docs
         FROM documents GROUP BY 1 ORDER BY 1""",

    "q_dedup_norm" ->
      """SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS content_hash,
                min(doc_id) AS keep_id, count(*) AS n_docs
         FROM documents GROUP BY 1 ORDER BY 1""",

    "q_dedup_drop" ->
      """SELECT doc_id, content_hash FROM (
           SELECT doc_id, md5(text) AS content_hash,
                  row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
           FROM documents)
         WHERE rn > 1 ORDER BY doc_id""",

    // paragraph dedup: the winner key doc_id*1e6+idx is lexicographically
    // identical to Spark's min(struct(id, idx)) while idx < 1e6 (fixture
    // docs have tens of paragraphs); string_agg skips NULLs exactly like
    // collect_list, and coalesce('') matches concat_ws over an empty set
    "q_paragraph_dedup" ->
      """WITH lined AS (
           SELECT doc_id, regexp_replace(text, ' (a|the) ', chr(10)||chr(10), 'g') AS text
           FROM documents),
         pars AS MATERIALIZED (
           SELECT doc_id, i - 1 AS idx, parts[i] AS par,
                  trim(regexp_replace(lower(parts[i]), '[^a-z0-9]+', ' ', 'g')) AS norm
           FROM (SELECT doc_id, string_split(text, chr(10)||chr(10)) AS parts FROM lined) t,
                LATERAL unnest(generate_series(1, len(parts))) AS u(i)),
         dupes AS (
           SELECT norm, min(doc_id * 1000000 + idx) AS winkey
           FROM pars WHERE norm <> '' GROUP BY norm HAVING count(*) >= 2),
         kept AS (
           SELECT p.doc_id, p.idx, p.par,
                  (p.norm = '' OR d.norm IS NULL
                   OR p.doc_id * 1000000 + p.idx = d.winkey) AS keep
           FROM pars p LEFT JOIN dupes d USING (norm))
         SELECT doc_id,
                CAST(count(*) AS BIGINT) AS n_pars,
                CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                coalesce(string_agg(CASE WHEN keep THEN par END,
                  chr(10)||chr(10) ORDER BY idx), '') AS clean_text
         FROM kept GROUP BY doc_id ORDER BY doc_id""",

    // incremental paragraph dedup: seen membership by normalized string
    // (the hash is an injective stand-in), then the batch winner rule
    // within the increment
    "q_incr_paragraph_dedup" ->
      """WITH lined AS (
           SELECT doc_id, regexp_replace(text, ' (a|the) ', chr(10)||chr(10), 'g') AS text
           FROM documents),
         pars AS MATERIALIZED (
           SELECT doc_id, i - 1 AS idx, parts[i] AS par,
                  trim(regexp_replace(lower(parts[i]), '[^a-z0-9]+', ' ', 'g')) AS norm
           FROM (SELECT doc_id, string_split(text, chr(10)||chr(10)) AS parts FROM lined) t,
                LATERAL unnest(generate_series(1, len(parts))) AS u(i)),
         seenh AS (SELECT DISTINCT norm FROM pars WHERE doc_id % 2 = 0 AND norm <> ''),
         np AS (SELECT * FROM pars WHERE doc_id % 2 = 1),
         dupes AS (
           SELECT norm, min(doc_id * 1000000 + idx) AS winkey
           FROM np WHERE norm <> '' GROUP BY norm HAVING count(*) >= 2),
         kept AS (
           SELECT np.doc_id, np.idx, np.par,
                  (np.norm = '' OR (s.norm IS NULL AND
                    (d.norm IS NULL OR np.doc_id * 1000000 + np.idx = d.winkey))) AS keep
           FROM np LEFT JOIN seenh s USING (norm) LEFT JOIN dupes d USING (norm))
         SELECT doc_id,
                CAST(count(*) AS BIGINT) AS n_pars,
                CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                coalesce(string_agg(CASE WHEN keep THEN par END,
                  chr(10)||chr(10) ORDER BY idx), '') AS clean_text
         FROM kept GROUP BY doc_id ORDER BY doc_id""",

    "q_ngram_jaccard" ->
      """WITH d0 AS (
           SELECT doc_id, lang, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
           FROM documents),
         d AS (
           SELECT doc_id, lang,
                  list_distinct(list_transform(range(1, len(toks) - 1),
                    i -> array_to_string(toks[i:i+2], ' '))) AS sh
           FROM d0),
         dd AS (SELECT doc_id, lang, sh, len(sh) AS n FROM d WHERE len(sh) > 0),
         -- ex is BOTH sides of the self-join: materialize or DuckDB runs
         -- the shingle extraction twice (13.7s -> 3.6s at sf0.1)
         ex AS MATERIALIZED (SELECT doc_id, lang, n, unnest(sh) AS shingle FROM dd),
         p AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb, count(*) AS n_shared
           FROM ex a JOIN ex b
             ON a.shingle = b.shingle AND a.lang = b.lang AND a.doc_id < b.doc_id
           GROUP BY 1, 2, 3, 4)
         SELECT id_a, id_b,
                round(CAST(n_shared AS DOUBLE) / (na + nb - n_shared), 6) AS jaccard
         FROM p WHERE CAST(n_shared AS DOUBLE) / (na + nb - n_shared) >= 0.5
         ORDER BY id_a, id_b""",

    "q_contamination" -> {
      import graft.functions.PortableHash.sqlHashMod
      s"""WITH d0 AS (
           SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
           FROM documents),
         d AS (
           SELECT doc_id,
                  list_distinct(list_transform(range(1, len(toks) - 1),
                    i -> array_to_string(toks[i:i+2], ' '))) AS sh
           FROM d0),
         ex AS (SELECT doc_id, unnest(sh) AS shingle FROM d WHERE len(sh) > 0),
         -- hx feeds BOTH join sides: materialize or DuckDB re-runs the
         -- whole shingle+hash pipeline twice (7.1s -> 3.5s at sf0.1)
         hx AS MATERIALIZED (SELECT doc_id, ${sqlHashMod("shingle")} AS h FROM ex),
         ev AS (SELECT DISTINCT h FROM hx WHERE doc_id % 97 = 0),
         co AS (SELECT doc_id, h FROM hx WHERE doc_id % 97 <> 0)
         SELECT doc_id, count(*) AS n_shared
         FROM co JOIN ev USING (h)
         GROUP BY doc_id HAVING count(*) >= 3 ORDER BY doc_id"""
    },

    // per-source union MinHash: min over the whole sub-corpus of each
    // permuted shingle hash == the signature of the union shingle set
    "q_source_sim" -> {
      import graft.functions.PortableHash.{P, permConsts, sqlHashMod}
      val consts = permConsts(32)
      val minCols = consts.zipWithIndex.map { case ((a, b), i) =>
        s"min((b*$a + $b) % $P) AS h$i" }.mkString(",\n                  ")
      val sigList = (0 until 32).map(i => s"h$i").mkString("[", ", ", "]")
      s"""WITH d0 AS (
           SELECT source, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
           FROM documents),
         d AS (
           SELECT source, list_transform(range(1, len(toks) - 1),
                    i -> array_to_string(toks[i:i+2], ' ')) AS sh
           FROM d0),
         ex AS (SELECT source, unnest(sh) AS shingle FROM d WHERE len(sh) > 0),
         hx AS (SELECT source, ${sqlHashMod("shingle")} AS b FROM ex),
         mh AS (SELECT source,
                  $minCols
                FROM hx GROUP BY source),
         sig AS MATERIALIZED (SELECT source, $sigList AS sig FROM mh)
         SELECT a.source AS grp_a, b.source AS grp_b,
                round(CAST(list_sum(list_transform(range(1, 33),
                  i -> CASE WHEN a.sig[i] = b.sig[i] THEN 1 ELSE 0 END)) AS DOUBLE) / 32, 6) AS est_jaccard
         FROM sig a JOIN sig b ON a.source < b.source
         ORDER BY grp_a, grp_b"""
    },

    "q_minhash_lsh" ->
      s"""WITH $minhashSimsCtes
         SELECT id_a, id_b, round(sig_sim, 6) AS sig_sim
         FROM sims WHERE sig_sim >= 0.5 ORDER BY id_a, id_b""",

    // incremental near-dup: the operator's contract is minhashLshPairs
    // over (new ∪ seen) restricted to cross-side pairs, so the replay is
    // the SAME sims CTE with a side predicate (new = doc_id % 5 = 0)
    "q_incr_neardup_pairs" ->
      s"""WITH $minhashSimsCtes
         SELECT CASE WHEN id_a % 5 = 0 THEN id_a ELSE id_b END AS new_id,
                CASE WHEN id_a % 5 = 0 THEN id_b ELSE id_a END AS seen_id,
                round(sig_sim, 6) AS sig_sim
         FROM sims
         WHERE sig_sim >= 0.5 AND ((id_a % 5 = 0) <> (id_b % 5 = 0))
         ORDER BY new_id, seen_id""",

    "q_incr_neardup" ->
      s"""WITH $minhashSimsCtes,
         matched AS (
           SELECT CASE WHEN id_a % 5 = 0 THEN id_a ELSE id_b END AS new_id
           FROM sims
           WHERE sig_sim >= 0.5 AND ((id_a % 5 = 0) <> (id_b % 5 = 0)))
         SELECT doc_id FROM documents
         WHERE doc_id % 5 = 0 AND doc_id NOT IN (SELECT new_id FROM matched)
         ORDER BY doc_id""",

    // connected components over the minhash pairs: transitive closure by
    // recursive CTE (min reachable label per node = component id)
    // containment replay: anchor-shingle candidates (each doc's 4
    // rarest df-capped shingles joined to the inverted lists),
    // verification by exact hash-set intersection over min-cardinality
    "q_containment_pairs" -> {
      import graft.functions.PortableHash.sqlHashMod
      s"""WITH d0 AS (
           SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
           FROM documents),
         d AS (
           SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
                    i -> array_to_string(toks[i:i+2], ' '))) AS sh
           FROM d0),
         ex AS (SELECT doc_id, unnest(sh) AS shingle FROM d WHERE len(sh) > 0),
         -- DISTINCT on (doc_id, b): per-doc shingle STRINGS are already
         -- distinct, but a within-doc hash collision would otherwise make
         -- the oracle count rows where Spark counts distinct HASHES
         -- (collect_set semantics) — both engines use hash-set cardinality
         hx AS MATERIALIZED (SELECT DISTINCT doc_id, ${sqlHashMod("shingle")} AS b FROM ex),
         dfc AS (SELECT b, count(*) AS c FROM hx GROUP BY 1),
         wd AS MATERIALIZED (
           SELECT doc_id, hx.b, dfc.c FROM hx JOIN dfc ON hx.b = dfc.b),
         anch AS (
           SELECT doc_id, b FROM (
             SELECT doc_id, b, c,
                    row_number() OVER (PARTITION BY doc_id ORDER BY c, b) AS rn
             FROM wd)
           WHERE rn <= 4 AND c <= 1000),
         mem AS (SELECT doc_id, b FROM wd WHERE c <= 1000),
         pr AS (SELECT DISTINCT least(a.doc_id, m.doc_id) AS id_a,
                       greatest(a.doc_id, m.doc_id) AS id_b
                FROM anch a JOIN mem m ON a.b = m.b AND a.doc_id <> m.doc_id),
         nsh AS (SELECT doc_id, count(*) AS n FROM hx GROUP BY 1),
         inter AS (SELECT pr.id_a, pr.id_b, count(*) AS ni
                   FROM pr JOIN hx xa ON xa.doc_id = pr.id_a
                        JOIN hx xb ON xb.doc_id = pr.id_b AND xb.b = xa.b
                   GROUP BY 1, 2)
         SELECT i.id_a, i.id_b,
                round(CAST(ni AS DOUBLE) / least(a.n, b.n), 6) AS containment
         FROM inter i JOIN nsh a ON a.doc_id = i.id_a JOIN nsh b ON b.doc_id = i.id_b
         WHERE CAST(ni AS DOUBLE) / least(a.n, b.n) >= 0.6
         ORDER BY id_a, id_b"""
    },

    "q_dup_clusters" ->
      s"""WITH RECURSIVE $minhashSimsCtes,
         p AS (SELECT id_a, id_b FROM sims WHERE sig_sim >= 0.5),
         e AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM p
               UNION ALL SELECT id_b AS a, id_a AS b FROM p),
         reach(id, lbl) AS (
           SELECT a, a FROM (SELECT DISTINCT a FROM e)
           UNION
           SELECT e.b, r.lbl FROM reach r JOIN e ON e.a = r.id),
         comp AS MATERIALIZED (SELECT id, min(lbl) AS component FROM reach GROUP BY id)
         SELECT d.doc_id AS id,
                coalesce(c.component, d.doc_id) AS component,
                coalesce(c.component, d.doc_id) = d.doc_id AS is_canonical
         FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
         ORDER BY id""",

    "q_dedup_best" ->
      s"""WITH RECURSIVE $minhashSimsCtes,
         p AS (SELECT id_a, id_b FROM sims WHERE sig_sim >= 0.5),
         e AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM p
               UNION ALL SELECT id_b AS a, id_a AS b FROM p),
         reach(id, lbl) AS (
           SELECT a, a FROM (SELECT DISTINCT a FROM e)
           UNION
           SELECT e.b, r.lbl FROM reach r JOIN e ON e.a = r.id),
         comp AS MATERIALIZED (SELECT id, min(lbl) AS component FROM reach GROUP BY id),
         allc AS MATERIALIZED (
           SELECT d.doc_id AS id,
                  coalesce(c.component, d.doc_id) AS component,
                  CAST(d.n_chars AS DOUBLE) AS score
           FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
         ms AS (SELECT component, max(score) AS m FROM allc GROUP BY 1),
         best AS (
           SELECT a.component, min(a.id) AS best
           FROM allc a JOIN ms ON a.component = ms.component AND a.score = ms.m
           GROUP BY a.component)
         SELECT a.id, a.component, a.id = b.best AS keep
         FROM allc a JOIN best b ON a.component = b.component
         ORDER BY a.id""",

    "q_simhash_pairs" -> {
      import graft.functions.PortableHash.sqlHash60
      val bandRows = (0 until 4).map { bb =>
        s"SELECT id, sig, $bb AS band, (sig >> ${bb * 15}) & 32767 AS bb FROM sigs"
      }.mkString("\n           UNION ALL ")
      s"""WITH tok AS (
           SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
           FROM documents),
         hx AS (SELECT doc_id, ${sqlHash60("t")} AS h FROM tok),
         bits AS (
           SELECT doc_id, CAST(r.i AS INTEGER) AS i,
                  sum((h >> CAST(r.i AS INTEGER)) & 1) AS ones, count(*) AS n
           FROM hx CROSS JOIN range(60) r(i) GROUP BY 1, 2),
         sig0 AS (
           SELECT doc_id, CAST(sum(CASE WHEN ones*2 > n THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS sig
           FROM bits GROUP BY 1),
         sigs AS (
           SELECT d.doc_id AS id, coalesce(s.sig, 0) AS sig
           FROM documents d LEFT JOIN sig0 s USING (doc_id)),
         bands AS (
           $bandRows),
         cand AS (
           SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.sig AS sa, b.sig AS sb
           FROM bands a JOIN bands b ON a.band = b.band AND a.bb = b.bb AND a.id < b.id)
         SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
         FROM cand WHERE bit_count(xor(sa, sb)) <= 3 ORDER BY id_a, id_b"""
    },

    "q_winnow" -> {
      import graft.functions.PortableHash.sqlHashMod
      val w = 5; val k = 4; val pb = 1L << 32 // TextAnalysis.winnow PosBits
      s"""WITH t AS (
           SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
           FROM documents),
         px AS (
           SELECT doc_id, ws, unnest(range(1, len(ws) - $w + 2)) AS pos FROM t),
         win AS (
           SELECT doc_id, pos,
                  ${sqlHashMod(s"array_to_string(ws[pos:pos+${w - 1}], ' ')")} AS h
           FROM px),
         keyed AS (
           SELECT doc_id, pos, h * $pb + pos AS key FROM win WHERE pos < $pb),
         sel AS (
           SELECT doc_id, pos,
                  count(*) OVER (PARTITION BY doc_id) AS n,
                  min(key) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN CURRENT ROW AND ${k - 1} FOLLOWING) AS wmin
           FROM keyed),
         f AS (
           SELECT DISTINCT doc_id, wmin % $pb AS fpos, wmin // $pb AS fp
           FROM sel WHERE pos <= greatest(1, n - ${k - 1}))
         SELECT doc_id, CAST(fpos AS BIGINT) AS pos, CAST(fp AS BIGINT) AS fp
         FROM f ORDER BY doc_id, pos, fp"""
    },

    "q_winnow_pairs" -> {
      import graft.functions.PortableHash.sqlHashMod
      val w = 5; val k = 4; val pb = 1L << 32 // TextAnalysis.winnow PosBits
      s"""WITH t AS (
           SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
           FROM documents),
         px AS (
           SELECT doc_id, ws, unnest(range(1, len(ws) - $w + 2)) AS pos FROM t),
         win AS (
           SELECT doc_id, pos,
                  ${sqlHashMod(s"array_to_string(ws[pos:pos+${w - 1}], ' ')")} AS h
           FROM px),
         keyed AS (
           SELECT doc_id, pos, h * $pb + pos AS key FROM win WHERE pos < $pb),
         sel AS (
           SELECT doc_id, pos,
                  count(*) OVER (PARTITION BY doc_id) AS n,
                  min(key) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN CURRENT ROW AND ${k - 1} FOLLOWING) AS wmin
           FROM keyed),
         f AS (
           SELECT DISTINCT doc_id, wmin // $pb AS fp
           FROM sel WHERE pos <= greatest(1, n - ${k - 1})),
         rare AS (SELECT fp FROM f GROUP BY fp HAVING count(*) <= 100),
         kept AS (SELECT doc_id, fp FROM f JOIN rare USING (fp)),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
           FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT id_a, id_b, CAST(n_shared AS BIGINT) AS n_shared
         FROM pairs WHERE n_shared >= 2 ORDER BY id_a, id_b"""
    },

    // bloom prune + exact confirm == plain anti-join (no false negatives;
    // false positives recovered by the confirm join)
    "q_bloom_dedup" ->
      """WITH newd AS (
           SELECT doc_id, md5(text) AS content_hash FROM documents WHERE doc_id % 3 <> 0),
         seen AS (
           SELECT DISTINCT md5(text) AS content_hash FROM documents WHERE doc_id % 3 = 0),
         fresh AS (
           SELECT doc_id, content_hash FROM newd
           WHERE NOT EXISTS (
             SELECT 1 FROM seen s WHERE s.content_hash = newd.content_hash))
         SELECT min(doc_id) AS doc_id, content_hash
         FROM fresh GROUP BY content_hash ORDER BY 1""",

    "q_incremental_dedup" ->
      """WITH newd AS (
           SELECT doc_id, md5(text) AS content_hash FROM documents WHERE doc_id % 2 = 1),
         seen AS (
           SELECT DISTINCT md5(text) AS content_hash FROM documents WHERE doc_id % 2 = 0),
         fresh AS (
           -- NOT EXISTS with equality, not NOT IN: a NULL hash on the
           -- seen side must not empty the result, and a NULL-hash new
           -- doc survives — exactly Spark's left_anti null semantics
           SELECT doc_id, content_hash FROM newd
           WHERE NOT EXISTS (
             SELECT 1 FROM seen s WHERE s.content_hash = newd.content_hash))
         SELECT min(doc_id) AS doc_id, content_hash
         FROM fresh GROUP BY content_hash ORDER BY doc_id""",

    "q_dup_spans" -> {
      import graft.functions.PortableHash.sqlHashMod
      val w = 5
      s"""WITH t AS (
           SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
           FROM documents),
         px AS (
           SELECT doc_id, ws, unnest(range(1, len(ws) - $w + 2)) AS pos FROM t),
         win AS (
           SELECT doc_id, pos,
                  ${sqlHashMod(s"array_to_string(ws[pos:pos+${w - 1}], ' ')")} AS h
           FROM px),
         dup AS (SELECT h FROM win GROUP BY h HAVING count(*) >= 2),
         dw AS (SELECT doc_id, pos FROM win JOIN dup USING (h)),
         isl AS (
           SELECT doc_id, pos,
                  CASE WHEN pos <= max(pos) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + $w
                       THEN 0 ELSE 1 END AS brk
           FROM dw),
         g AS (SELECT doc_id, pos,
                      sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
               FROM isl)
         SELECT doc_id, min(pos) AS span_start, max(pos) + ${w - 1} AS span_end,
                CAST(count(*) AS BIGINT) AS n_windows
         FROM g GROUP BY doc_id, grp ORDER BY doc_id, span_start"""
    },

    // incremental span removal: a new-side window is duplicated iff its
    // hash is in the corpus OR repeats within the increment (== the
    // batch >= 2 rule over the union, restricted to new docs)
    "q_incr_strip_spans" -> {
      import graft.functions.PortableHash.sqlHashMod
      val w = 5
      s"""WITH t AS (
           SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
           FROM documents),
         px AS (
           SELECT doc_id, ws, unnest(range(1, len(ws) - $w + 2)) AS pos FROM t),
         win AS MATERIALIZED (
           SELECT doc_id, pos,
                  ${sqlHashMod(s"array_to_string(ws[pos:pos+${w - 1}], ' ')")} AS h
           FROM px),
         seenh AS (SELECT DISTINCT h FROM win WHERE doc_id % 2 = 0),
         nwin AS (SELECT doc_id, pos, h FROM win WHERE doc_id % 2 = 1),
         dup AS (
           SELECT h FROM nwin GROUP BY h HAVING count(*) >= 2
           UNION SELECT h FROM seenh),
         dw AS (SELECT doc_id, pos FROM nwin JOIN dup USING (h)),
         isl AS (
           SELECT doc_id, pos,
                  CASE WHEN pos <= max(pos) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + $w
                       THEN 0 ELSE 1 END AS brk
           FROM dw),
         g AS (SELECT doc_id, pos,
                      sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
               FROM isl),
         spans AS MATERIALIZED (
           SELECT doc_id, min(pos) AS s, max(pos) + ${w - 1} AS e
           FROM g GROUP BY doc_id, grp),
         tok AS (
           SELECT doc_id, unnest(range(1, len(ws) + 1)) AS pos,
                  unnest(ws) AS tok
           FROM t WHERE doc_id % 2 = 1),
         cov AS (
           SELECT DISTINCT k.doc_id, k.pos
           FROM tok k JOIN spans sp
             ON sp.doc_id = k.doc_id AND k.pos BETWEEN sp.s AND sp.e)
         SELECT k.doc_id,
                CAST(count(*) AS BIGINT) AS n_tokens,
                CAST(sum(CASE WHEN c.pos IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
                coalesce(string_agg(CASE WHEN c.pos IS NULL THEN k.tok END,
                  ' ' ORDER BY k.pos), '') AS clean_text
         FROM tok k LEFT JOIN cov c ON c.doc_id = k.doc_id AND c.pos = k.pos
         GROUP BY k.doc_id ORDER BY k.doc_id"""
    },

    // span removal: the q_dup_spans CTE chain through `g`, then tokens
    // LEFT JOIN the merged spans (each token covers ≤ 1 merged span, so
    // the join cannot duplicate rows) and survivors re-join in order
    "q_strip_spans" -> {
      import graft.functions.PortableHash.sqlHashMod
      val w = 5
      s"""WITH t AS (
           SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
           FROM documents),
         px AS (
           SELECT doc_id, ws, unnest(range(1, len(ws) - $w + 2)) AS pos FROM t),
         win AS (
           SELECT doc_id, pos,
                  ${sqlHashMod(s"array_to_string(ws[pos:pos+${w - 1}], ' ')")} AS h
           FROM px),
         dup AS (SELECT h FROM win GROUP BY h HAVING count(*) >= 2),
         dw AS (SELECT doc_id, pos FROM win JOIN dup USING (h)),
         isl AS (
           SELECT doc_id, pos,
                  CASE WHEN pos <= max(pos) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + $w
                       THEN 0 ELSE 1 END AS brk
           FROM dw),
         g AS (SELECT doc_id, pos,
                      sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
               FROM isl),
         spans AS MATERIALIZED (
           SELECT doc_id, min(pos) AS s, max(pos) + ${w - 1} AS e
           FROM g GROUP BY doc_id, grp),
         tok AS (
           SELECT doc_id, unnest(range(1, len(ws) + 1)) AS pos,
                  unnest(ws) AS tok
           FROM t),
         cov AS (
           SELECT DISTINCT k.doc_id, k.pos
           FROM tok k JOIN spans sp
             ON sp.doc_id = k.doc_id AND k.pos BETWEEN sp.s AND sp.e)
         SELECT k.doc_id,
                CAST(count(*) AS BIGINT) AS n_tokens,
                CAST(sum(CASE WHEN c.pos IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
                coalesce(string_agg(CASE WHEN c.pos IS NULL THEN k.tok END,
                  ' ' ORDER BY k.pos), '') AS clean_text
         FROM tok k LEFT JOIN cov c ON c.doc_id = k.doc_id AND c.pos = k.pos
         GROUP BY k.doc_id ORDER BY k.doc_id"""
    },

  )
}
