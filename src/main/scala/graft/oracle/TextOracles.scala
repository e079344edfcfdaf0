package graft.oracle

import graft.pipeline.{Sampling, TextAnalysis}

/** DuckDB oracle twins for the Text query family — split out of
  * SparkEntry.oracleSql (r17, maintenance: the single file had reached
  * 4k lines). VERBATIM moves: every SQL string and helper is unchanged,
  * and the assembled map's key set is identical, so the Verify dump is
  * byte-identical. Portability rules are documented on SparkEntry.
  */
private[graft] object TextOracles {

  /** Shared robots-pipeline CTE chain (rules parse + group selection +
    * pattern translation + per-URL struct-max winner) — `q_robots_filter`
    * projects the per-URL verdicts, `q_crawl_frontier` rolls them up per
    * host. One text, two finals, identical semantics.
    */
  private val robotsCtes: String =
    """WITH rb(host, rtxt) AS (VALUES
           ('h0.example.com', E'User-agent: *\nDisallow: /private\nAllow: /private/ok\n\nUser-agent: graftbot\nDisallow: /p1\nDisallow: /*.tmp$\n'),
           ('h1.example.com', E'# comments only\nUser-agent: other\nDisallow: /\n'),
           ('h2.example.com', E'User-agent: *\nDisallow: /\nAllow: /p')),
         lines AS (
           SELECT host,
                  generate_subscripts(string_split(rtxt, chr(10)), 1) AS ln,
                  trim(regexp_replace(unnest(string_split(rtxt, chr(10))), '#.*$', '')) AS line
           FROM rb),
         kv AS (
           SELECT host, ln,
                  lower(trim(regexp_extract(line, '^([^:]+):', 1))) AS key,
                  trim(regexp_extract(line, '^[^:]+:(.*)$', 1)) AS val
           FROM lines
           WHERE lower(trim(regexp_extract(line, '^([^:]+):', 1)))
                 IN ('user-agent', 'allow', 'disallow')),
         g1 AS (
           SELECT *, CASE WHEN key = 'user-agent' AND
                  coalesce(lag(key) OVER (PARTITION BY host ORDER BY ln), '') <> 'user-agent'
                  THEN 1 ELSE 0 END AS hdr
           FROM kv),
         g2 AS (SELECT *, sum(hdr) OVER (PARTITION BY host ORDER BY ln) AS gid FROM g1),
         grp AS (
           SELECT host, gid,
                  max(CASE WHEN lower(val) = 'graftbot' THEN 1 ELSE 0 END) AS ex,
                  max(CASE WHEN val = '*' THEN 1 ELSE 0 END) AS star
           FROM g2 WHERE key = 'user-agent' GROUP BY host, gid),
         he AS (SELECT host, max(ex) AS has_exact FROM grp GROUP BY host),
         rules AS (
           SELECT g2.host, (key = 'allow') AS allow, val AS prefix
           FROM g2 JOIN grp USING (host, gid) JOIN he USING (host)
           WHERE key <> 'user-agent' AND val <> ''
             AND CASE WHEN has_exact = 1 THEN ex = 1 ELSE star = 1 END),
         pat AS (
           SELECT host, allow, prefix,
                  '^' || regexp_replace(regexp_replace(regexp_replace(prefix,
                    '[.^$+?()\[\]{}|\\]', '\\\0', 'g'), '\*', '.*', 'g'), '\\\$$', '$') AS rx
           FROM rules),
         urls AS (
           SELECT doc_id,
                  'http://h' || CAST(doc_id % 3 AS VARCHAR) || '.example.com' ||
                  (['/p1/x', '/q', '/file.tmp', '/file.tmp2', '/p'])[CAST(doc_id % 5 AS INT) + 1] AS canon
           FROM documents),
         uu AS (
           SELECT doc_id, canon,
                  regexp_extract(canon, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS host,
                  regexp_replace(canon, '^[a-z][a-z0-9+.-]*://[^/?#]+', '') AS pathq
           FROM urls),
         wins AS (
           SELECT u.doc_id,
                  max(struct_pack(l := length(p.prefix),
                                  a := CASE WHEN p.allow THEN 1 ELSE 0 END)) AS w
           FROM uu u JOIN pat p ON p.host = u.host AND regexp_matches(u.pathq, p.rx)
           GROUP BY u.doc_id)"""


  def sql: Map[String, String] = Map(
    "q_lang_scores" -> {
      val langs = TextAnalysis.StopwordsByLang.toSeq.sortBy(_._1)
      val cols = langs.map { case (lang, stops) =>
        val parts = stops.map(w =>
          s"len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), w -> w = '$w'))").mkString(" + ")
        s"CAST($parts AS BIGINT) AS score_$lang"
      }.mkString(",\n                ")
      s"""SELECT doc_id, lang,
                $cols
         FROM documents ORDER BY doc_id"""
    },

    "q_repetition" -> {
      import graft.functions.PortableHash.sqlHashMod
      s"""WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
         g AS (SELECT doc_id, unnest(list_transform(
                 range(1, len(ws) - 1), i -> array_to_string(ws[i:i+2], ' '))) AS gram
               FROM w),
         h AS (SELECT doc_id, ${sqlHashMod("gram")} AS hh FROM g),
         c AS (SELECT doc_id, hh, count(*) AS c FROM h GROUP BY 1, 2)
         SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_ngrams,
                CAST(max(c) AS BIGINT) AS top_ngram_count,
                round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS rep_ratio
         FROM c GROUP BY doc_id ORDER BY doc_id"""
    },

    // Gopher repetition: per n, gram counts + char lengths; top = lexi-max
    // (count, chars) like Spark's max(struct); dup = Σ count·chars at c>=2
    "q_gopher_rep" -> {
      def gramsCte(n: Int, tag: String): String =
        s"""g$tag AS (
           SELECT doc_id, unnest(list_transform(
             range(1, len(ws) - ${n - 2}), i -> array_to_string(ws[i:i+${n - 1}], ' '))) AS g
           FROM w WHERE len(ws) >= $n),
         c$tag AS (
           SELECT doc_id, g, count(*) AS c,
                  CAST(length(replace(g, ' ', '')) AS BIGINT) AS ch
           FROM g$tag GROUP BY 1, 2)"""
      def topCte(tag: String): String =
        s"""m$tag AS (SELECT doc_id, max(c) AS mc FROM c$tag GROUP BY 1),
         t$tag AS (
           SELECT c.doc_id, any_value(m.mc) * max(c.ch) AS chars
           FROM c$tag c JOIN m$tag m ON c.doc_id = m.doc_id AND c.c = m.mc
           GROUP BY c.doc_id)"""
      s"""WITH w AS (
           SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
         tot AS (
           SELECT doc_id,
                  CAST(coalesce(list_sum(list_transform(ws, x -> length(x))), 0) AS BIGINT) AS total_chars
           FROM w),
         ${gramsCte(2, "2")},
         ${topCte("2")},
         ${gramsCte(3, "3")},
         ${topCte("3")},
         ${gramsCte(5, "5")},
         d5 AS (
           SELECT doc_id, sum(c * ch) AS chars FROM c5 WHERE c >= 2 GROUP BY 1)
         SELECT tot.doc_id, tot.total_chars,
                round(CASE WHEN tot.total_chars = 0 THEN 0.0
                      ELSE CAST(coalesce(t2.chars, 0) AS DOUBLE) / tot.total_chars END, 6) AS top_2gram_char_frac,
                round(CASE WHEN tot.total_chars = 0 THEN 0.0
                      ELSE CAST(coalesce(t3.chars, 0) AS DOUBLE) / tot.total_chars END, 6) AS top_3gram_char_frac,
                round(CASE WHEN tot.total_chars = 0 THEN 0.0
                      ELSE CAST(coalesce(d5.chars, 0) AS DOUBLE) / tot.total_chars END, 6) AS dup_5gram_char_frac
         FROM tot
         LEFT JOIN t2 ON t2.doc_id = tot.doc_id
         LEFT JOIN t3 ON t3.doc_id = tot.doc_id
         LEFT JOIN d5 ON d5.doc_id = tot.doc_id
         ORDER BY tot.doc_id"""
    },

    "q_c4_filters" ->
      """WITH t AS (
           SELECT doc_id, regexp_replace(text, ' (a|the) ', chr(10), 'g') AS text
           FROM documents),
         a AS (
           SELECT doc_id,
                  list_filter(list_transform(string_split(coalesce(text, ''), chr(10)),
                                x -> trim(x)), x -> x <> '') AS lines,
                  contains(lower(coalesce(text, '')), 'lorem ipsum') AS has_lorem,
                  contains(coalesce(text, ''), '{') AS has_brace
           FROM t),
         b AS (
           SELECT doc_id, lines, has_lorem, has_brace,
                  list_filter(lines, l ->
                    regexp_matches(l, '[.!?"]$')
                    AND len(list_filter(string_split(l, ' '), w -> w <> '')) >= 5
                    AND NOT contains(lower(l), 'javascript')) AS kept
           FROM a)
         SELECT doc_id,
                CAST(len(lines) AS BIGINT) AS total_lines,
                CAST(len(kept) AS BIGINT) AS kept_lines,
                has_lorem, has_brace,
                (len(kept) >= 3 AND NOT has_lorem AND NOT has_brace) AS keep_doc,
                coalesce(array_to_string(kept, chr(10)), '') AS kept_text
         FROM b ORDER BY doc_id""",

    // context chunking: k-th chunk = toks[k·s+1 : k·s+w] (1-based
    // end-inclusive slice); chunk count 1 + ceil((n−w)⁺/s) via integer
    // floor-div, zero for empty docs
    "q_chunk_docs" ->
      """WITH d0 AS (
           SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9]+') AS toks
           FROM documents),
         d1 AS (
           SELECT doc_id, toks,
                  CASE WHEN len(toks) = 0 THEN 0
                       ELSE 1 + (GREATEST(len(toks) - 40, 0) + 29) // 30 END AS nc
           FROM d0),
         ex AS (
           SELECT doc_id, toks, unnest(range(0, nc)) AS k FROM d1)
         SELECT doc_id, CAST(k AS BIGINT) AS chunk_idx,
                CAST(len(toks[k*30+1 : k*30+40]) AS BIGINT) AS n_tokens,
                array_to_string(toks[k*30+1 : k*30+40], ' ') AS chunk_text
         FROM ex ORDER BY doc_id, chunk_idx""",

    // Zipf fit: exact integer micro-unit regression sums (HUGEINT covers
    // the decimal(38,0) Spark side), then the identical fixed chain of
    // double ops — ln() quantized per vocab row before any summation
    "q_zipf" ->
      """WITH tk AS (
           SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
           FROM documents),
         f AS (SELECT tok, count(*) AS freq FROM tk GROUP BY tok),
         r AS (SELECT tok, freq,
                      row_number() OVER (ORDER BY freq DESC, tok ASC) AS rnk
               FROM f),
         q AS (SELECT freq,
                      CAST(round(ln(CAST(rnk AS DOUBLE)) * 1e6) AS BIGINT) AS x,
                      CAST(round(ln(CAST(freq AS DOUBLE)) * 1e6) AS BIGINT) AS y
               FROM r),
         a AS (SELECT CAST(count(*) AS BIGINT) AS vocab_size,
                      CAST(sum(freq) AS BIGINT) AS total_tokens,
                      CAST(sum(x) AS DOUBLE) / 1e6 AS sx,
                      CAST(sum(y) AS DOUBLE) / 1e6 AS sy,
                      CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) / 1e12 AS sxy,
                      CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) / 1e12 AS sxx
               FROM q),
         s AS (SELECT vocab_size, total_tokens, sx, sy,
                      (vocab_size * sxy - sx * sy)
                        / (vocab_size * sxx - sx * sx) AS slope
               FROM a)
         SELECT vocab_size, total_tokens,
                round(slope, 6) AS slope,
                round((sy - slope * sx) / vocab_size, 6) AS intercept
         FROM s""",

    "q_novelty" ->
      """WITH d0 AS (
           SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
           FROM documents),
         d AS (
           SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
                    i -> array_to_string(toks[i:i+2], ' '))) AS sh
           FROM d0),
         dd AS MATERIALIZED (
           SELECT doc_id, sh, CAST(len(sh) AS BIGINT) AS n_shingles
           FROM d WHERE len(sh) > 0),
         ex AS (SELECT doc_id, unnest(sh) AS shingle FROM dd),
         s AS (SELECT shingle, count(*) AS dfc, min(doc_id) AS only_doc
               FROM ex GROUP BY 1),
         nv AS (SELECT only_doc AS doc_id, CAST(count(*) AS BIGINT) AS n_novel
               FROM s WHERE dfc = 1 GROUP BY 1)
         SELECT dd.doc_id, dd.n_shingles,
                CAST(coalesce(nv.n_novel, 0) AS BIGINT) AS n_novel,
                round(CAST(coalesce(nv.n_novel, 0) AS DOUBLE) / dd.n_shingles, 6) AS novelty
         FROM dd LEFT JOIN nv USING (doc_id) ORDER BY doc_id""",

    // exact top-k + Count-Min Sketch replay: the sketch rows are the
    // same universal-hash family over the portable md5 base hash, so
    // both engines compute identical bucket sums and identical minima
    "q_heavy_hitters" -> {
      import graft.functions.PortableHash.{P, permConsts, sqlHashMod}
      val consts = permConsts(4).zipWithIndex
      def bucket(e: String, a: Long, b: Long): String =
        s"(((${sqlHashMod(e)} * $a) + $b) % $P) % 1024"
      val cmsCtes = consts.map { case ((a, b), i) =>
        s"cms$i AS (SELECT ${bucket("term", a, b)} AS b, CAST(sum(n_exact) AS BIGINT) AS s FROM c GROUP BY 1)"
      }.mkString(",\n         ")
      val joins = consts.map { case ((a, b), i) =>
        s"JOIN cms$i s$i ON ${bucket("tk.term", a, b)} = s$i.b"
      }.mkString("\n              ")
      val leastArgs = (0 until 4).map(i => s"s$i.s").mkString(", ")
      s"""WITH t AS (
           SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
           FROM documents),
         c AS MATERIALIZED (
           SELECT term, CAST(count(*) AS BIGINT) AS n_exact FROM t GROUP BY 1),
         tk AS (SELECT term, n_exact FROM c ORDER BY n_exact DESC, term LIMIT 50),
         $cmsCtes
         SELECT tk.term, tk.n_exact, least($leastArgs) AS cms_est
         FROM tk $joins
         ORDER BY n_exact DESC, term"""
    },

    // first-merge BPE pair statistics: vocabulary aggregate, then
    // per-distinct-word adjacent pairs weighted by word frequency.
    // DuckDB range(1, n) EXCLUDES n == Spark sequence(1, n-1) INCLUSIVE
    "q_bpe_pairs" ->
      """WITH w AS (
           SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
           FROM documents),
         v AS (SELECT word, CAST(count(*) AS BIGINT) AS wn FROM w GROUP BY 1),
         v2 AS (SELECT * FROM v WHERE length(word) >= 2),
         p AS (SELECT unnest(list_transform(range(1, length(word)),
                 i -> substr(word, CAST(i AS INTEGER), 2))) AS pair, wn
               FROM v2),
         g AS (SELECT pair, CAST(sum(wn) AS BIGINT) AS n FROM p GROUP BY 1)
         SELECT pair, n FROM g ORDER BY n DESC, pair LIMIT 50""",

    "q_gopher_lines" ->
      """WITH t AS (
           SELECT doc_id, regexp_replace(text, ' (a|the) ', chr(10), 'g') AS text
           FROM documents),
         l AS (
           SELECT doc_id, trim(u.x) AS line
           FROM t, unnest(string_split(coalesce(t.text, ''), chr(10))) AS u(x)),
         c AS (
           SELECT doc_id, line, count(*) AS c, CAST(length(line) AS BIGINT) AS ch
           FROM l WHERE line <> '' GROUP BY 1, 2),
         agg AS (
           SELECT doc_id,
                  CAST(sum(c) AS BIGINT) AS total_lines,
                  CAST(sum(c * ch) AS BIGINT) AS total_chars,
                  CAST(coalesce(sum(c) FILTER (WHERE c >= 2), 0) AS BIGINT) AS dup,
                  CAST(coalesce(sum(c * ch) FILTER (WHERE c >= 2), 0) AS BIGINT) AS dupch,
                  CAST(coalesce(sum(c) FILTER (WHERE ends_with(line, '...') OR ends_with(line, chr(8230))), 0) AS BIGINT) AS ell,
                  CAST(coalesce(sum(c) FILTER (WHERE regexp_matches(line, '^[-*' || chr(8226) || '] ')), 0) AS BIGINT) AS bul
           FROM c GROUP BY 1)
         SELECT d.doc_id,
                CAST(coalesce(a.total_lines, 0) AS BIGINT) AS total_lines,
                CAST(coalesce(a.total_chars, 0) AS BIGINT) AS total_chars,
                round(CASE WHEN coalesce(a.total_lines, 0) = 0 THEN 0.0
                      ELSE CAST(a.dup AS DOUBLE) / a.total_lines END, 6) AS dup_line_frac,
                round(CASE WHEN coalesce(a.total_chars, 0) = 0 THEN 0.0
                      ELSE CAST(a.dupch AS DOUBLE) / a.total_chars END, 6) AS dup_line_char_frac,
                round(CASE WHEN coalesce(a.total_lines, 0) = 0 THEN 0.0
                      ELSE CAST(a.ell AS DOUBLE) / a.total_lines END, 6) AS ellipsis_line_frac,
                round(CASE WHEN coalesce(a.total_lines, 0) = 0 THEN 0.0
                      ELSE CAST(a.bul AS DOUBLE) / a.total_lines END, 6) AS bullet_line_frac
         FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
         ORDER BY d.doc_id""",

    "q_redact" ->
      """SELECT doc_id,
                regexp_replace(regexp_replace(text,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                  '[0-9]+', '<NUM>', 'g') AS redacted
         FROM documents ORDER BY doc_id""",

    // canonical URL replay: same manufactured variants, same ASCII
    // regexes (RE2 == Java on these), same normalization order; DuckDB's
    // regexp_replace needs explicit 'g' where Spark's is always global
    // (only the duplicate-slash collapse has >1 match)
    "q_url_canon" ->
      """WITH u AS (
           SELECT doc_id,
             CASE WHEN doc_id % 97 = 0 THEN 'garbage no scheme'
                  WHEN doc_id % 4 = 0 THEN 'http://Example.COM/p' || CAST(doc_id % 50 AS VARCHAR) || '/x?b=2&a=1&utm_source=s#frag'
                  WHEN doc_id % 4 = 1 THEN 'HTTP://example.com:80/p' || CAST(doc_id % 50 AS VARCHAR) || '/x?a=1&b=2'
                  WHEN doc_id % 4 = 2 THEN 'http://example.com/p' || CAST(doc_id % 50 AS VARCHAR) || '/x/?b=2&a=1&utm_campaign=c'
                  ELSE 'http://example.com//p' || CAST(doc_id % 50 AS VARCHAR) || '//x?a=1&ref=r&b=2' END AS url
           FROM documents),
         c AS (
           SELECT doc_id, url,
             lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
             lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS auth,
             regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS rawpath,
             regexp_extract(url, '\?([^#]*)', 1) AS q
           FROM u),
         n AS (
           SELECT doc_id, url, scheme,
             CASE WHEN scheme = 'http' THEN regexp_replace(auth, ':80$', '')
                  WHEN scheme = 'https' THEN regexp_replace(auth, ':443$', '')
                  ELSE auth END AS host,
             CASE WHEN p2 = '' THEN '/' ELSE p2 END AS path,
             array_to_string(list_sort(list_filter(string_split(q, '&'),
               x -> x <> '' AND NOT regexp_matches(x, '^(utm_[a-z0-9_]*|fbclid|gclid|msclkid|ref)(=|$)'))), '&') AS qs
           FROM (SELECT *, CASE WHEN length(p1) > 1 THEN regexp_replace(p1, '/$', '') ELSE p1 END AS p2
                 FROM (SELECT *, regexp_replace(rawpath, '/{2,}', '/', 'g') AS p1 FROM c)))
         SELECT doc_id, url,
           CASE WHEN scheme = '' OR host = '' THEN NULL
                ELSE scheme || '://' || host || path ||
                     CASE WHEN qs = '' THEN '' ELSE '?' || qs END END AS canon
         FROM n ORDER BY doc_id""",

    // NFC replay: chr(769) = combining acute, chr(233) = precomposed é;
    // DuckDB's utf8proc nfc_normalize and java.text.Normalizer both
    // implement UAX#15, so the normalized strings match byte-for-byte
    "q_nfc_normalize" ->
      """WITH u AS (
           SELECT doc_id,
             CASE WHEN doc_id % 2 = 0 THEN 'caf' || chr(101) || chr(769) || ' menu ' || text
                  ELSE 'caf' || chr(233) || ' menu ' || text END AS raw
           FROM documents)
         SELECT doc_id, nfc_normalize(raw) AS nfc,
                CAST(length(raw) AS BIGINT) AS raw_chars,
                CAST(length(nfc_normalize(raw)) AS BIGINT) AS nfc_chars
         FROM u ORDER BY doc_id""",

    // robots replay: the FULL pipeline — line split with positions,
    // comment strip, group assembly (lag + running sum), exact-beats-*
    // group selection, RFC wildcard translation (RE2 '\0' backref where
    // Java uses '$0' — same produced pattern), longest-rule/allow-ties
    // struct max. E'' strings carry the newlines.
    "q_robots_filter" -> s"""$robotsCtes
         SELECT u.doc_id, u.canon,
                coalesce(struct_extract(wins.w, 'a') = 1, TRUE) AS allowed
         FROM uu u LEFT JOIN wins ON wins.doc_id = u.doc_id
         ORDER BY u.doc_id""",

    // frontier rollup over the same pipeline: per-host fetch-budget
    // shape — how much of each domain's URL list robots lets through
    "q_crawl_frontier" -> s"""$robotsCtes
         SELECT u.host, CAST(count(*) AS BIGINT) AS n_urls,
                CAST(sum(CASE WHEN coalesce(struct_extract(wins.w, 'a') = 1, TRUE) THEN 1 ELSE 0 END) AS BIGINT) AS n_allowed,
                round(avg(CASE WHEN coalesce(struct_extract(wins.w, 'a') = 1, TRUE) THEN 1.0 ELSE 0.0 END), 6) AS allowed_ratio
         FROM uu u LEFT JOIN wins ON wins.doc_id = u.doc_id
         GROUP BY u.host ORDER BY u.host""",

    // SURT replay: the q_domain_stats canonicalization chain, then host
    // labels reversed comma-joined + optional port + ')' + path?query
    "q_surt_key" ->
      """WITH u AS (
           SELECT doc_id,
             CASE WHEN doc_id % 97 = 0 THEN 'garbage no scheme'
                  WHEN doc_id % 4 = 0 THEN 'http://H' || CAST(doc_id % 7 AS VARCHAR) || '.Example.COM/p' || CAST(doc_id % 50 AS VARCHAR) || '/x?b=2&a=1&utm_source=s#frag'
                  WHEN doc_id % 4 = 1 THEN 'HTTP://h' || CAST(doc_id % 7 AS VARCHAR) || '.example.com:80/p' || CAST(doc_id % 50 AS VARCHAR) || '/x?a=1&b=2'
                  WHEN doc_id % 4 = 2 THEN 'http://h' || CAST(doc_id % 7 AS VARCHAR) || '.example.com/p' || CAST(doc_id % 50 AS VARCHAR) || '/x/?b=2&a=1&utm_campaign=c'
                  ELSE 'http://h' || CAST(doc_id % 7 AS VARCHAR) || '.example.com//p' || CAST(doc_id % 50 AS VARCHAR) || '//x?a=1&ref=r&b=2' END AS url
           FROM documents),
         c AS (
           SELECT doc_id, url,
             lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
             lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS auth,
             regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS rawpath,
             regexp_extract(url, '\?([^#]*)', 1) AS q
           FROM u),
         n AS (
           SELECT doc_id, scheme,
             CASE WHEN scheme = 'http' THEN regexp_replace(auth, ':80$', '')
                  WHEN scheme = 'https' THEN regexp_replace(auth, ':443$', '')
                  ELSE auth END AS host,
             CASE WHEN p2 = '' THEN '/' ELSE p2 END AS path,
             array_to_string(list_sort(list_filter(string_split(q, '&'),
               x -> x <> '' AND NOT regexp_matches(x, '^(utm_[a-z0-9_]*|fbclid|gclid|msclkid|ref)(=|$)'))), '&') AS qs
           FROM (SELECT *, CASE WHEN length(p1) > 1 THEN regexp_replace(p1, '/$', '') ELSE p1 END AS p2
                 FROM (SELECT *, regexp_replace(rawpath, '/{2,}', '/', 'g') AS p1 FROM c))),
         k AS (
           SELECT doc_id,
             CASE WHEN scheme = '' OR host = '' THEN NULL
                  ELSE scheme || '://' || host || path ||
                       CASE WHEN qs = '' THEN '' ELSE '?' || qs END END AS canon
           FROM n),
         s AS (
           SELECT doc_id, canon,
             regexp_extract(canon, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS hostport
           FROM k)
         SELECT doc_id,
           CASE WHEN canon IS NULL THEN NULL
                ELSE array_to_string(list_reverse(string_split(
                       regexp_extract(hostport, '^([^:]+)', 1), '.')), ',')
                     || regexp_extract(hostport, '(:[0-9]+)$', 1) || ')'
                     || regexp_replace(canon, '^[a-z][a-z0-9+.-]*://[^/?#]+', '') END AS surt
         FROM s ORDER BY doc_id""",

    // per-domain rollup over the same canonicalization pipeline — host
    // varies by doc_id%7 so the grouping has real structure; token mass
    // is the engine-wide alnum tokenizer; sums cast BIGINT (HUGEINT)
    "q_domain_stats" ->
      """WITH u AS (
           SELECT doc_id,
             CASE WHEN doc_id % 97 = 0 THEN 'garbage no scheme'
                  WHEN doc_id % 4 = 0 THEN 'http://H' || CAST(doc_id % 7 AS VARCHAR) || '.Example.COM/p' || CAST(doc_id % 50 AS VARCHAR) || '/x?b=2&a=1&utm_source=s#frag'
                  WHEN doc_id % 4 = 1 THEN 'HTTP://h' || CAST(doc_id % 7 AS VARCHAR) || '.example.com:80/p' || CAST(doc_id % 50 AS VARCHAR) || '/x?a=1&b=2'
                  WHEN doc_id % 4 = 2 THEN 'http://h' || CAST(doc_id % 7 AS VARCHAR) || '.example.com/p' || CAST(doc_id % 50 AS VARCHAR) || '/x/?b=2&a=1&utm_campaign=c'
                  ELSE 'http://h' || CAST(doc_id % 7 AS VARCHAR) || '.example.com//p' || CAST(doc_id % 50 AS VARCHAR) || '//x?a=1&ref=r&b=2' END AS url,
             CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS nt
           FROM documents),
         c AS (
           SELECT doc_id, nt, url,
             lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
             lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS auth,
             regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS rawpath,
             regexp_extract(url, '\?([^#]*)', 1) AS q
           FROM u),
         n AS (
           SELECT doc_id, nt, scheme,
             CASE WHEN scheme = 'http' THEN regexp_replace(auth, ':80$', '')
                  WHEN scheme = 'https' THEN regexp_replace(auth, ':443$', '')
                  ELSE auth END AS host,
             CASE WHEN p2 = '' THEN '/' ELSE p2 END AS path,
             array_to_string(list_sort(list_filter(string_split(q, '&'),
               x -> x <> '' AND NOT regexp_matches(x, '^(utm_[a-z0-9_]*|fbclid|gclid|msclkid|ref)(=|$)'))), '&') AS qs
           FROM (SELECT *, CASE WHEN length(p1) > 1 THEN regexp_replace(p1, '/$', '') ELSE p1 END AS p2
                 FROM (SELECT *, regexp_replace(rawpath, '/{2,}', '/', 'g') AS p1 FROM c))),
         k AS (
           SELECT host, nt,
             CASE WHEN scheme = '' OR host = '' THEN NULL
                  ELSE scheme || '://' || host || path ||
                       CASE WHEN qs = '' THEN '' ELSE '?' || qs END END AS canon
           FROM n)
         SELECT host, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(count(DISTINCT canon) AS BIGINT) AS n_pages,
                CAST(sum(nt) AS BIGINT) AS n_tokens,
                round(1.0 - CAST(count(DISTINCT canon) AS DOUBLE) / count(*), 6) AS dup_ratio
         FROM k WHERE canon IS NOT NULL
         GROUP BY host ORDER BY host""",

    // markup strip replay: same manufactured wrap, same three regex
    // passes (RE2 reads (?is)/lazy .*? identically to Java regex), same
    // fixed entity order with &amp; LAST (one decode pass — the
    // manufactured &amp;lt; must come out as the literal text '&lt;')
    "q_strip_markup" ->
      """WITH wrapped AS (
           SELECT doc_id,
                  '<div class="doc"><!-- crawl artifact -->' ||
                  replace(text, ' the ', ' <b>the</b> ') ||
                  '</div><script type="text/javascript">var x = 1 < 2;</script>&amp; &lt;tail&gt;&nbsp;&amp;lt;ok' AS html
           FROM documents)
         SELECT doc_id,
                trim(regexp_replace(
                  replace(replace(replace(replace(replace(replace(replace(
                    regexp_replace(regexp_replace(regexp_replace(html,
                      '(?is)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g'),
                      '(?s)<!--.*?-->', ' ', 'g'),
                      '<[^>]*>', ' ', 'g'),
                    '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                    '&#39;', ''''), '&apos;', ''''), '&amp;', '&'),
                  '[ \t\r\n\f]+', ' ', 'g')) AS clean
         FROM wrapped ORDER BY doc_id""",

    "q_length_quantiles" ->
      """SELECT lang,
                round(quantile_cont(n_chars, 0.25), 4) AS p25,
                round(quantile_cont(n_chars, 0.5), 4) AS p50,
                round(quantile_cont(n_chars, 0.75), 4) AS p75,
                round(quantile_cont(n_chars, 0.95), 4) AS p95,
                count(*) AS n_docs,
                round(avg(n_chars), 4) AS mean
         FROM documents GROUP BY lang ORDER BY lang""",

    "q_quality" ->
      """SELECT doc_id,
                CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens,
                CAST(length(text) AS BIGINT) AS n_chars_m,
                round(CASE WHEN len(regexp_extract_all(text, '[A-Za-z0-9]+')) > 0 THEN
                  CAST(list_sum(list_transform(regexp_extract_all(text, '[A-Za-z0-9]+'),
                       t -> length(t))) AS DOUBLE)
                  / len(regexp_extract_all(text, '[A-Za-z0-9]+')) END, 4) AS avg_token_len,
                round(CASE WHEN len(regexp_extract_all(text, '[A-Za-z0-9]+')) > 0 THEN
                  CAST(len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), w -> w = 'the'))
                     + len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), w -> w = 'and'))
                     + len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), w -> w = 'of'))
                     + len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), w -> w = 'to'))
                     + len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), w -> w = 'is')) AS DOUBLE)
                  / len(regexp_extract_all(text, '[A-Za-z0-9]+')) END, 4) AS stopword_ratio
         FROM documents ORDER BY doc_id""",

    "q_tfidf" ->
      """WITH tok AS (
           SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
           FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
         idf AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
         n AS (SELECT count(*) AS n_docs FROM documents),
         s AS (
           SELECT doc_id, term, tf * ln((n_docs + 1.0) / (df + 1.0)) AS tfidf
           FROM tf JOIN idf USING (term) CROSS JOIN n),
         r AS (
           SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
           FROM s)
         SELECT doc_id, term, round(tfidf, 6) AS tfidf, CAST(rank AS BIGINT) AS rank
         FROM r WHERE rank <= 3 ORDER BY doc_id, rank""",

    "q_multimodal_features" ->
      """SELECT doc_id AS media_id,
                CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                CAST(32 AS INTEGER) AS n_bytes,
                round(list_sum(list_transform(range(1, 33),
                  i -> (strpos('0123456789abcdef', substr(h, 2*i-1, 1)) - 1) * 16.0
                     + (strpos('0123456789abcdef', substr(h, 2*i, 1)) - 1))) / 32.0, 4) AS byte_mean
         FROM (SELECT doc_id, lower(sha256(CAST(doc_id AS VARCHAR))) AS h FROM documents)
         ORDER BY media_id""",

    // ---- portable-hash pipelines: the oracle reproduces the md5-based
    // hashing (graft.functions.PortableHash) end-to-end in SQL ----,

    "q_fingerprint" -> {
      import graft.functions.PortableHash.{P, sqlHashMod}
      s"""SELECT doc_id,
                list_reduce(
                  list_prepend(CAST(1299709 AS BIGINT),
                    list_transform(regexp_extract_all(text, '[A-Za-z0-9]+'),
                      t -> ${sqlHashMod("t")})),
                  (acc, x) -> (acc * 31 + x) % $P) AS fp
         FROM documents ORDER BY doc_id"""
    },

    "q_perplexity" ->
      """WITH tok AS (
           SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
           FROM documents),
         v AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
         n AS (SELECT count(*) AS n FROM tok)
         SELECT doc_id, count(*) AS n_tokens,
                round(avg(-ln(CAST(c AS DOUBLE) / n)), 6) AS avg_nll,
                round(exp(avg(-ln(CAST(c AS DOUBLE) / n))), 6) AS ppl
         FROM tok JOIN v USING (term) CROSS JOIN n
         GROUP BY doc_id ORDER BY doc_id""",

    "q_bigram_ppl" ->
      """WITH d0 AS (
           SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
           FROM documents),
         bg AS MATERIALIZED (
           SELECT doc_id, unnest(toks[1:-2]) AS prev, unnest(toks[2:-1]) AS cur
           FROM d0 WHERE len(toks) >= 2),
         bc AS (SELECT prev, cur, count(*) AS cb FROM bg GROUP BY 1, 2),
         uc AS (SELECT prev, count(*) AS cu FROM bg GROUP BY 1),
         v AS (SELECT count(DISTINCT term) AS v
               FROM (SELECT unnest(toks) AS term FROM d0)),
         nll AS (
           SELECT doc_id,
                  -ln((cb + 1.0) / (cu + 1.0 * v)) AS x
           FROM bg JOIN bc USING (prev, cur) JOIN uc USING (prev) CROSS JOIN v)
         SELECT doc_id, count(*) AS n_bigrams,
                round(avg(x), 6) AS avg_nll,
                round(exp(avg(x)), 6) AS ppl
         FROM nll GROUP BY doc_id ORDER BY doc_id""",

    "q_pmi_pairs" ->
      """WITH d0 AS (
           SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
           FROM documents),
         bg AS MATERIALIZED (
           SELECT doc_id, unnest(toks[1:-2]) AS prev, unnest(toks[2:-1]) AS cur
           FROM d0 WHERE len(toks) >= 2),
         bc AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS n
                FROM bg GROUP BY 1, 2 HAVING count(*) >= 5),
         pc AS (SELECT prev, count(*) AS cp FROM bg GROUP BY 1),
         cc AS (SELECT cur, count(*) AS ccn FROM bg GROUP BY 1),
         t AS (SELECT count(*) AS nt FROM bg)
         SELECT prev, cur, n,
                round(ln(CAST(n AS DOUBLE) * nt / (cp * ccn)), 6) AS pmi
         FROM bc JOIN pc USING (prev) JOIN cc USING (cur) CROSS JOIN t
         ORDER BY ln(CAST(n AS DOUBLE) * nt / (cp * ccn)) DESC, prev, cur
         LIMIT 50""",

    "q_token_counts" -> {
      val bpe = graft.pipeline.TextAnalysis.BpePretokenPattern.replace("'", "''")
      s"""SELECT doc_id,
                CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS n_ws,
                CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_alnum,
                CAST(len(regexp_extract_all(text, '$bpe')) AS BIGINT) AS n_bpe
         FROM documents ORDER BY doc_id"""
    },

  )
}
