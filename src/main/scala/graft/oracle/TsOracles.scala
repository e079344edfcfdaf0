package graft.oracle

import graft.pipeline.{Sampling, TextAnalysis}

/** DuckDB oracle twins for the Ts query family — split out of
  * SparkEntry.oracleSql (r17, maintenance: the single file had reached
  * 4k lines). VERBATIM moves: every SQL string and helper is unchanged,
  * and the assembled map's key set is identical, so the Verify dump is
  * byte-identical. Portability rules are documented on SparkEntry.
  */
private[graft] object TsOracles {

  def sql: Map[String, String] = Map(
    "q_grid_reindex" ->
      """WITH spine AS (
           SELECT unnest(generate_series(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-08', INTERVAL 1 HOUR)) AS ts),
         users AS (SELECT DISTINCT user_id FROM events WHERE user_id < 10),
         vals AS (
           SELECT user_id, date_trunc('hour', ts) AS ts, round(avg(value), 4) AS value_avg
           FROM events WHERE user_id < 10 GROUP BY 1, 2)
         SELECT u.user_id, s.ts, v.value_avg
         FROM users u CROSS JOIN spine s
         LEFT JOIN vals v ON v.user_id = u.user_id AND v.ts = s.ts
         ORDER BY u.user_id, s.ts""",

    "q_combine_first" ->
      """WITH uniq AS (
           SELECT l_orderkey, l_shipdate AS ts, l_linenumber,
                  max(CASE WHEN l_discount < 0.02 THEN NULL ELSE l_quantity END) AS val
           FROM lineitem GROUP BY 1, 2, 3)
         SELECT l_orderkey, ts,
                arg_min(val, l_linenumber) FILTER (WHERE val IS NOT NULL) AS value
         FROM uniq GROUP BY 1, 2""",

    "q_version_combine" ->
      """WITH uniq AS (
           SELECT l_orderkey, l_linenumber, l_shipdate AS ts,
                  max(CASE WHEN l_tax > 0.06 THEN NULL ELSE l_extendedprice END) AS val
           FROM lineitem GROUP BY 1, 2, 3)
         SELECT l_orderkey, ts,
                arg_max(val, l_linenumber) FILTER (WHERE val IS NOT NULL) AS value
         FROM uniq GROUP BY 1, 2""",

    "q_version_select" ->
      """WITH uniq AS (
           SELECT l_orderkey, l_linenumber, l_shipdate AS ts,
                  max(CASE WHEN l_tax > 0.06 THEN NULL ELSE l_extendedprice END) AS val
           FROM lineitem WHERE l_linenumber >= 2 GROUP BY 1, 2, 3)
         SELECT l_orderkey, ts,
                arg_min(val, l_linenumber) FILTER (WHERE val IS NOT NULL) AS value
         FROM uniq GROUP BY 1, 2""",

    "q_update_merge" ->
      """WITH newd AS (
           SELECT l_orderkey, l_linenumber, l_shipdate AS ts, max(l_quantity*2) AS v, 0 AS p
           FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-01' GROUP BY 1, 2, 3),
         oldd AS (
           SELECT l_orderkey, l_linenumber, l_shipdate AS ts, max(l_quantity) AS v, 1 AS p
           FROM lineitem GROUP BY 1, 2, 3),
         u AS (SELECT * FROM newd UNION ALL SELECT * FROM oldd)
         SELECT l_orderkey, l_linenumber, ts,
                arg_min(v, p) FILTER (WHERE v IS NOT NULL) AS value
         FROM u GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",

    "q_islands" ->
      """WITH f AS (
           SELECT user_id, ts, event_id, event_type AS value,
                  CASE WHEN event_type IS NOT DISTINCT FROM
                            lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       THEN 0 ELSE 1 END AS chg
           FROM events),
         g AS (
           SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS grp
           FROM f)
         SELECT user_id, min(ts) AS run_start, max(ts) AS run_end,
                min(value) AS value, count(*) AS run_len
         FROM g GROUP BY user_id, grp ORDER BY user_id, run_start""",

    // identical semantics to q_islands — the split form must reproduce the
    // whole-series window's islands exactly
    "q_islands_split" ->
      """WITH f AS (
           SELECT user_id, ts, event_id, event_type AS value,
                  CASE WHEN event_type IS NOT DISTINCT FROM
                            lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       THEN 0 ELSE 1 END AS chg
           FROM events),
         g AS (
           SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS grp
           FROM f)
         SELECT user_id, min(ts) AS run_start, max(ts) AS run_end,
                min(value) AS value, count(*) AS run_len
         FROM g GROUP BY user_id, grp ORDER BY user_id, run_start""",

    "q_holes" ->
      """WITH spine AS (
           SELECT unnest(generate_series(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-30', INTERVAL 1 DAY)) AS ts),
         users AS (SELECT range AS user_id FROM range(20)),
         vals AS (
           SELECT user_id, date_trunc('day', ts) AS ts, CAST(count(*) AS DOUBLE) AS v
           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
         dense AS (
           SELECT u.user_id, s.ts, v.v
           FROM users u CROSS JOIN spine s
           LEFT JOIN vals v ON v.user_id = u.user_id AND v.ts = s.ts),
         f AS (
           SELECT *, CASE WHEN (v IS NULL) IS NOT DISTINCT FROM
                               lag(v IS NULL) OVER (PARTITION BY user_id ORDER BY ts)
                          THEN 0 ELSE 1 END AS chg
           FROM dense),
         g AS (
           SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS grp
           FROM f)
         SELECT user_id, min(ts) AS hole_start, max(ts) AS hole_end
         FROM g WHERE v IS NULL GROUP BY user_id, grp ORDER BY user_id, hole_start""",

    "q_holes_mindelta" ->
      """WITH spine AS (
           SELECT unnest(generate_series(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-30', INTERVAL 1 DAY)) AS ts),
         users AS (SELECT range AS user_id FROM range(20)),
         vals AS (
           SELECT user_id, date_trunc('day', ts) AS ts, CAST(count(*) AS DOUBLE) AS v
           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
         dense AS (
           SELECT u.user_id, s.ts, v.v
           FROM users u CROSS JOIN spine s
           LEFT JOIN vals v ON v.user_id = u.user_id AND v.ts = s.ts),
         f AS (
           SELECT *, CASE WHEN (v IS NULL) IS NOT DISTINCT FROM
                               lag(v IS NULL) OVER (PARTITION BY user_id ORDER BY ts)
                          THEN 0 ELSE 1 END AS chg
           FROM dense),
         g AS (
           SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS grp
           FROM f),
         h AS (
           SELECT user_id, min(ts) AS hole_start, max(ts) AS hole_end
           FROM g WHERE v IS NULL GROUP BY user_id, grp)
         SELECT user_id, hole_start, hole_end FROM h
         WHERE (hole_start = TIMESTAMP '2024-01-01' AND hole_end = TIMESTAMP '2024-01-30')
            OR (hole_start <> TIMESTAMP '2024-01-01' AND hole_end <> TIMESTAMP '2024-01-30')
            OR (date_diff('second', hole_start, hole_end) + 86400 >= 259200)
         ORDER BY user_id, hole_start""",

    "q_interval_union" ->
      """WITH iv AS (
           SELECT o_custkey, o_orderdate AS s, o_orderdate + INTERVAL 30 DAY AS e FROM orders),
         f AS (
           SELECT *, max(e) OVER (PARTITION BY o_custkey ORDER BY s, e
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
           FROM iv),
         g AS (SELECT *, CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS nw FROM f),
         h AS (
           SELECT *, sum(nw) OVER (PARTITION BY o_custkey ORDER BY s, e
                                   ROWS UNBOUNDED PRECEDING) AS isl
           FROM g)
         SELECT o_custkey, min(s) AS merged_start, max(e) AS merged_end, count(*) AS n_merged
         FROM h GROUP BY o_custkey, isl ORDER BY o_custkey, merged_start""",

    "q_find_groups" ->
      """WITH spine AS (
           SELECT unnest(generate_series(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-15', INTERVAL 1 DAY)) AS ts),
         users AS (SELECT range AS user_id FROM range(30)),
         vals AS (
           SELECT user_id, date_trunc('day', ts) AS ts, CAST(count(*) AS DOUBLE) AS v
           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
         dense AS (
           SELECT u.user_id, s.ts, v.v
           FROM users u CROSS JOIN spine s
           LEFT JOIN vals v ON v.user_id = u.user_id AND v.ts = s.ts),
         f AS (
           SELECT *, CASE WHEN (v IS NULL) IS NOT DISTINCT FROM
                               lag(v IS NULL) OVER (PARTITION BY user_id ORDER BY ts)
                          THEN 0 ELSE 1 END AS chg
           FROM dense),
         g AS (
           SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS grp
           FROM f),
         holes AS (
           SELECT user_id, min(ts) AS hole_start, max(ts) AS hole_end
           FROM g WHERE v IS NULL GROUP BY user_id, grp),
         sigs AS (
           SELECT u.user_id,
                  coalesce(string_agg(CAST(h.hole_start AS VARCHAR) || '~' || CAST(h.hole_end AS VARCHAR),
                                      ';' ORDER BY h.hole_start), '') AS missing_sig
           FROM users u LEFT JOIN holes h USING (user_id) GROUP BY u.user_id)
         SELECT missing_sig,
                string_agg(CAST(user_id AS VARCHAR), ',' ORDER BY user_id) AS member_keys,
                count(*) AS n_keys
         FROM sigs GROUP BY 1 ORDER BY 1""",

    "q_trim_bounds" ->
      """WITH e AS (
           SELECT user_id, event_id, ts,
                  CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value
           FROM events),
         b AS (
           SELECT *,
                  min(CASE WHEN value IS NOT NULL THEN ts END) OVER (PARTITION BY user_id) AS lo,
                  max(CASE WHEN value IS NOT NULL THEN ts END) OVER (PARTITION BY user_id) AS hi
           FROM e)
         SELECT user_id, event_id, ts, value FROM b
         WHERE ts >= lo AND ts <= hi ORDER BY user_id, event_id""",

    "q_delay_slice" ->
      """WITH m AS (
           SELECT *, min(ts) OVER (PARTITION BY user_id) AS min_ts FROM events)
         SELECT user_id, count(*) AS n, round(sum(value), 4) AS sum_value
         FROM m WHERE ts >= min_ts + INTERVAL 72 HOUR
         GROUP BY user_id ORDER BY user_id""",

    "q_normalize" ->
      """WITH b AS (
           SELECT event_id, user_id, value,
                  min(value) OVER (PARTITION BY user_id) AS lo,
                  max(value) OVER (PARTITION BY user_id) AS hi
           FROM events)
         SELECT event_id, user_id,
                round(CASE WHEN hi > lo THEN (value - lo) / (hi - lo) END, 6) AS value_norm
         FROM b ORDER BY event_id""",

    "q_min_freq" ->
      """WITH s AS (
           SELECT user_id,
                  epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS step
           FROM events)
         SELECT user_id, min(step) AS min_step_us FROM s GROUP BY 1 ORDER BY 1""",

    // same sequential fold as Spark's aggregate(): acc starts at the first
    // (ts-ordered, value tie-break) value, then acc*0.7 + x*0.3 per step
    "q_ewma" ->
      """WITH s AS (
           SELECT user_id, list(CAST(value AS DOUBLE) ORDER BY ts, value) AS vs
           FROM events WHERE user_id < 40 GROUP BY 1)
         SELECT user_id, CAST(len(vs) AS BIGINT) AS n,
                round(CAST(list_reduce(vs, (acc, x) -> acc * 0.7 + x * 0.3) AS DOUBLE), 6) AS ewma
         FROM s ORDER BY user_id""",

    "q_winsorize" ->
      """WITH b AS (
           SELECT user_id,
                  quantile_cont(value, 0.05) AS lo, quantile_cont(value, 0.95) AS hi
           FROM events WHERE user_id < 10 GROUP BY 1)
         SELECT e.event_id, e.user_id,
                round(least(greatest(e.value, b.lo), b.hi), 6) AS value_clipped
         FROM events e JOIN b USING (user_id)
         WHERE e.user_id < 10 ORDER BY e.event_id""",

    "q_histogram" ->
      """WITH binned AS (
           SELECT user_id,
                  CAST(least(greatest(floor(value / 5.0), 0), 19) AS BIGINT) AS bin
           FROM events WHERE user_id < 10)
         SELECT user_id, bin, round(bin * 5.0, 6) AS bin_lo,
                CAST(count(*) AS BIGINT) AS n
         FROM binned GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_mad_outliers" ->
      """WITH med AS (
           SELECT user_id, quantile_cont(value, 0.5) AS m
           FROM events WHERE user_id < 20 GROUP BY 1),
         mad AS (
           SELECT e.user_id, quantile_cont(abs(e.value - med.m), 0.5) AS d,
                  any_value(med.m) AS m
           FROM events e JOIN med USING (user_id)
           WHERE e.user_id < 20 GROUP BY e.user_id)
         SELECT e.event_id, e.user_id, round(e.value, 6) AS value
         FROM events e JOIN mad USING (user_id)
         WHERE e.user_id < 20
           AND abs(e.value - mad.m) > 3.5 * 1.4826 * mad.d
         ORDER BY e.event_id""",

    "q_ohlc" ->
      """WITH b AS (
           SELECT user_id, date_trunc('hour', ts) AS period, ts, value
           FROM events WHERE user_id < 50 AND value IS NOT NULL),
         g AS (
           SELECT user_id, period,
                  list(value ORDER BY ts, value) AS vs,
                  max(value) AS high, min(value) AS low,
                  count(*) AS n
           FROM b GROUP BY 1, 2)
         SELECT user_id, period,
                round(vs[1], 6) AS open, round(high, 6) AS high,
                round(low, 6) AS low, round(vs[len(vs)], 6) AS close,
                CAST(n AS BIGINT) AS n
         FROM g ORDER BY user_id, period""",

    "q_counter_delta" ->
      """WITH w AS (
           SELECT user_id, event_id, ts, value,
                  lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events WHERE user_id < 20)
         SELECT user_id, event_id, ts, round(value, 6) AS value,
                round(CASE WHEN prev IS NULL THEN NULL
                           WHEN value < prev THEN value
                           ELSE value - prev END, 6) AS delta,
                (prev IS NOT NULL AND value < prev) AS is_reset
         FROM w ORDER BY user_id, event_id""",

    // CUSUM: HUGEINT window sums mirror Spark's decimal(38,0) — every
    // drift term is n·x − Σx − n·slack in integer micro-units; the one
    // float division per row comes last, in the same fixed op order
    "q_cusum" ->
      """WITH b AS (
           SELECT user_id, ts, value,
                  CAST(round(value * 1e6) AS HUGEINT) AS xq
           FROM events WHERE user_id < 20),
         s1 AS (
           SELECT user_id, ts, value, xq,
                  count(*) OVER (PARTITION BY user_id) AS n,
                  sum(xq) OVER (PARTITION BY user_id) AS sq
           FROM b),
         s2 AS (
           SELECT *, xq * n - sq - 25000000 * n AS ehi,
                     sq - xq * n - 25000000 * n AS elo
           FROM s1),
         s3 AS (
           SELECT *, sum(ehi) OVER w AS phi, sum(elo) OVER w AS plo
           FROM s2
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, value ROWS UNBOUNDED PRECEDING)),
         s4 AS (
           SELECT *, least(min(phi) OVER w, 0) AS mhi, least(min(plo) OVER w, 0) AS mlo
           FROM s3
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, value ROWS UNBOUNDED PRECEDING))
         SELECT user_id, ts, value,
                CAST(((phi - mhi) * 2 + n) // (n * 2) AS DOUBLE) / 1e6 AS cusum_hi,
                CAST(((plo - mlo) * 2 + n) // (n * 2) AS DOUBLE) / 1e6 AS cusum_lo,
                (phi - mhi > 200000000 * n OR plo - mlo > 200000000 * n) AS alarm
         FROM s4 ORDER BY user_id, ts, value""",

    "q_deseasonalize" ->
      """WITH prof AS (
           SELECT user_id, dayofweek(ts) AS dow, hour(ts) AS hod,
                  avg(value) AS profile_mean
           FROM events WHERE user_id < 5 GROUP BY 1, 2, 3)
         SELECT e.event_id, e.user_id,
                round(p.profile_mean, 6) AS profile_mean,
                round(e.value - p.profile_mean, 6) AS residual
         FROM events e
         JOIN prof p ON p.user_id = e.user_id
           AND p.dow = dayofweek(e.ts) AND p.hod = hour(e.ts)
         WHERE e.user_id < 5 ORDER BY e.event_id""",

    "q_ffill" ->
      """WITH spine AS (
           SELECT unnest(generate_series(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-07 23:00:00', INTERVAL 1 HOUR)) AS ts),
         vals AS (
           SELECT user_id, date_trunc('hour', ts) AS ts, round(avg(value), 4) AS value_avg
           FROM events
           WHERE user_id < 5 AND ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
           GROUP BY 1, 2),
         users AS (SELECT DISTINCT user_id FROM vals),
         dense AS (
           SELECT u.user_id, s.ts, v.value_avg
           FROM users u CROSS JOIN spine s
           LEFT JOIN vals v ON v.user_id = u.user_id AND v.ts = s.ts)
         SELECT user_id, ts,
                last_value(value_avg IGNORE NULLS) OVER (
                  PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS value_ffill
         FROM dense ORDER BY user_id, ts""",

    "q_interpolate" ->
      """WITH spine AS (
           SELECT unnest(generate_series(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-07 23:00:00', INTERVAL 1 HOUR)) AS ts),
         vals AS (
           SELECT user_id, date_trunc('hour', ts) AS ts, round(avg(value), 4) AS value_avg
           FROM events
           WHERE user_id < 5 AND ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
           GROUP BY 1, 2),
         users AS (SELECT DISTINCT user_id FROM vals),
         dense AS (
           SELECT u.user_id, s.ts, v.value_avg
           FROM users u CROSS JOIN spine s
           LEFT JOIN vals v ON v.user_id = u.user_id AND v.ts = s.ts),
         brk AS (
           SELECT user_id, ts, value_avg,
                  last_value(value_avg IGNORE NULLS) OVER (
                    PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS pv,
                  last_value(CASE WHEN value_avg IS NOT NULL THEN epoch_us(ts) END IGNORE NULLS) OVER (
                    PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS pt,
                  first_value(value_avg IGNORE NULLS) OVER (
                    PARTITION BY user_id ORDER BY ts ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
                  first_value(CASE WHEN value_avg IS NOT NULL THEN epoch_us(ts) END IGNORE NULLS) OVER (
                    PARTITION BY user_id ORDER BY ts ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
           FROM dense)
         SELECT user_id, ts,
                round(CASE WHEN value_avg IS NOT NULL THEN value_avg
                      WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                        pv + (nv - pv) * (CAST(epoch_us(ts) - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE))
                      END, 6) AS value_interp
         FROM brk ORDER BY user_id, ts""",

    "q_rolling_median" ->
      """SELECT event_id, user_id,
                round(quantile_cont(value, 0.5) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 23 PRECEDING AND CURRENT ROW), 6) AS roll_med
         FROM events WHERE user_id < 5 ORDER BY event_id""",

    "q_peak_offpeak" ->
      """WITH t AS (
           SELECT user_id, value,
                  dayofweek(ts) NOT IN (0, 6)
                    AND hour(ts) >= 8 AND hour(ts) < 20 AS is_peak
           FROM events WHERE user_id < 40)
         SELECT user_id, is_peak, round(sum(value), 4) AS energy,
                CAST(count(*) AS BIGINT) AS n
         FROM t GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_load_factor" ->
      """SELECT user_id, date_trunc('day', ts) AS day,
                round(CASE WHEN max(value) > 0 THEN avg(value) / max(value) END, 6) AS load_factor
         FROM events WHERE user_id < 10
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_autocorr" ->
      """WITH lagged AS (
           SELECT user_id, value,
                  lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pv
           FROM events WHERE user_id < 40)
         SELECT user_id,
                CAST(count(CASE WHEN value IS NOT NULL AND pv IS NOT NULL THEN 1 END) AS BIGINT) AS n_pairs,
                round(corr(value, pv), 6) AS acf
         FROM lagged GROUP BY 1 ORDER BY 1""",

    "q_upsample" ->
      """WITH spine AS (
           SELECT unnest(generate_series(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-07 23:00:00', INTERVAL 1 HOUR)) AS ts),
         users AS (SELECT range AS user_id FROM range(3)),
         ref AS (SELECT date_trunc('hour', ts) AS ts, round(sum(value), 4) AS r FROM events GROUP BY 1),
         feat AS (
           SELECT user_id, date_trunc('day', ts) AS day, round(sum(value), 4) AS f
           FROM events WHERE user_id < 3 GROUP BY 1, 2),
         dense AS (
           SELECT u.user_id, s.ts, date_trunc('day', s.ts) AS day,
                  coalesce(ref.r, 0) AS ref, feat.f AS feat
           FROM users u CROSS JOIN spine s
           LEFT JOIN ref ON ref.ts = s.ts
           LEFT JOIN feat ON feat.user_id = u.user_id AND feat.day = date_trunc('day', s.ts)),
         g AS (
           SELECT user_id, day, sum(ref) AS sum_ref, count(ref) AS cnt_ref,
                  arg_min(ref, ts) AS first_ref, min(ts) AS min_ts
           FROM dense GROUP BY 1, 2),
         g2 AS (
           SELECT *, lead(first_ref) OVER (PARTITION BY user_id ORDER BY min_ts) AS next_ref
           FROM g),
         m AS (
           SELECT d.*,
                  CASE WHEN g2.cnt_ref + CASE WHEN g2.next_ref IS NOT NULL THEN 1 ELSE 0 END = 0
                       THEN NULL
                       ELSE (coalesce(g2.sum_ref, 0) + coalesce(g2.next_ref, 0)) /
                            (g2.cnt_ref + CASE WHEN g2.next_ref IS NOT NULL THEN 1 ELSE 0 END)
                  END AS mr
           FROM dense d JOIN g2 ON g2.user_id = d.user_id AND g2.day = d.day)
         SELECT user_id, ts,
                round(CASE WHEN mr = 0 THEN feat ELSE feat*ref/mr END, 4) AS value_up
         FROM m ORDER BY user_id, ts""",

    "q_sessionize" ->
      """WITH g AS (
           SELECT user_id, ts, value, event_id,
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events),
         f AS (
           SELECT *, CASE WHEN prev IS NULL
                            OR epoch_us(ts) - epoch_us(prev) > 1800 * 1000000 THEN 1 ELSE 0 END AS nw
           FROM g),
         h AS (
           SELECT *, sum(nw) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_id
           FROM f)
         SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                min(ts) AS session_start, max(ts) AS session_end,
                count(*) AS n_events, round(sum(value), 4) AS sum_value
         FROM h GROUP BY 1, 2 ORDER BY user_id, session_start""",

    "q_moving_avg" ->
      """SELECT user_id, event_id, ts,
                round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS ma5
         FROM events ORDER BY user_id, event_id""",

    "q_range_join" ->
      """WITH ev AS (
           SELECT user_id, event_id, event_type,
                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
           FROM events),
         p AS (SELECT user_id, event_id, ts_us FROM ev WHERE event_type = 'purchase'),
         v AS (SELECT user_id, event_id AS view_id, ts_us AS start_us,
                      ts_us + 7200000000 AS end_us
               FROM ev WHERE event_type = 'view')
         SELECT p.user_id, p.event_id, v.view_id
         FROM p JOIN v
           ON p.user_id = v.user_id AND p.ts_us BETWEEN v.start_us AND v.end_us
         ORDER BY 1, 2, 3""",

    // DuckDB has a native ASOF LEFT JOIN; ts is cast to TIMESTAMP so both
    // engines compare the same microsecond values regardless of the
    // fixture's physical timestamp type (events() is schema-adaptive)
    "q_asof_join" ->
      """WITH ev AS (
           SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
         clicks AS (SELECT user_id, event_id, ts FROM ev WHERE event_type = 'click'),
         views AS (
           SELECT user_id, ts, max(value) AS view_value
           FROM ev WHERE event_type = 'view' GROUP BY 1, 2)
         SELECT c.user_id, c.event_id, c.ts,
                CASE WHEN v.ts IS NOT NULL AND c.ts <= v.ts + INTERVAL 6 HOUR
                     THEN round(v.view_value, 6) END AS view_value
         FROM clicks c ASOF LEFT JOIN views v
           ON c.user_id = v.user_id AND c.ts >= v.ts
         ORDER BY c.user_id, c.event_id""",

    // same oracle as q_asof_join — the split form must be observationally
    // identical to the direct window
    "q_asof_split" ->
      """WITH ev AS (
           SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
         clicks AS (SELECT user_id, event_id, ts FROM ev WHERE event_type = 'click'),
         views AS (
           SELECT user_id, ts, max(value) AS view_value
           FROM ev WHERE event_type = 'view' GROUP BY 1, 2)
         SELECT c.user_id, c.event_id, c.ts,
                CASE WHEN v.ts IS NOT NULL AND c.ts <= v.ts + INTERVAL 6 HOUR
                     THEN round(v.view_value, 6) END AS view_value
         FROM clicks c ASOF LEFT JOIN views v
           ON c.user_id = v.user_id AND c.ts >= v.ts
         ORDER BY c.user_id, c.event_id""",

  )
}
