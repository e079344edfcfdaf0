package graft.oracle

import graft.pipeline.{Sampling, TextAnalysis}

/** DuckDB oracle twins for the Store query family — split out of
  * SparkEntry.oracleSql (r17, maintenance: the single file had reached
  * 4k lines). VERBATIM moves: every SQL string and helper is unchanged,
  * and the assembled map's key set is identical, so the Verify dump is
  * byte-identical. Portability rules are documented on SparkEntry.
  */
private[graft] object StoreOracles {

  def sql: Map[String, String] = Map(
    "q_scan_filter" ->
      """SELECT event_id, ts, value FROM events
         WHERE user_id = 7 AND event_type = 'view'
           AND ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-20'
         ORDER BY event_id""",

    "q_lookup_filter" ->
      """SELECT user_id, count(*) AS n, round(sum(value), 4) AS sum_value
         FROM events
         WHERE user_id IN (1, 5, 9, 23)
           AND ts BETWEEN TIMESTAMP '2024-01-10' AND TIMESTAMP '2024-02-20'
           AND event_type LIKE 'vi%' AND value < 50.0
         GROUP BY 1 ORDER BY 1""",

    "q_chunk_prune" ->
      """SELECT CAST(year(ts)*12 + month(ts) - 1 AS INTEGER) AS chunk_index,
                count(*) AS n, round(sum(value), 4) AS sum_value
         FROM events
         WHERE year(ts)*12 + month(ts) - 1 BETWEEN 24288 AND 24289
         GROUP BY 1 ORDER BY 1""",

    "q_max_horodate" ->
      """SELECT r.user_id, m.max_horodate
         FROM (SELECT range AS user_id FROM range(160)) r
         LEFT JOIN (SELECT user_id, max(ts) AS max_horodate FROM events
                    WHERE event_type <> 'error' GROUP BY 1) m USING (user_id)
         ORDER BY r.user_id""",

    "q_last_updated" ->
      """SELECT r.user_id, coalesce(m.mx, TIMESTAMP '2000-01-01') AS last_updated
         FROM (SELECT range AS user_id FROM range(20)) r
         LEFT JOIN (SELECT user_id, max(ts) AS mx FROM events
                    WHERE event_type = 'signup' GROUP BY 1) m USING (user_id)
         ORDER BY r.user_id""",

    "q_counts" ->
      """SELECT event_type, count(*) AS n_events,
                count(DISTINCT user_id) AS n_users, max(event_id) AS max_event_id
         FROM events GROUP BY 1 ORDER BY 1""",

    "q_sync_updates" ->
      """SELECT user_id, date_trunc('day', ts) AS chunk_day, max(ts) AS updated_at
         FROM events GROUP BY 1, 2
         HAVING max(ts) >= TIMESTAMP '2024-01-15'
         ORDER BY updated_at, user_id, chunk_day
         LIMIT 100 OFFSET 50""",

    "q_absent_keys" ->
      """SELECT range AS user_id FROM range(200)
         EXCEPT SELECT DISTINCT user_id FROM events
         ORDER BY user_id""",

    "q_tombstone_filter" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_value
         FROM events WHERE event_id % 7 <> 0
         GROUP BY 1 ORDER BY 1""",

    "q_store_replace" ->
      """WITH oldv AS (
           SELECT user_id, date_trunc('day', ts) AS ts, round(avg(value), 6) AS value
           FROM events WHERE user_id IN (0, 2) AND event_type = 'view' GROUP BY 1, 2),
         newv AS (
           SELECT user_id, date_trunc('day', ts) AS ts, round(avg(value) * 2, 6) AS value
           FROM events WHERE user_id = 1 AND event_type = 'purchase' GROUP BY 1, 2)
         SELECT user_id, ts, value FROM oldv
         UNION ALL SELECT user_id, ts, value FROM newv
         ORDER BY user_id, ts""",

    "q_store_update" ->
      """WITH oldv AS (
           SELECT user_id, date_trunc('day', ts) AS ts, round(avg(value), 6) AS value
           FROM events WHERE user_id IN (0, 1, 2) AND event_type = 'view' GROUP BY 1, 2),
         newv AS (
           SELECT date_trunc('day', ts) AS ts, round(avg(value) * 3, 6) AS value
           FROM events WHERE user_id = 1 AND event_type = 'purchase' GROUP BY 1),
         -- update = new.combine_first(existing) on user 1: new wins on
         -- overlapping days, old fills elsewhere, new-only days append
         u1 AS (
           SELECT 1 AS user_id, COALESCE(n.ts, o.ts) AS ts,
                  COALESCE(n.value, o.value) AS value
           FROM (SELECT ts, value FROM oldv WHERE user_id = 1) o
           FULL JOIN newv n ON n.ts = o.ts)
         SELECT user_id, ts, value FROM oldv WHERE user_id <> 1
         UNION ALL SELECT CAST(user_id AS BIGINT) AS user_id, ts, value FROM u1
         ORDER BY user_id, ts""",

    // wire-parity round-trips are lossless, so the oracle is the identity
    "q_feather_roundtrip" ->
      """SELECT user_id, 'prm_' || user_id AS name, ts, round(value, 4) AS value
         FROM events WHERE user_id < 8
         ORDER BY user_id, ts""",

    "q_blob_roundtrip" ->
      """SELECT user_id, ts, round(value, 4) AS value
         FROM events WHERE user_id < 8
         ORDER BY user_id, ts""",

  )
}
