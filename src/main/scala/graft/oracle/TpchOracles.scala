package graft.oracle

import graft.pipeline.{Sampling, TextAnalysis}

/** DuckDB oracle twins for the Tpch query family — split out of
  * SparkEntry.oracleSql (r17, maintenance: the single file had reached
  * 4k lines). VERBATIM moves: every SQL string and helper is unchanged,
  * and the assembled map's key set is identical, so the Verify dump is
  * byte-identical. Portability rules are documented on SparkEntry.
  */
private[graft] object TpchOracles {

  def sql: Map[String, String] = Map(
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
                count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
         FROM lineitem
         GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",

    "q_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
                round(sum(l_quantity), 2) AS sum_qty,
                round(sum(l_extendedprice), 2) AS sum_base_price,
                round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                round(avg(l_quantity), 4) AS avg_qty,
                round(avg(l_extendedprice), 4) AS avg_price,
                round(avg(l_discount), 4) AS avg_disc,
                count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_revenue_join" ->
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
         GROUP BY 1 ORDER BY 1""",

    "q_top_customers" ->
      """SELECT o_custkey, round(rev_raw, 2) AS revenue
         FROM (SELECT o_custkey, sum(o_totalprice) AS rev_raw FROM orders GROUP BY 1)
         ORDER BY rev_raw DESC, o_custkey LIMIT 10""",

  )
}
