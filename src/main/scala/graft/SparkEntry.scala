package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` is one operator from SURVEY §2 run over the
  * driver parquet corpus at `sfDir`; `oracleSql` holds the equivalent
  * ANSI SQL the driver executes in DuckDB over the same parquet tables.
  * Column names and rounding are aligned pairwise (driver compare sorts
  * columns by name and hash-compares values).
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables(spark, dir, name)

  private def enriched(s: SparkSession, d: String): DataFrame =
    Enrich.enrich(t(s, d, "orders"), t(s, d, "customer"))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Enrich.enrich(
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet"),
      spark.read.parquet("/root/testdata/sf0.001/customer.parquet"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- Core reference surface (SURVEY §2.2/§2.3) ---
    "c08_c09_enrich" -> ((s, d) => enriched(s, d)),
    "c10_filter_city" -> ((s, d) => Analytics.filterCity(enriched(s, d), "BUILDING")),
    "c11_scalar_avg" -> ((s, d) => Analytics.scalarAvg(enriched(s, d), "BUILDING")),
    "c12_avg_by_city" -> ((s, d) => Analytics.avgByCity(enriched(s, d))),
    "c13_sum_by_city" -> ((s, d) => Analytics.sumByCity(enriched(s, d))),
    "c14_top10" -> ((s, d) => Analytics.topN(t(s, d, "customer"), "c_custkey", 10)),
    "c02_json_decode" -> ((s, d) => Analytics.decodeProps(t(s, d, "events"))),
    // --- Relational breadth ---
    "q_pricing_summary" -> ((s, d) => Analytics.pricingSummary(t(s, d, "lineitem"))),
    "q_window_topn" -> ((s, d) => Analytics.topOrdersPerCustomer(t(s, d, "orders"), 3)),
    "q_star_join" -> ((s, d) => Analytics.revenueByNation(
      t(s, d, "orders"), t(s, d, "customer"), t(s, d, "nation"), t(s, d, "region"))),
    "q_anti_join" -> ((s, d) => Analytics.customersWithoutBigOrders(
      t(s, d, "customer"), t(s, d, "orders"), 400000.0)),
    "q_semi_join" -> ((s, d) => Analytics.customersWithOrders(
      t(s, d, "customer"), t(s, d, "orders"), "1-URGENT")),
    "q_union" -> ((s, d) => Analytics.unionKeys(t(s, d, "customer"), t(s, d, "orders"))),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "c08_c09_enrich" ->
      """SELECT o.o_orderkey AS order_id, o.o_custkey AS customer_id,
         c.c_name AS customer_name, c.c_mktsegment AS city,
         o.o_totalprice AS purchase_amount
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey""",
    "c10_filter_city" ->
      """SELECT o.o_orderkey AS order_id, o.o_custkey AS customer_id,
         c.c_name AS customer_name, c.c_mktsegment AS city,
         o.o_totalprice AS purchase_amount
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         WHERE c.c_mktsegment = 'BUILDING'""",
    "c11_scalar_avg" ->
      """SELECT round(avg(o.o_totalprice), 4) AS avg_purchase
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         WHERE c.c_mktsegment = 'BUILDING'""",
    "c12_avg_by_city" ->
      """SELECT c.c_mktsegment AS city, round(avg(o.o_totalprice), 4) AS avg_purchase
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         GROUP BY c.c_mktsegment""",
    "c13_sum_by_city" ->
      """SELECT c.c_mktsegment AS city, round(sum(o.o_totalprice), 4) AS total_purchase
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         GROUP BY c.c_mktsegment""",
    "c14_top10" ->
      "SELECT * FROM customer ORDER BY c_custkey LIMIT 10",
    "c02_json_decode" ->
      "SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k FROM events",
    "q_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 4) AS sum_qty,
         round(sum(l_extendedprice), 4) AS sum_base_price,
         round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
         round(avg(l_quantity), 4) AS avg_qty,
         round(avg(l_discount), 6) AS avg_disc,
         count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "q_window_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) WHERE rn <= 3""",
    "q_star_join" ->
      """SELECT r.r_name, n.n_name, round(sum(o.o_totalprice), 4) AS revenue,
         count(*) AS n_orders
         FROM orders o
         JOIN customer c ON o.o_custkey = c.c_custkey
         JOIN nation n ON c.c_nationkey = n.n_nationkey
         JOIN region r ON n.n_regionkey = r.r_regionkey
         GROUP BY r.r_name, n.n_name""",
    "q_anti_join" ->
      """SELECT c_custkey FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o
           WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)""",
    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
           WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')""",
    "q_union" ->
      """SELECT c_custkey AS key FROM customer WHERE c_acctbal < 0
         UNION
         SELECT o_custkey AS key FROM orders WHERE o_totalprice > 400000""",
  )
}
