package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Downstream analytical operators (SURVEY §2 C10–C14, reference Cosmos
  * SQL queries at `README.md:227-245`) plus the general relational
  * breadth a complete engine owes its users (window ranking, multi-way
  * star join, semi/anti join, set ops, pricing-summary aggregate).
  *
  * All declarative DataFrame ops: Catalyst pushes the filters into the
  * parquet scan, prunes columns, and plans partial+final hash
  * aggregation (map-side combine) automatically — at 100 TB the only
  * shuffle any aggregate here does is one exchange on its group keys,
  * with partial aggregation already applied upstream of it.
  *
  * Float determinism convention for the DuckDB oracle: any column
  * *produced* by arithmetic/aggregation is `round(_, 4|6)` on both
  * sides (sum order across partitions is engine-dependent); columns
  * passed through from parquet are left untouched.
  */
object Analytics {

  /** Average of ≤4-decimal data with a cross-engine-exact formulation:
    * `round(sum, 4)` recovers the exact decimal sum on any engine
    * (sums of 2-decimal data are 2-decimal rationals, so the rounding
    * is lossless and boundary-free), and dividing identical doubles by
    * identical counts yields bit-identical averages. No outer rounding:
    * once the quotients are bit-identical, rounding only INTRODUCES
    * divergence — Spark's round works on the double's shortest decimal
    * representation while DuckDB rounds the exact binary value, and the
    * two disagree exactly when a terminating average sits on the
    * half-boundary (observed: 2089.93/32, whose shortest form is
    * 65.3103125). */
  private[operators] def exactAvg(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round(sum(c), 4) / count(lit(1))

  /** C10 — equality filter (reference `README.md:231`). Pushed to scan. */
  def filterCity(enriched: DataFrame, city: String): DataFrame =
    enriched.filter(col("city") === city)

  /** C11 — scalar (ungrouped) AVG with filter, `SELECT VALUE AVG(...)`
    * (reference `README.md:234`). */
  def scalarAvg(enriched: DataFrame, city: String): DataFrame =
    filterCity(enriched, city)
      .agg(exactAvg(col("purchase_amount")).as("avg_purchase"))

  /** C12 — grouped AVG (reference `README.md:237-239`). */
  def avgByCity(enriched: DataFrame): DataFrame =
    enriched.groupBy(col("city"))
      .agg(exactAvg(col("purchase_amount")).as("avg_purchase"))

  /** C13 — grouped SUM (reference `README.md:242-244`). */
  def sumByCity(enriched: DataFrame): DataFrame =
    enriched.groupBy(col("city"))
      .agg(round(sum(col("purchase_amount")), 4).as("total_purchase"))

  /** C14 — `SELECT TOP 10 *` smoke scan (reference `README.md:100`);
    * made deterministic with an explicit sort key. */
  def topN(df: DataFrame, sortCol: String, n: Int): DataFrame =
    df.orderBy(col(sortCol)).limit(n)

  /** TPC-H-Q1-style pricing summary over lineitem: the canonical
    * multi-aggregate hash aggregation (partial+final, whole-stage
    * codegen). */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        round(sum(col("l_extendedprice")), 4).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
          .as("sum_disc_price"),
        exactAvg(col("l_quantity")).as("avg_qty"),
        exactAvg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** Window ranking: top-k orders per customer by totalprice.
    * Deterministic tie-break on o_orderkey. One shuffle on the
    * partition key; at scale this is the standard per-key top-k —
    * for extreme k-skew swap in an Aggregator-based top-k heap. */
  def topOrdersPerCustomer(orders: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
  }

  /** Multi-way star join: orders ⋈ customer ⋈ nation ⋈ region, revenue
    * rollup by region/nation. Dimensions are broadcast (they stay small
    * at any scale factor); the fact table never shuffles for the joins,
    * only once for the final group-by. */
  def revenueByNation(orders: DataFrame, customer: DataFrame,
                      nation: DataFrame, region: DataFrame): DataFrame =
    orders
      .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum(col("o_totalprice")), 4).as("revenue"),
        count(lit(1)).as("n_orders"))

  /** TPC-H Q5 shape — local supplier volume: revenue from lineitems
    * whose SUPPLIER sits in the ordering customer's own nation, per
    * nation of one region and one order-date year. The deepest
    * multi-join in the relational suite (6 tables, and the only
    * consumer of `supplier`); the fact table streams through broadcast
    * dimension joins, and the essential condition is the
    * c_nationkey = s_nationkey CO-LOCATION predicate that turns a
    * star join into nation-local volume. At 100 TB customer/supplier
    * outgrow broadcast — drop the hints and AQE picks shuffle sides;
    * the predicate structure (and Catalyst's join reorder over it)
    * is what this query pins. */
  def localSupplierVolume(lineitem: DataFrame, orders: DataFrame,
                          customer: DataFrame, supplier: DataFrame,
                          nation: DataFrame, region: DataFrame,
                          regionName: String = "ASIA"): DataFrame =
    lineitem
      .join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
      .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(supplier),
        lineitem("l_suppkey") === supplier("s_suppkey") &&
          customer("c_nationkey") === supplier("s_nationkey"))
      .join(broadcast(nation), supplier("s_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .filter(col("r_name") === regionName &&
        col("o_orderdate") >= lit("1995-01-01") &&
        col("o_orderdate") < lit("1996-01-01"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
        .as("revenue"))

  /** Anti join (NOT EXISTS): customers with no order above a price
    * threshold. The filter on the right side is pushed below the join;
    * at scale this is one shuffle on the join key (or a broadcast anti
    * when the filtered right side is small enough). */
  def customersWithoutBigOrders(customer: DataFrame, orders: DataFrame,
                                threshold: Double): DataFrame =
    customer.join(orders.filter(col("o_totalprice") > threshold),
        customer("c_custkey") === orders("o_custkey"), "left_anti")
      .select(col("c_custkey"))

  /** Semi join (EXISTS): customers having at least one urgent-priority
    * order. */
  def customersWithOrders(customer: DataFrame, orders: DataFrame,
                          priority: String): DataFrame =
    customer.join(orders.filter(col("o_orderpriority") === priority),
        customer("c_custkey") === orders("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))

  /** Set operation: UNION (distinct) of two key sets. */
  def unionKeys(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.filter(col("c_acctbal") < 0).select(col("c_custkey").as("key"))
      .union(orders.filter(col("o_totalprice") > 400000)
        .select(col("o_custkey").as("key")))
      .distinct()

  /** Set operations beyond UNION: customers ordering in BOTH priority
    * classes (INTERSECT) tagged apart from those ordering ONLY in the
    * first (EXCEPT). Both plan as distinct-aggregated joins — one
    * shuffle each on the key, the same shape at any scale. */
  def priorityOverlap(orders: DataFrame,
                      pa: String = "1-URGENT", pb: String = "2-HIGH"): DataFrame = {
    def keysOf(p: String) =
      orders.filter(col("o_orderpriority") === p).select(col("o_custkey"))
    keysOf(pa).intersect(keysOf(pb)).withColumn("set_op", lit("both"))
      .unionAll(keysOf(pa).except(keysOf(pb))
        .withColumn("set_op", lit("only_first")))
  }

  /** C2 analog on the driver corpus — JSON payload decode. On a real
    * stream this is `from_json` over the Kafka value; here the
    * single-field `props` JSON column of `events`. */
  def decodeProps(events: DataFrame): DataFrame =
    events.select(col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("k"))
}
