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

  /** TPC-H Q14 shape — promoted-class revenue share per ship month:
    * what fraction of each month's discounted revenue came from parts
    * of one type. CONDITIONAL aggregation (sum-if inside one pass),
    * never two scans + a join of the promo and total branches. Per-row
    * discounted price is quantized to integer cents BEFORE summation
    * (`floor(x·100 + 0.5)`, the house half-up rule), so both the month
    * totals and the share's operands are exact int64 — float sums fold
    * in engine-dependent order; the share is one IEEE division of
    * exact integers, rounded for display. The part side carries only
    * (partkey, is-promo) through the broadcast join — one boolean per
    * row, not the type string. */
  def promoShareByMonth(lineitem: DataFrame, part: DataFrame,
                        promoType: String = "ECONOMY"): DataFrame = {
    val flags = part.select(col("p_partkey"),
      (col("p_type") === promoType).as("is_promo"))
    lineitem
      .select(col("l_partkey"),
        (year(col("l_shipdate")) * 100 + month(col("l_shipdate"))).as("ym"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100 + 0.5)
          .cast("long").as("cents"))
      .join(broadcast(flags), col("l_partkey") === col("p_partkey"))
      .groupBy(col("ym"))
      .agg(count(lit(1)).as("n_items"),
        sum(when(col("is_promo"), col("cents")).otherwise(0L)).as("promo_cents"),
        sum(col("cents")).as("total_cents"))
      .select(col("ym").cast("int").as("ym"), col("n_items"),
        col("promo_cents"), col("total_cents"),
        round(col("promo_cents").cast("double") * 100.0 /
          col("total_cents").cast("double"), 6).as("promo_share"))
  }

  /** TPC-H Q15 shape — top supplier(s) by total discounted revenue:
    * the per-supplier aggregate, then the suppliers whose revenue
    * EQUALS the maximum (ties all surface, the Q15 semantics). Revenue
    * is exact integer cents (quantize-before-sum), so "equals max" is
    * an integer comparison — the float formulation makes the equality
    * predicate flaky on any engine pair. The 1-row max is broadcast
    * back (cross join of a scalar aggregate, the [[bigSpenders]]
    * shape); supplier names come from a broadcast dimension join
    * AFTER the filter, so only winners touch the dimension. */
  def topSupplier(lineitem: DataFrame, supplier: DataFrame): DataFrame = {
    val rev = lineitem
      .select(col("l_suppkey"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100 + 0.5)
          .cast("long").as("cents"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("cents")).as("rev_cents"), count(lit(1)).as("n_items"))
    val mx = rev.agg(max(col("rev_cents")).as("max_cents"))
    rev.crossJoin(broadcast(mx))
      .filter(col("rev_cents") === col("max_cents"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_items"),
        (col("rev_cents").cast("double") / 100.0).as("total_revenue"))
  }

  /** TPC-H Q10 shape — returned-item revenue report: the top-k
    * customers by revenue lost to returns (returnflag R) in one
    * order-date year, with nation names. The classic "who should the
    * sales team call" 4-table join; ranking is on exact integer cents
    * with the full customer-key tie-break (the house top-k rule).
    * The fact table is filtered on returnflag AND the order-date
    * window BEFORE any wide join; customer and nation broadcast. */
  def returnedItems(lineitem: DataFrame, orders: DataFrame,
                    customer: DataFrame, nation: DataFrame,
                    year0: String = "1996-01-01", year1: String = "1997-01-01",
                    k: Int = 20): DataFrame = {
    val returns = lineitem.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100 + 0.5)
          .cast("long").as("cents"))
    val window = orders
      .filter(col("o_orderdate") >= lit(year0) && col("o_orderdate") < lit(year1))
      .select(col("o_orderkey"), col("o_custkey"))
    returns.join(window, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("cents")).as("rev_cents"), count(lit(1)).as("n_items"))
      .orderBy(col("rev_cents").desc, col("o_custkey"))
      .limit(k)
      .join(broadcast(customer.select(col("c_custkey"), col("c_name"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"), col("n_items"),
        (col("rev_cents").cast("double") / 100.0).as("revenue"))
  }

  /** TPC-H Q13 shape — customer order-count distribution: how many
    * customers placed exactly N orders, INCLUDING the zero-order
    * customers only a LEFT join surfaces (the inner-join formulation
    * silently drops the most interesting bucket). Two-level
    * aggregation: per-customer `count(o_orderkey)` (counts non-null —
    * the unmatched left rows score 0 for free), then the O(distinct
    * counts) histogram. Both aggregations are partial+final; the
    * second one's key space is tiny by construction. */
  def customerDistribution(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.select(col("c_custkey"))
      .join(orders.select(col("o_custkey"), col("o_orderkey")),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .groupBy(col("n_orders"))
      .agg(count(lit(1)).as("n_custs"))

  /** TPC-H Q21 shape — suppliers who kept an order waiting: for
    * FINISHED orders sourced from MORE THAN ONE supplier where EXACTLY
    * ONE supplier shipped late (past `graceDays` after the order
    * date), charge that sole offender; report the top-k suppliers by
    * such orders. Q21's textbook form is an EXISTS plus a NOT EXISTS
    * against the same fact table — three correlated scans. Here both
    * collapse into ONE per-(order, supplier) aggregate followed by a
    * per-order aggregate: "another supplier exists" is `n_supps > 1`,
    * "no other supplier was late" is `n_late = 1`, and the offender's
    * identity rides in the SAME aggregate as `max(case when late then
    * suppkey end)` — exact because the filter keeps only the
    * one-late-supplier orders. The fact table is scanned ONCE and
    * never joined back to itself (the join-back form evaluates the
    * per-(order, supplier) subtree twice). Lateness is exact integer
    * microseconds (never a date-type coercion, identical on every
    * engine). Supplier names broadcast onto the k winners only.
    *
    * 100 TB: both aggregations are partial+final on (orderkey[,
    * suppkey]) — the same key the fact would be bucketed by; the
    * top-k is TakeOrderedAndProject on integer (count, key). */
  def soleDelayedSupplier(lineitem: DataFrame, orders: DataFrame,
                          supplier: DataFrame, graceDays: Int = 60,
                          k: Int = 10): DataFrame = {
    val graceUs = graceDays * 86400000000L
    val fin = orders.filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val perSupp = lineitem
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(fin, col("l_orderkey") === col("o_orderkey"))
      .withColumn("late",
        (unix_micros(col("l_shipdate").cast("timestamp")) >
          unix_micros(col("o_orderdate").cast("timestamp")) + graceUs).cast("int"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("late")).as("supp_late"))
    perSupp.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_supps"), sum(col("supp_late")).as("n_late"),
        max(when(col("supp_late") === 1, col("l_suppkey"))).as("l_suppkey"))
      .filter(col("n_supps") > 1 && col("n_late") === 1)
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("l_suppkey"))
      .limit(k)
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
  }

  /** TPC-H Q22 shape — lapsed big accounts: customers with an
    * ABOVE-AVERAGE positive balance and no order since `cutoff`,
    * grouped by nation (who has money parked here but stopped
    * buying). The threshold is a scalar aggregate of the customer
    * table itself; "above average" is evaluated as the integer
    * cross-multiplication `cents · n > sum_cents` — no float average
    * ever materializes, so the boundary customer lands identically on
    * every engine (the float form puts avg-adjacent balances at the
    * mercy of one ulp). Recency is a LEFT ANTI join against the
    * date-filtered orders projection; balances are exact cents with
    * one display division at the end.
    *
    * 100 TB: the 1-row threshold broadcasts; the anti join is a hash
    * join on custkey against an already date-pruned fact (the filter
    * reaches the scan); nation broadcasts; final agg is O(nations). */
  def lapsedBigAccounts(customer: DataFrame, orders: DataFrame,
                        nation: DataFrame,
                        cutoff: String = "2000-01-01"): DataFrame = {
    val cents = customer.select(col("c_custkey"), col("c_nationkey"),
      floor(col("c_acctbal") * 100 + 0.5).cast("long").as("bal_cents"))
    val thr = cents.filter(col("bal_cents") > 0)
      .agg(sum(col("bal_cents")).as("s"), count(lit(1)).as("n"))
    cents.crossJoin(broadcast(thr))
      .filter(col("bal_cents") * col("n") > col("s"))
      .join(orders.filter(col("o_orderdate") >= lit(cutoff))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_custs"),
        round(sum(col("bal_cents")).cast("double") / 100.0, 2).as("total_bal"))
  }

  /** TPC-H Q11 shape — revenue-concentrated parts: parts whose total
    * revenue exceeds `timesAvg10`/10 × the per-part average (Q11's
    * HAVING-against-a-scalar-subquery form, with a SCALE-FREE
    * threshold — Q11's literal fraction must shrink with corpus size,
    * an average-relative bar does not). As in [[lapsedBigAccounts]],
    * the comparison is the integer cross-multiplication
    * `c·n·10 > timesAvg10·total` — no float threshold, no boundary
    * ulp (documented bound: cents ≈ 9·10¹⁵ at 100 TB × 10 stays
    * under int64). The 1-row total broadcasts; the part dimension is
    * joined AFTER the filter, probing with the (small) winner set. */
  def importantParts(lineitem: DataFrame, part: DataFrame,
                     timesAvg10: Int = 15): DataFrame = {
    val pc = lineitem.select(col("l_partkey"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100 + 0.5)
          .cast("long").as("cents"))
      .groupBy(col("l_partkey")).agg(sum(col("cents")).as("c"))
    val tot = pc.agg(sum(col("c")).as("tot"), count(lit(1)).as("n"))
    val hot = pc.crossJoin(broadcast(tot))
      .filter(col("c") * col("n") * 10 > lit(timesAvg10.toLong) * col("tot"))
    part.select(col("p_partkey"), col("p_name"))
      .join(broadcast(hot), col("p_partkey") === col("l_partkey"))
      .select(col("p_partkey"), col("p_name"),
        (col("c").cast("double") / 100.0).as("revenue"),
        round((col("c") * col("n")).cast("double") / col("tot").cast("double"), 4)
          .as("x_avg"))
  }

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

  /** Per-row discounted price quantized to integer cents (half-up) —
    * the house exact-revenue idiom: both engines compute the identical
    * double `extendedprice·(1−discount)` and the identical floor, so
    * group sums are exact int64 regardless of fold order. */
  private def revCents =
    floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100 + 0.5)
      .cast("long")

  /** Year-over-year revenue growth per customer nation — the star
    * schema's trend report: per (nation, year) exact-cent revenue plus
    * growth vs the nation's previous year ON RECORD (`lag` over the
    * aggregated frame — O(nations·years) rows, never raw volume; a
    * nation's first year has no prior and reports null growth on both
    * engines). Dimension broadcasts into the fact, one grouped cent
    * sum, then the lag window partitioned by nation. Growth is a ratio
    * of exact int64 cents rounded once — no float enters before the
    * final division. */
  def yearlyGrowth(lineitem: DataFrame, orders: DataFrame,
                   customer: DataFrame, nation: DataFrame): DataFrame = {
    val cust = broadcast(
      customer.join(nation.select(col("n_nationkey"), col("n_name")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name")))
    val rev = lineitem
      .join(orders.select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(revCents).as("rev_c"))
    val w = Window.partitionBy(col("n_name")).orderBy(col("o_year"))
    rev.withColumn("prev_c", lag(col("rev_c"), 1).over(w))
      .select(col("n_name"), col("o_year"),
        round(col("rev_c").cast("double") / 100.0, 2).as("revenue"),
        round((col("rev_c") - col("prev_c")).cast("double") /
          col("prev_c").cast("double"), 6).as("yoy_growth"))
  }

  /** TPC-H Q3 shape — top unshipped orders by revenue: orders placed
    * before the cutoff in one market segment whose lineitems ship
    * after it. The orders side is filtered+broadcast BEFORE the fact
    * join (the fact table never carries c_mktsegment through the
    * shuffle); revenue sums exact cents; top-10 ranks on the integer
    * with the orderkey tie-break. */
  def shippingPriority(lineitem: DataFrame, orders: DataFrame,
                       customer: DataFrame, segment: String = "BUILDING",
                       cutoff: String = "1996-07-01", k: Int = 10): DataFrame =
    lineitem.filter(col("l_shipdate") > lit(cutoff))
      .join(broadcast(
        orders.filter(col("o_orderdate") < lit(cutoff))
          .join(broadcast(customer.filter(col("c_mktsegment") === segment)
            .select(col("c_custkey"))),
            col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("o_orderdate"))),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(revCents).as("rev_c"))
      .orderBy(col("rev_c").desc, col("l_orderkey"))
      .limit(k)
      .select(col("l_orderkey"), col("o_orderdate"),
        (col("rev_c").cast("double") / 100.0).as("revenue"))

  /** TPC-H Q6 shape — the forecast-revenue-change scan: ONE filtered
    * pass over the fact table, zero joins, map-side partial agg into a
    * single row. The predicate (date range + discount band + quantity
    * cap) pushes into the parquet scan; revenue here is
    * `extendedprice·discount` (the amount the discounts cost), exact
    * cents. */
  def forecastRevenue(lineitem: DataFrame, year: String = "1996",
                      dLo: Double = 0.05, dHi: Double = 0.07,
                      qtyCap: Double = 24): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= lit(s"$year-01-01") &&
        col("l_shipdate") < lit(s"${year.toInt + 1}-01-01") &&
        col("l_discount") >= dLo && col("l_discount") <= dHi &&
        col("l_quantity") < qtyCap)
      .agg(count(lit(1)).as("n_items"),
        sum(floor(col("l_extendedprice") * col("l_discount") * 100 + 0.5)
          .cast("long")).as("rev_c"))
      .select(col("n_items"),
        (col("rev_c").cast("double") / 100.0).as("revenue"))

  /** TPC-H Q7 shape — bilateral volume shipping: revenue between two
    * nations in both directions, per ship year. The supplier→nation
    * and customer→nation sides reduce to (suppkey, nation) /
    * (custkey, nation) maps restricted to the two nations BEFORE
    * joining (so the pair filter prunes candidates at the broadcast
    * probe, not after a full enrich). */
  def volumeShipping(lineitem: DataFrame, orders: DataFrame,
                     customer: DataFrame, supplier: DataFrame,
                     nation: DataFrame, nationA: String = "NATION_1",
                     nationB: String = "NATION_2"): DataFrame = {
    val ns = nation.filter(col("n_name").isin(nationA, nationB))
    val supp = supplier.join(ns, col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = customer.join(ns, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(revCents).as("rev_c"))
      .select(col("supp_nation"), col("cust_nation"), col("l_year"),
        (col("rev_c").cast("double") / 100.0).as("revenue"))
  }

  /** TPC-H Q9 shape (no partsupp table in the corpus, so profit =
    * discounted revenue) — product-line profit by supplier nation and
    * order year for parts matching a name token. Part filter reduces
    * to a key set before broadcast; the fact row carries only keys +
    * cents through the orders join. */
  def productProfit(lineitem: DataFrame, orders: DataFrame,
                    supplier: DataFrame, nation: DataFrame, part: DataFrame,
                    nameToken: String = "red"): DataFrame =
    lineitem
      .join(broadcast(part.filter(col("p_name").contains(nameToken))
        .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"), col("l_orderkey"), revCents.as("cents"))
      .join(orders.select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("nation"), col("o_year"))
      .agg(sum(col("cents")).as("rev_c"))
      .select(col("nation"), col("o_year"),
        (col("rev_c").cast("double") / 100.0).as("profit"))

  /** TPC-H Q17 shape — small-quantity-order revenue for one brand:
    * lineitems of the brand's parts whose quantity is below 20% of
    * that part's average quantity; reported as avg yearly revenue
    * (sum/7). The threshold compare is EXACT integer arithmetic
    * (5·q·n_i < Σq, quantities are integral), never a float
    * `q < 0.2·avg` whose boundary an engine-dependent float sum could
    * flip. The per-part aggregate joins back to the same filtered fact
    * slice — both sides are brand-pruned before any shuffle. */
  def smallQtyRevenue(lineitem: DataFrame, part: DataFrame,
                      brand: String = "Brand#23"): DataFrame = {
    val branded = lineitem.join(
      broadcast(part.filter(col("p_brand") === brand).select(col("p_partkey"))),
      col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_quantity").cast("long").as("q"),
        col("l_extendedprice"))
    val perPart = branded.groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("q")).as("sum_q"), count(lit(1)).as("n_i"))
    branded.join(broadcast(perPart), col("l_partkey") === col("pk"))
      .filter(col("q") * 5 * col("n_i") < col("sum_q"))
      .agg(count(lit(1)).as("n_items"),
        sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long")).as("rev_c"))
      .select(col("n_items"),
        (col("rev_c").cast("double") / 700.0).as("avg_yearly"))
  }

  /** TPC-H Q18 shape — large-volume orders: orders whose total
    * quantity exceeds the threshold, with their customer. The HAVING
    * runs on the fact aggregate FIRST (one groupBy on orderkey,
    * partial agg upstream), and only the surviving handful of keys
    * join back to orders/customer — never enrich-then-aggregate.
    * Quantities are integral, so the sum is exact; ordering uses the
    * ROUNDED price (the house top-k rule) with the orderkey
    * tie-break. */
  def largeOrders(lineitem: DataFrame, orders: DataFrame,
                  customer: DataFrame, qtyThreshold: Long = 300L,
                  k: Int = 20): DataFrame =
    lineitem.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
      .filter(col("total_qty") > qtyThreshold)
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.select(col("c_custkey"), col("c_name"))),
        col("o_custkey") === col("c_custkey"))
      .orderBy(round(col("o_totalprice"), 4).desc, col("o_orderkey"))
      .limit(k)
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), round(col("o_totalprice"), 4).as("o_totalprice"),
        col("total_qty"))

  /** TPC-H Q19 shape — three-arm disjunctive pricing: revenue from
    * (brand, size-range, quantity-range) triples OR-ed together. The
    * disjunction lives in ONE join predicate over the broadcast part
    * side, so each fact row probes the hash table once and evaluates
    * the three arms inline — not three scans unioned. */
  def disjunctPricing(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val p = broadcast(part.select(col("p_partkey"), col("p_brand"), col("p_size")))
    lineitem
      .join(p, col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30)))
      .agg(count(lit(1)).as("n_items"), sum(revCents).as("rev_c"))
      .select(col("n_items"),
        (col("rev_c").cast("double") / 100.0).as("revenue"))
  }

  /** Per-part revenue percentile WITHIN its part type — percent_rank
    * and cume_dist over the aggregated part frame (the window
    * functions the breadth suite didn't yet exercise). Ties rank on
    * the exact integer cents (equal revenues share a percentile — the
    * statistic's meaning), so both engines agree without a tie-break
    * column. The window partitions by p_type over an ALREADY
    * AGGREGATED frame (one row per part) — the house
    * no-window-over-raw rule; a 100 TB run with an unbounded part
    * dimension would range-bucket the revenue axis first (the
    * [[Profiling.groupedQuantiles]] counting shape) rather than sort
    * a giant partition. */
  def revenuePercentiles(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val pc = lineitem.select(col("l_partkey"), revCents.as("cents"))
      .groupBy(col("l_partkey")).agg(sum(col("cents")).as("c"))
      .join(broadcast(part.select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
    val w = Window.partitionBy(col("p_type")).orderBy(col("c"))
    pc.select(col("p_type"), col("l_partkey"),
      (col("c").cast("double") / 100.0).as("revenue"),
      round(percent_rank().over(w), 6).as("pct_rank"),
      round(cume_dist().over(w), 6).as("cume"))
  }

  /** TPC-H Q2 shape — minimum-cost supplier (no partsupp table in the
    * corpus, so an offer = the minimum observed unit price a supplier
    * ever charged for a part): for parts of one size/type, the
    * supplier(s) in one region matching the per-part MINIMUM unit
    * price, ranked by account balance. The correlated-min is the
    * per-part `min` joined back on equality — both sides integer
    * cents (`floor(ep·100/qty + 0.5)`: identical IEEE division on
    * both engines, then a boundary-free half-up), so the "achieves
    * the minimum" equality is exact, never a float compare.
    *
    * 100 TB: part and supplier×nation×region dims broadcast; the fact
    * scans once; offers/min/min-join all group on p_partkey (one
    * shuffle, reused); top-k is integer-ranked with full tie-breaks. */
  def minCostSupplier(lineitem: DataFrame, part: DataFrame,
                      supplier: DataFrame, nation: DataFrame,
                      region: DataFrame, sizeCap: Int = 15,
                      ptype: String = "LARGE",
                      regionName: String = "ASIA", k: Int = 20): DataFrame = {
    val parts = broadcast(
      part.filter(col("p_size") <= sizeCap && col("p_type") === ptype)
        .select(col("p_partkey"), col("p_name")))
    val supp = broadcast(
      supplier.join(nation.join(region.filter(col("r_name") === regionName),
          col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name")),
        col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"),
          floor(col("s_acctbal") * 100 + 0.5).cast("long").as("bal_c")))
    val offers = lineitem
      .join(parts, col("l_partkey") === col("p_partkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("p_partkey"), col("p_name"), col("s_suppkey"),
        col("s_name"), col("n_name"), col("bal_c"))
      .agg(min(floor(col("l_extendedprice") * 100 / col("l_quantity") + 0.5)
        .cast("long")).as("unit_c"))
    val best = offers.groupBy(col("p_partkey").as("mk"))
      .agg(min(col("unit_c")).as("min_c"))
    offers.join(broadcast(best),
        col("p_partkey") === col("mk") && col("unit_c") === col("min_c"))
      .orderBy(col("bal_c").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(k)
      .select((col("bal_c").cast("double") / 100.0).as("s_acctbal"),
        col("s_name"), col("n_name"), col("p_partkey"), col("p_name"),
        (col("unit_c").cast("double") / 100.0).as("unit_price"))
  }

  /** TPC-H Q4 shape — order-priority checking (no commit/receipt dates
    * in the corpus, so "late" = a lineitem shipped more than `lateDays`
    * after the order date): orders placed in one quarter with at least
    * one late line, counted per priority. The EXISTS is a LEFT SEMI
    * join whose extra inequality rides in the join condition — the
    * probe row carries o_orderdate, so no second pass and no distinct.
    *
    * 100 TB: both sides prune at the scan (quarter on orders, the
    * matching ship window on lineitem); one hash semi-join on
    * orderkey; final agg is O(priorities). */
  def orderPriorityCheck(lineitem: DataFrame, orders: DataFrame,
                         quarterStart: String = "1997-01-01",
                         quarterEnd: String = "1997-04-01",
                         lateDays: Int = 60): DataFrame =
    orders
      .filter(col("o_orderdate") >= lit(quarterStart) &&
        col("o_orderdate") < lit(quarterEnd))
      .join(lineitem.select(col("l_orderkey"), col("l_shipdate")),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))

  /** TPC-H Q8 shape — national market share: of the revenue in one
    * part-type market sold to customers of one region, the fraction
    * supplied by one nation, per order year. Numerator and denominator
    * are exact cent sums of the SAME quantized per-row value (one
    * conditional, one unconditional), so the share is one double
    * division of exact integers, rounded once.
    *
    * 100 TB: part/supplier/customer dims all reduce to key(+flag)
    * sets and broadcast; the fact joins orders on orderkey (the one
    * unavoidable shuffle); agg is O(years). */
  def nationMarketShare(lineitem: DataFrame, orders: DataFrame,
                        customer: DataFrame, supplier: DataFrame,
                        nation: DataFrame, region: DataFrame,
                        part: DataFrame,
                        ptype: String = "PROMO",
                        suppNation: String = "NATION_3",
                        custRegion: String = "ASIA"): DataFrame = {
    val parts = broadcast(part.filter(col("p_type") === ptype)
      .select(col("p_partkey")))
    val supp = broadcast(
      supplier.join(nation.select(col("n_nationkey"), col("n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"),
          (col("n_name") === suppNation).cast("long").as("is_target")))
    val cust = broadcast(
      customer.join(
          nation.join(region.filter(col("r_name") === custRegion),
            col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey")))
    lineitem
      .join(parts, col("l_partkey") === col("p_partkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(orders.select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(revCents * col("is_target")).as("target_c"),
        sum(revCents).as("total_c"))
      .select(col("o_year"),
        round(col("target_c").cast("double") / col("total_c").cast("double"), 6)
          .as("mkt_share"))
  }

  /** TPC-H Q12 shape — shipping-delay priority split (no l_shipmode in
    * the corpus, so the category is the delay bucket FAST ≤30d /
    * NORMAL ≤90d / SLOW): per bucket, how many high-priority
    * (1-URGENT, 2-HIGH) vs other orders shipped lines there. The
    * two-way split is the Q12 CASE-sum pair over one joined pass;
    * day arithmetic is integer datediff on midnight timestamps.
    *
    * 100 TB: fact⋈fact hash join on orderkey (orders is NOT
    * broadcast-able at scale and isn't here); counts are exact int64;
    * output is O(3). */
  def shipDelaySplit(lineitem: DataFrame, orders: DataFrame,
                     year: String = "1997"): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= lit(s"$year-01-01") &&
        col("l_shipdate") < lit(s"${year.toInt + 1}-01-01"))
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .select(
        when(datediff(col("l_shipdate"), col("o_orderdate")) <= 30, "FAST")
          .when(datediff(col("l_shipdate"), col("o_orderdate")) <= 90, "NORMAL")
          .otherwise("SLOW").as("delay_bucket"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH")
          .cast("long").as("hi"))
      .groupBy(col("delay_bucket"))
      .agg(sum(col("hi")).as("high_line_count"),
        sum(lit(1L) - col("hi")).as("low_line_count"))

  /** TPC-H Q16 shape — supplier breadth per part descriptor (lineitem
    * is the part↔supplier relation; no partsupp table): distinct
    * suppliers per (brand, type, size), excluding one brand, one
    * type, and "complaint" suppliers (negative balance — Q16's NOT IN
    * subquery as a LEFT ANTI join).
    *
    * 100 TB: the (partkey, suppkey) projection deduplicates in the
    * same shuffle that feeds the count-distinct; part dim and the
    * complaint set broadcast; the anti join prunes before the agg. */
  def partSupplierBreadth(lineitem: DataFrame, part: DataFrame,
                          supplier: DataFrame,
                          notBrand: String = "Brand#1",
                          notType: String = "PROMO"): DataFrame =
    lineitem.select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(part
          .filter(col("p_brand") =!= notBrand && col("p_type") =!= notType)
          .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier.filter(col("s_acctbal") < 0)
          .select(col("s_suppkey"))),
        col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))

  /** TPC-H Q20 shape — major part suppliers (no partsupp availqty, so
    * "has excess stock" becomes "supplies a major share"): suppliers
    * of one nation who shipped more than `pct`% of some filtered
    * part's total shipped quantity in a year. The nested aggregate
    * (per-(part,supp) qty vs per-part total) compares by integer
    * cross-multiplication — quantities are integral doubles, quantized
    * half-up once per row, so the share threshold is exact.
    *
    * 100 TB: one filtered fact pass feeds both aggregation levels
    * (the per-part total reuses the (part,supp) partial); the nation
    * supplier set broadcasts; DISTINCT is over an already-small
    * winner set. */
  def majorPartSuppliers(lineitem: DataFrame, part: DataFrame,
                         supplier: DataFrame, nation: DataFrame,
                         suppNation: String = "NATION_2",
                         ptype: String = "SMALL",
                         year: String = "1997", pct: Int = 2): DataFrame = {
    val bySupp = lineitem
      .filter(col("l_shipdate") >= lit(s"$year-01-01") &&
        col("l_shipdate") < lit(s"${year.toInt + 1}-01-01"))
      .join(broadcast(part.filter(col("p_type") === ptype)
          .select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(floor(col("l_quantity") + 0.5).cast("long")).as("qty"))
    val byPart = bySupp.groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("qty")).as("tot"))
    bySupp.join(broadcast(byPart), col("l_partkey") === col("pk"))
      .filter(col("qty") * 100 > col("tot") * pct)
      .select(col("l_suppkey")).distinct()
      .join(broadcast(supplier
          .join(nation.filter(col("n_name") === suppNation),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"))
  }

  /** Source-vs-aggregate RECONCILIATION — the audit every ETL runs
    * before a fact table feeds anything downstream: does each order
    * header's total agree with the sum of its line items? Per-order
    * status (match / mismatch / header with no items) rolled up with
    * exact integer-cent deltas (quantize-per-row-then-sum, the house
    * rule — a float sum's order dependence would make the "mismatch"
    * verdict itself nondeterministic).
    *
    * 100 TB: the one genuine fact⋈fact shuffle (neither side
    * broadcastable) — but lineitem pre-aggregates to order
    * cardinality map-side BEFORE the join, so the exchange carries
    * one row per order, not one per item; output is O(statuses). */
  def reconcileOrders(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val l = lineitem.groupBy(col("l_orderkey"))
      .agg(sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long")).as("lsum"))
    orders
      .select(col("o_orderkey"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("ocents"))
      .join(l, col("o_orderkey") === col("l_orderkey"), "left")
      .select(
        when(col("lsum").isNull, "no_items")
          .when(col("lsum") === col("ocents"), "match")
          .otherwise("mismatch").as("status"),
        abs(coalesce(col("lsum"), lit(0L)) - col("ocents")).as("d"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("d")).as("abs_diff_cents"),
        max(col("d")).as("max_diff_cents"))
  }
}
