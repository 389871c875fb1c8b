package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-out techniques whose OUTPUT is provably identical to the
  * naive plan — the oracle for each is the plain formulation.
  */
object Scale {

  /** Salted inner equi-join for skewed build keys: every big-side row
    * gets one of `salts` salt values; the small side is replicated once
    * per salt; the join key becomes (key, salt). Row-for-row identical
    * to the unsalted join — each big row still matches exactly the
    * small rows with its key — but a hot key now spreads over `salts`
    * shuffle partitions. (AQE's skewedJoin handles moderate skew
    * automatically; explicit salting is for pathological keys and for
    * engines/plans AQE can't split.) */
  def saltedJoin(big: DataFrame, small: DataFrame,
                 bigKey: String, smallKey: String, salts: Int = 8): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(col(bigKey), monotonically_increasing_id()), lit(salts)).cast("int"))
    val saltedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedSmall,
        saltedBig(bigKey) === saltedSmall(smallKey) &&
          saltedBig("_salt") === saltedSmall("_salt"), "inner")
      .drop("_salt")
  }

  /** The flagship enrichment aggregate run through the salted join —
    * output equals the plain broadcast-join formulation (the oracle
    * states the plain SQL). */
  def saltedRevenueByCity(orders: DataFrame, customer: DataFrame): DataFrame =
    saltedJoin(orders, customer, "o_custkey", "c_custkey")
      .groupBy(col("c_mktsegment").as("city"))
      .agg(round(sum(col("o_totalprice")), 4).as("total_purchase"),
        count(lit(1)).as("n"))

  /** ROLLUP hierarchy totals (returnflag → linestatus → grand total).
    * Subtotal rows' null group keys are coalesced to 'ALL' so the
    * driver's row-sort compare never orders mixed null/string cells. */
  def rollupSummary(lineitem: DataFrame): DataFrame =
    lineitem.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 4).as("sum_qty"),
        count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
        col("sum_qty"), col("n"))

  /** CUBE over the same pair — all four grouping combinations in one
    * pass (leaf, each one-column margin, grand total). Plans as a
    * single Expand + hash aggregation: 4 grouping sets × N rows, the
    * price of every margin at once; when only the leaf + totals are
    * needed, [[rollupSummary]] is the cheaper 3-set shape. */
  def cubeSummary(lineitem: DataFrame): DataFrame =
    lineitem.cube(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 4).as("sum_qty"),
        count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
        col("sum_qty"), col("n"))

  /** Aggregate breadth: exact count-distinct, min/max, sample stddev,
    * exact interpolated median per group.
    *
    * The median deliberately avoids Spark's `percentile` aggregate:
    * that is a TypedImperativeAggregate which buffers EVERY value per
    * group and drags the whole aggregation into non-codegen
    * ObjectHashAggregate (it was 60% of this query's runtime). Over a
    * bounded-domain column the exact interpolated median is instead
    * computed from value counts — groupBy (flag, qty) is a codegen'd
    * hash aggregate whose state is the DISTINCT VALUE COUNT (50 here),
    * not the row count, then a window over those few counted rows
    * interpolates rank (n−1)/2. Same value as `percentile`/DuckDB
    * `quantile_cont` bit-for-bit, but the 100 TB scan stays in
    * whole-stage codegen with O(|domain|) state. */
  def aggExtras(lineitem: DataFrame): DataFrame = {
    val base = lineitem.groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"))
    val counts = lineitem.groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("l_returnflag"))
    // 0-based rank range [cum-cnt, cum) per value; median rank r=(n-1)/2
    // (fractional). A value contributes floor(r) and/or ceil(r) when its
    // range covers them; interpolation weights by the fraction of r.
    val ranked = counts
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .withColumn("r", (col("n") - 1).cast("double") / 2.0)
      .withColumn("lo", floor(col("r")))
      .withColumn("hi", ceil(col("r")))
    // interpolation weights; integer data only ever sees r fractions of
    // 0 or .5, where lo*(1−f) + hi*f is float-exact on any engine
    val wLo = when(col("lo") === col("hi"), lit(1.0))
      .otherwise(col("hi") - col("r"))
    val wHi = when(col("lo") === col("hi"), lit(0.0))
      .otherwise(col("r") - col("lo"))
    def covers(rank: org.apache.spark.sql.Column) =
      col("cum") - col("cnt") <= rank && rank < col("cum")
    val median = ranked
      .withColumn("contrib",
        coalesce(when(covers(col("lo")), col("l_quantity") * wLo), lit(0.0)) +
          coalesce(when(covers(col("hi")), col("l_quantity") * wHi), lit(0.0)))
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("contrib")), 4).as("median_qty"))
    base.join(median, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("n_parts"), col("min_qty"),
        col("max_qty"), col("sd_price"), col("median_qty"))
  }

  /** Date-part grouping over the order timeline. */
  def ordersByMonth(orders: DataFrame): DataFrame =
    orders.groupBy(
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 4).as("revenue"))

  /** FULL OUTER join — the ledger-reconciliation shape: two sparse
    * daily aggregates whose key sets only partially overlap (days with
    * a big-ticket order vs days with an urgent order); a day present
    * on one side only surfaces with nulls on the other — null here
    * means ABSENT, deliberately not coalesced to 0. Both inputs
    * aggregate before the join (one row per day each side), so the
    * join is tiny regardless of order volume. */
  def dailyReconcile(orders: DataFrame): DataFrame = {
    val big = orders.filter(col("o_totalprice") > 400000.0)
      .groupBy(col("o_orderdate").as("day"))
      .agg(count(lit(1)).as("n_big"))
    val urgent = orders.filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(col("o_orderdate").as("day"))
      .agg(count(lit(1)).as("n_urgent"))
    big.join(urgent, Seq("day"), "full_outer")
      .select(col("day"), col("n_big"), col("n_urgent"))
  }

  /** GROUPING SETS with a NON-hierarchical set list — the two
    * one-column margins only, the report neither ROLLUP (hierarchy)
    * nor CUBE (all four sets) expresses without waste: each requested
    * margin costs one Expand replica, no more. */
  def groupingSetsSummary(lineitem: DataFrame): DataFrame =
    lineitem.groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 4).as("sum_qty"),
        count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
        col("sum_qty"), col("n"))

  /** Trailing 7-DAY revenue via a RANGE window frame on the integer
    * day — VALUE-offset semantics, not row-offset: calendar gaps
    * shrink the window instead of silently widening it (the ROWS
    * moving average cannot express this). Exact integer cents in and
    * out; the global window runs over the aggregated day frame only
    * (bounded domain), the [[movingAvgRevenue]] precedent. */
  def trailingRevenue(orders: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("day")).rangeBetween(-6, 0)
    orders
      .groupBy(datediff(col("o_orderdate"),
        lit(java.sql.Date.valueOf("1970-01-01"))).cast("long").as("day"))
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("rev_c"))
      .select(col("day"), col("rev_c"),
        sum(col("rev_c")).over(w).as("rev7_c"))
  }

  /** Trailing 3-day moving average of daily revenue — the window-FRAME
    * surface (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) the ranking
    * queries don't exercise. The window runs over the AGGREGATED
    * O(days) frame, never raw orders: aggregate first (partial+final
    * on day), then one tiny ordered window — a global orderBy window
    * over a thousand rows is free; over 100 TB of raw rows it would be
    * the classic single-reducer sort this operator exists to avoid.
    * Cross-engine float parity: EACH ORDER quantizes to integer CENTS
    * (`floor(x·100 + 0.5)`, half-up) BEFORE the day sum, so both the
    * day total and the frame sum are exact integer arithmetic
    * (quantize-after-sum would leave the day total an order-dependent
    * float sum — ~1e11 cents over ~1e5 orders at large SF accumulates
    * error past the 0.5 half-up margin; windowed float sums are
    * additionally evaluation-order-dependent — DuckDB's segment-tree
    * windows sum in a different order than a sequential fold). The
    * average is ONE IEEE division. */
  def movingAvgRevenue(orders: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("day")).rowsBetween(-2, 0)
    orders.groupBy(col("o_orderdate").as("day"))
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("rev_c"))
      .select(col("day"), col("rev_c"),
        (sum(col("rev_c")).over(w).cast("double") /
          (count(lit(1)).over(w) * lit(100.0))).as("ma3"))
  }

  /** CTE + scalar-subquery shape: customers whose spend exceeds 1.5×
    * the mean customer spend. The threshold is a broadcast scalar
    * (cross join of a 1-row aggregate); per-customer spend uses the
    * cross-engine-exact round-of-sum form. */
  /** Recency-weighted trending parts — each line item's revenue decays
    * by 2× per week of age ("what is hot NOW, not what sold most
    * ever"), top 20 parts. The decay weight is the INTEGER 2^(H−1−w)
    * (H = horizon): cents × weight sums exactly in 64-bit integers, so
    * the whole leaderboard is deterministic on any engine — a float
    * `exp(−λ·age)` formulation would make both the sum and the ranking
    * order-dependent. The single IEEE division at the end only
    * rescales for display; ordering uses the integer score.
    *
    * Scale shape: the orders side collapses to (orderkey, age-week)
    * and is horizon-filtered BEFORE the join (the 100 TB fact table
    * never carries a date column through the shuffle); partial+final
    * aggregation on l_partkey. Horizon bounds the weight at 2^(H−1),
    * so cents × weight stays far from int64 overflow for any realistic
    * per-part weekly revenue (documented bound: H=12 → weight ≤ 2048,
    * headroom ~4·10¹⁵ cents per (part, week)). */
  def decayTrend(orders: DataFrame, lineitem: DataFrame,
                 horizonWeeks: Int = 12, k: Int = 20): DataFrame = {
    val maxD = orders.agg(max(col("o_orderdate")).as("max_d"))
    val recent = orders.crossJoin(broadcast(maxD))
      .withColumn("w", expr("datediff(max_d, o_orderdate) div 7"))
      .filter(col("w") < horizonWeeks)
      .select(col("o_orderkey"), col("w"))
    recent.join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .select(col("l_partkey"), col("w"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"))
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("cents") *
          expr(s"shiftleft(CAST(1 AS BIGINT), CAST(${horizonWeeks - 1} - w AS INT))"))
          .as("score_scaled"))
      .orderBy(col("score_scaled").desc, col("l_partkey"))
      .limit(k)
      .select(col("l_partkey"), col("n_items"),
        (col("score_scaled").cast("double") /
          lit((1L << (horizonWeeks - 1)) * 100.0)).as("score"))
  }

  def bigSpenders(orders: DataFrame): DataFrame = {
    val spend = orders.groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 4).as("spend"))
    val threshold = spend.agg(
      (round(sum(col("spend")), 4) / count(lit(1)) * 1.5).as("thr"))
    spend.crossJoin(broadcast(threshold))
      .filter(col("spend") > col("thr"))
      .select(col("o_custkey"), col("spend"))
  }

  /** Correlated scalar subquery (TPC-H Q17 shape): lineitems whose
    * quantity falls below 20% of their OWN part's average — written as
    * SQL so Catalyst's subquery DECORRELATION runs (the subquery
    * rewrites to an aggregate + join; `.explain` shows no per-row
    * subplan). The correlated average is exact cross-engine:
    * l_quantity is integer-valued, so sum and sum/count are
    * bit-deterministic regardless of fold order. One hash join on
    * partkey + one aggregation — the decorrelated plan a 100 TB run
    * needs (a per-row subquery would be O(n) scans). */
  def smallQtyRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val spark = lineitem.sparkSession
    // uniquely-named views, dropped after analysis: spark.sql resolves
    // views INTO the returned plan eagerly, so the frame survives the
    // drop — and the session's view namespace is left untouched
    // (fixed names would clobber a caller's views and race concurrent
    // invocations)
    val tag = java.util.UUID.randomUUID().toString.replace("-", "")
    val lv = s"lineitem_$tag"
    val pv = s"part_$tag"
    lineitem.createOrReplaceTempView(lv)
    part.createOrReplaceTempView(pv)
    try spark.sql(
      s"""SELECT p.p_brand, round(sum(l1.l_extendedprice), 4) AS revenue,
                 count(*) AS n_small
          FROM $lv l1 JOIN $pv p ON p.p_partkey = l1.l_partkey
          WHERE p.p_size <= 5
            AND l1.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                                 FROM $lv l2
                                 WHERE l2.l_partkey = l1.l_partkey)
          GROUP BY p.p_brand""")
    finally {
      spark.catalog.dropTempView(lv)
      spark.catalog.dropTempView(pv)
    }
  }

  /** CASE-based pivot: order counts by priority × status — the
    * portable formulation of PIVOT (identical in ANSI SQL). */
  def statusPivot(orders: DataFrame): DataFrame =
    orders.groupBy(col("o_orderpriority"))
      .agg(
        sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_open"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_filled"),
        sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("n_pending"))

  /** Scalar string-function surface. */
  def stringFuncs(customer: DataFrame): DataFrame =
    customer.select(
      col("c_custkey"),
      upper(substring(col("c_name"), 1, 8)).as("prefix"),
      length(col("c_name")).cast("long").as("name_len"),
      concat_ws("-", col("c_mktsegment"), col("c_nationkey")).as("seg_nation"),
      regexp_replace(col("c_name"), "[aeiou]", "").as("devoweled"))
}
