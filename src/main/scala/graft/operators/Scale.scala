package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Aggregate breadth: exact count-distinct, min/max, sample stddev,
    * exact interpolated median per group. */
  def aggExtras(lineitem: DataFrame): DataFrame =
    lineitem.groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
        round(expr("percentile(l_quantity, 0.5)"), 4).as("median_qty"))

  /** Date-part grouping over the order timeline. */
  def ordersByMonth(orders: DataFrame): DataFrame =
    orders.groupBy(
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 4).as("revenue"))

  /** CTE + scalar-subquery shape: customers whose spend exceeds 1.5×
    * the mean customer spend. The threshold is a broadcast scalar
    * (cross join of a 1-row aggregate); per-customer spend uses the
    * cross-engine-exact round-of-sum form. */
  def bigSpenders(orders: DataFrame): DataFrame = {
    val spend = orders.groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 4).as("spend"))
    val threshold = spend.agg(
      (round(sum(col("spend")), 4) / count(lit(1)) * 1.5).as("thr"))
    spend.crossJoin(broadcast(threshold))
      .filter(col("spend") > col("thr"))
      .select(col("o_custkey"), col("spend"))
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
