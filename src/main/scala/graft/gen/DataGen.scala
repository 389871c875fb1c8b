package graft.gen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Workload generator replicating the reference producer
  * (`orders-generator/main.go`, SURVEY §2 C15–C17): order events with
  * UUID ids, customerID uniform in [1,10000], amount uniform in
  * [20,499].
  *
  * Batch flavor is deterministic under a seed (ids are md5 of the row
  * number — reproducible runs); the streaming flavor rides the `rate`
  * source. Both are pure column expressions over `range`/`rate`, so
  * generation parallelizes per partition with zero shuffle at any
  * scale.
  */
object DataGen {

  /** Column expressions mapping a monotonically increasing id column to
    * one order event (main.go:82-84 distributions). */
  def orderColumns(id: Column): Seq[Column] = Seq(
    md5(id.cast("string")).as("orderID"),
    (floor(rand(42) * 10000) + 1).cast("long").as("customerID"),
    (floor(rand(4242) * 480) + 20).cast("long").as("amount"))

  /** C15/C16 batch generator: n synthetic order events. */
  def ordersBatch(spark: SparkSession, n: Long, partitions: Int = 32): DataFrame =
    spark.range(0, n, 1, partitions).select(orderColumns(col("id")): _*)

  /** The reference customers table regenerated at any cardinality
    * (dense ids 1..n) for joins at higher scale factors. */
  def customersBatch(spark: SparkSession, n: Long, partitions: Int = 32): DataFrame = {
    val cities = Seq("Phoenix", "SanJose", "Seattle", "Houston", "Chicago",
      "Dallas", "SanDiego", "NewYork", "Boston", "NewJersey", "LosAngeles",
      "SanAntonio", "Austin", "Philadelphia")
    spark.range(0, n, 1, partitions).select(
      (col("id") + 1).cast("int").as("cust_id"),
      concat(lit("cust-"), col("id") + 1).as("cust_name"),
      element_at(array(cities.map(lit): _*),
        (pmod(col("id"), lit(cities.size)) + 1).cast("int")).as("city"))
  }
}
