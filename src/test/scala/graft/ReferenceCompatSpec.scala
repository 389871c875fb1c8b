package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The reference's five queries run VERBATIM (text copied from the
  * reference README: ASA job SQL at README.md:166-170, Cosmos SQL at
  * README.md:227-245) through ReferenceCompat — batch and streaming. */
class ReferenceCompatSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val asaSql =
    """SELECT o.orderID as order_id, o.customerID as customer_id, c.cust_name as customer_name, c.city as city, o.amount as purchase_amount
      |FROM orders o
      |JOIN customers c
      |ON o.customerID = c.cust_id""".stripMargin

  private def orders = Seq(("o1", 1L, 182L), ("o2", 2L, 33L), ("o3", 1L, 100L))
    .toDF("orderID", "customerID", "amount")
  private def customers = Seq((1, "Willis Collins", "Chicago"), (2, "Casey Brady", "Dallas"))
    .toDF("cust_id", "cust_name", "city")

  private def enriched = ReferenceCompat.runAsaQuery(spark, asaSql, orders, customers)

  test("the ASA job SQL runs verbatim (batch)") {
    val got = enriched.orderBy("order_id")
      .as[(String, Long, String, String, Long)].collect().toSeq
    assert(got === Seq(
      ("o1", 1L, "Willis Collins", "Chicago", 182L),
      ("o2", 2L, "Casey Brady", "Dallas", 33L),
      ("o3", 1L, "Willis Collins", "Chicago", 100L)))
  }

  test("the same ASA SQL text runs as a continuous streaming query") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val streamOrders = mem.toDF().toDF("orderID", "customerID", "amount")
    val q = ReferenceCompat.runAsaQuery(spark, asaSql, streamOrders, customers)
      .writeStream.format("memory").queryName("asa_verbatim")
      .outputMode("append").start()
    try {
      mem.addData(("s1", 2L, 7L))
      q.processAllAvailable()
      val got = spark.table("asa_verbatim")
        .as[(String, Long, String, String, Long)].head()
      assert(got === (("s1", 2L, "Casey Brady", "Dallas", 7L)))
    } finally q.stop()
  }

  test("Cosmos query 1 verbatim: filter with double-quoted literal") {
    val got = ReferenceCompat.runCosmosQuery(spark,
      """//orders from Chicago
        |SELECT * FROM c where c.city="Chicago"""".stripMargin, enriched)
    assert(got.count() === 2)
  }

  test("Cosmos query 2 verbatim: SELECT VALUE scalar average") {
    val got = ReferenceCompat.runCosmosQuery(spark,
      """//average purchase amount for orders from Chicago
        |SELECT VALUE AVG(c.purchase_amount) from c where c.city="Chicago"""".stripMargin,
      enriched)
    assert(got.columns.length === 1)
    assert(got.head.getDouble(0) === 141.0) // (182 + 100) / 2
  }

  test("Cosmos queries 3+4 verbatim: grouped AVG and SUM") {
    val avg = ReferenceCompat.runCosmosQuery(spark,
      """SELECT AVG(c.purchase_amount) AS avg_purchase, c.city
        |FROM c
        |GROUP BY c.city""".stripMargin, enriched)
      .as[(Double, String)].collect().toMap.map(_.swap)
    assert(avg("Chicago") === 141.0 && avg("Dallas") === 33.0)
    val sum = ReferenceCompat.runCosmosQuery(spark,
      """SELECT SUM(c.purchase_amount) AS total_purchase, c.city
        |FROM c
        |GROUP BY c.city""".stripMargin, enriched)
      .as[(Long, String)].collect().map(_.swap).toMap
    assert(sum("Chicago") === 282L && sum("Dallas") === 33L)
  }
}
