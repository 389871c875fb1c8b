package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Verbatim reference-query compatibility: a user of the reference
  * pipeline can paste their existing job SQL unchanged.
  *
  *  - The ASA enrichment query (reference `README.md:166-170`) is plain
  *    SQL over the `orders` and `customers` inputs — Spark SQL parses
  *    it as-is, batch or streaming (register a streaming DataFrame as
  *    the `orders` view and the same text becomes a continuous query).
  *  - The Cosmos analytical queries (reference `README.md:227-245`)
  *    need two dialect shims: `//` line comments and the
  *    `SELECT VALUE <expr>` scalar-unwrap form; container alias `c` is
  *    a registered view over the enriched output. Double-quoted string
  *    literals ("Chicago") parse natively (Spark treats double quotes
  *    as string literals unless ANSI double-quoted identifiers are
  *    enabled).
  */
object ReferenceCompat {

  /** Run an ASA-style enrichment query verbatim over the given inputs. */
  def runAsaQuery(spark: SparkSession, sql: String,
                  orders: DataFrame, customers: DataFrame): DataFrame = {
    orders.createOrReplaceTempView("orders")
    customers.createOrReplaceTempView("customers")
    spark.sql(sql)
  }

  /** Translate + run a Cosmos SQL query verbatim against the enriched
    * container view `c`. */
  def runCosmosQuery(spark: SparkSession, sql: String, container: DataFrame): DataFrame = {
    container.createOrReplaceTempView("c")
    spark.sql(translateCosmos(sql))
  }

  /** The two-shim Cosmos dialect translation (pure text, no semantic
    * rewrite): drop `//` comments, unwrap `SELECT VALUE expr`. */
  def translateCosmos(sql: String): String = {
    val noComments = sql.linesIterator
      .filterNot(_.trim.startsWith("//")).mkString("\n").trim
    noComments.replaceAll("(?is)^\\s*SELECT\\s+VALUE\\s+", "SELECT ")
  }
}
