package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole forked test JVM. */
object SparkTestBase {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.codegen.cache.maxEntries", "16384")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  spark.sparkContext.setLogLevel("WARN")

  val sf0001 = "/root/testdata/sf0.001"

  /** Queries DELIBERATELY declared without oracle SQL (the driver
    * records its weaker rows-only check for these). Every entry needs
    * a reason here, and ContractSpec/CoreQueriesSpec fail on any
    * query missing from BOTH this set and oracleSql — a forgotten
    * oracle cannot hide:
    *  - x3_compression: DEFLATE exists in no SQL engine; semantics are
    *    pinned by TextDedupSpec (separation, determinism, null guard). */
  val intentionallyOracleless: Set[String] = Set("x3_compression")
}
