package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke + sanity over every SparkEntry query at sf0.001: runs, has a
  * stable schema, and (where structurally guaranteed) returns rows.
  * Exact value correctness is covered by the DuckDB oracle
  * (tools/compare.py locally; driver t2 at sf0.01). */
class CoreQueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has oracle SQL unless explicitly declared oracle-less") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle === SparkTestBase.intentionallyOracleless,
      s"queries without oracle: $noOracle")
  }

  for (name <- SparkEntry.queries.keys.toSeq.sorted) {
    test(s"$name runs at sf0.001 with non-empty schema") {
      val df = SparkEntry.queries(name)(spark, SparkTestBase.sf0001)
      assert(df.schema.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  test("aggregation invariant: city sums add up to the global sum") {
    import org.apache.spark.sql.functions._
    val enriched = graft.operators.Enrich.enrich(
      graft.sources.Tables(spark, SparkTestBase.sf0001, "orders"),
      graft.sources.Tables(spark, SparkTestBase.sf0001, "customer"))
    val byCity = graft.operators.Analytics.sumByCity(enriched)
      .agg(sum("total_purchase")).head.getDouble(0)
    val global = enriched.agg(sum("purchase_amount")).head.getDouble(0)
    assert(math.abs(byCity - global) < 1.0)
  }
}
