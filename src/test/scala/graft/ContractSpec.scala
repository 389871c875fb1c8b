package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards on the DRIVER CONTRACT itself — the artifacts the harness
  * parses blindly. A malformed oracle dump or a lost row under
  * concurrent sink writers would not fail any query; it would zero a
  * whole round's correctness signal, which is worse. */
class ContractSpec extends AnyFunSuite {

  test("the oracle_sql.json dump is valid JSON covering every declared oracle") {
    val json = Verify.oracleJson
    // a real parser (Jackson, shipped with Spark), not a regex
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(json)
    assert(node.isObject)
    val keys = {
      val it = node.fieldNames(); val b = Seq.newBuilder[String]
      while (it.hasNext) b += it.next()
      b.result().toSet
    }
    assert(keys === SparkEntry.oracleSql.keySet)
    // every value survives the round-trip byte-identically
    SparkEntry.oracleSql.foreach { case (k, v) =>
      assert(node.get(k).asText() === v, s"escape mangled oracle $k")
    }
  }

  test("every declared oracle has a query, and the weaker direction is intentional") {
    // an oracle without a query would silently never run
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // queries without an oracle get only the rows>0 check — keep the
    // list EXPLICIT so a forgotten oracle cannot hide
    val weak = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(weak === SparkTestBase.intentionallyOracleless,
      s"queries with no oracle: $weak")
  }

  test("concurrent mem-table appenders lose no rows") {
    import graft.sources.v2.GraftStore
    import org.apache.spark.sql.catalyst.InternalRow
    val schema = new org.apache.spark.sql.types.StructType().add("x", "long")
    try {
      val threads = (0 until 8).map { t =>
        new Thread(() => (0 until 100).foreach { i =>
          GraftStore.append("cc", schema, Seq(InternalRow(t * 1000L + i)))
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      val got = GraftStore.rowsOf("cc").map(_.getLong(0))
      assert(got.length === 800 && got.toSet.size === 800)
    } finally GraftStore.drop("cc")
  }
}
