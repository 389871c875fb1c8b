package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query, run twice, must produce the identical
  * multiset. The driver's correctness gate compares ONE Spark run
  * against DuckDB — an operator with run-to-run nondeterminism
  * (a stray rand(), an unordered limit racing partitions, a
  * float-sum folding in shuffle order) would pass or fail that gate
  * by luck. The repo's determinism conventions (hash-derived
  * sampling, rounded tie-breaks, pinned concat order) exist exactly
  * to make this sweep hold; new operators buy in automatically by
  * being declared. */
class DeterminismSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("all declared queries are run-to-run deterministic at sf0.001") {
    val flaky = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      def runOnce() = fn(spark, SparkTestBase.sf0001).collect()
        .map(_.toString).groupBy(identity).view.mapValues(_.length).toMap
      val a = runOnce()
      val b = runOnce()
      if (a == b) None else Some(name)
    }
    assert(flaky.isEmpty, s"nondeterministic queries: $flaky")
  }
}
