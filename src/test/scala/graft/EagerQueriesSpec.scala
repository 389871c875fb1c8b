package graft

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.graft.ListenerBridge
import org.scalatest.funsuite.AnyFunSuite

/** Pins `SparkEntry.eagerQueries` to reality: a query is eager iff
  * merely CONSTRUCTING its DataFrame launches Spark jobs (fixpoint
  * loops, model-training collects, localCheckpoint materialization).
  * Bench stamps these with `"eager":true` so its warm medians are read
  * against fresh steady state, not against cold — this spec fails the
  * moment the declared set drifts from what the code actually does. */
class EagerQueriesSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark

  test("eagerQueries is exactly the set of queries that run jobs at construction") {
    val sc = spark.sparkContext
    val jobs = new AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    }
    sc.addSparkListener(listener)
    try {
      // warm the per-path schema cache first: the FIRST read of each
      // parquet table runs a footer-inference job that would otherwise
      // make every query look eager
      graft.sources.Tables.names.foreach(n =>
        graft.sources.Tables(spark, SparkTestBase.sf0001, n))
      // the trained-model memo must start empty: a suite that ran a
      // residual query earlier would otherwise make the pair's base
      // query look lazy here (detection must be order-independent)
      graft.operators.ModelCache.clear()
      val detected = SparkEntry.queries.keys.toSeq.sorted.filter { name =>
        ListenerBridge.drain(sc)
        val before = jobs.get()
        SparkEntry.queries(name)(spark, SparkTestBase.sf0001)
        ListenerBridge.drain(sc)
        spark.catalog.clearCache()
        sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        jobs.get() > before
      }.toSet
      val extra = SparkEntry.eagerQueries -- detected
      val missing = detected -- SparkEntry.eagerQueries
      assert(extra.isEmpty && missing.isEmpty,
        s"declared-but-lazy: ${extra.toSeq.sorted.mkString(",")}; " +
          s"eager-but-undeclared: ${missing.toSeq.sorted.mkString(",")}")
    } finally sc.removeSparkListener(listener)
  }

  test("every eager query exists in queries") {
    val unknown = SparkEntry.eagerQueries -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, unknown.toSeq.sorted.mkString(","))
  }
}
