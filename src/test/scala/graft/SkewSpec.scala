package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FormattedMode
import graft.sources.Tables

/** Scale-safety of the hot-key shapes (guide §2.5) — power-law keys
  * hit the co-visitation pair rollup and the cluster propagation
  * rollup at 100 TB, and skew protection there comes from TWO
  * mechanisms this spec pins so neither silently regresses:
  *
  *  - AGGREGATIONS are safe because Spark plans them partial+final
  *    (two-level aggregation is built in): a hot pair / hot src
  *    collapses to one partial row per map task BEFORE the exchange,
  *    so the reduce side receives at most #map-tasks rows per key.
  *    AQE's skew handling does NOT apply to aggregations — the
  *    partial phase is the only protection, hence the plan pin.
  *
  *  - The propagation JOIN (edges ⋈ labels on dst) concentrates a
  *    giant near-dup component's rows on one dst key. When its
  *    inputs arrive via shuffle, AQE's skew-join split applies; the
  *    synthetic-hot-key test below proves that with the repo's
  *    default session shape (thresholds lowered to make a unit-sized
  *    corpus "skewed" — the mechanism, not the numbers, is the pin).
  *    The production caveat is documented in clusterNearDups: the
  *    cached pre-partitioned edge side bypasses AQE, and its hot-key
  *    cost is bounded by the largest component's size per round.
  */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, SparkTestBase.sf0001)
      .queryExecution.explainString(FormattedMode)

  test("covisit pair rollup aggregates map-side before the shuffle (hot pair collapses)") {
    val p = planOf("x6_covisit")
    // the groupBy(item_a, item_b) count must plan a partial_count
    // below its exchange — a hot item pair then ships one row per
    // map task, not one per user
    assert(p.contains("partial_count"), p)
  }

  test("session covisit rollup aggregates map-side before the shuffle") {
    val p = planOf("x6_covisit_session")
    assert(p.contains("partial_count"), p)
  }

  test("covisit candidate join is equi-keyed and cap-bounded, never a nested loop") {
    val p = planOf("x6_covisit")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("cluster propagation rollup is a partial+final min (hot src collapses map-side)") {
    import spark.implicits._
    val labels = Seq((1L, 1L), (2L, 2L)).toDF("doc_id", "cluster")
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 2L)).toDF("src", "dst")
    val p = graft.operators.Dedup.propagateRound(labels, edges)
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("partial_min"), p)
  }

  test("AQE splits a skewed hot key in the propagation-shaped join (synthetic hot dst)") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ).map(k => k -> scala.util.Try(conf.get(k)).toOption.flatMap(Option(_))).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // make a unit-test-sized hot partition count as skewed: the
      // thresholds are data-size knobs, the MECHANISM under test is
      // that this join shape is eligible for the runtime split at all
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // one giant star component: every edge points at dst=0 (the
      // representative) — the exact shape a 10^6-member duplicate
      // cluster produces in the symmetrized band-pair graph
      val n = 40000L
      val edges = spark.range(1, n).select(col("id").as("src"), lit(0L).as("dst"))
        .unionAll(spark.range(n, n + 64)
          .select(col("id").as("src"), (col("id") % 8 + 1).as("dst")))
      val labels = spark.range(0, n + 64).select(col("id").as("doc_id"),
        col("id").as("cluster"))
      val joined = graft.operators.Dedup.propagateRound(labels, edges)
      joined.collect() // executes THIS QueryExecution: final AQE plan
      val p = joined.queryExecution.explainString(FormattedMode)
      assert(p.contains("isFinalPlan=true"), p)
      // the hot dst=0 partition must have been runtime-split
      assert(p.contains("skewed"), p)
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
