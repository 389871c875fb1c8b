package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Profiling
import graft.sources.Tables

class ProfilingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("profile computes null/distinct/min/max per column in one scan") {
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("b")))
      .toDF("id", "s")
    val p = Profiling.profile(df, Seq("id", "s"))
      .as[(String, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(p("id") === (("id", 0L, 3L, "1", "3")))
    assert(p("s") === (("s", 1L, 2L, "a", "b")))
  }

  test("quantileProfile equals Spark's exact percentile and exact distinct") {
    val events = Tables(spark, SparkTestBase.sf0001, "events")
    val expected = events.agg(
      count(col("value")).as("n"),
      countDistinct(col("value")).as("nd"),
      expr("round(percentile(value, 0.5), 4)"),
      expr("round(percentile(value, 0.95), 4)"),
      expr("round(percentile(value, 0.99), 4)")).head
    val r = Profiling.quantileProfile(events, "value").head
    assert(r.getLong(0) === expected.getLong(0))
    assert(r.getLong(1) === expected.getLong(1))
    assert(r.getDouble(2) === expected.getDouble(2))
    assert(r.getDouble(3) === expected.getDouble(3))
    assert(r.getDouble(4) === expected.getDouble(4))
  }

  test("quantileProfile handles nulls and a 1-row frame") {
    val df = Seq(Some(10.0), None, Some(30.0), Some(20.0), None).toDF("x")
    val r = Profiling.quantileProfile(df, "x").head
    assert(r.getLong(0) === 3L)
    assert(r.getLong(1) === 3L)
    assert(r.getDouble(2) === 20.0) // r=1.0 lands exactly on the middle value
    val one = Seq(42.5).toDF("x")
    val r1 = Profiling.quantileProfile(one, "x").head
    assert(r1.getDouble(2) === 42.5 && r1.getDouble(4) === 42.5)
  }

  test("groupedQuantiles equals Spark's exact percentile within each group") {
    val docs = Tables(spark, SparkTestBase.sf0001, "documents")
    val expected = docs.groupBy(col("source")).agg(
      count(col("n_chars")).as("n"),
      countDistinct(col("n_chars")).as("nd"),
      expr("round(percentile(n_chars, 0.25), 4)"),
      expr("round(percentile(n_chars, 0.5), 4)"),
      expr("round(percentile(n_chars, 0.75), 4)"),
      expr("round(percentile(n_chars, 0.9), 4)"))
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    val got = Profiling.groupedQuantiles(docs, "source", "n_chars")
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("sketch profile stays within HLL/quantile accuracy bounds") {
    val events = Tables(spark, SparkTestBase.sf0001, "events")
    val exactD = events.select(countDistinct("user_id")).head.getLong(0)
    val exactMedian = events.selectExpr("percentile(value, 0.5)").head.getDouble(0)
    val r = Profiling.sketchProfile(events, "value", "user_id").head
    val approxD = r.getLong(0)
    val quantiles = Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(math.abs(approxD - exactD).toDouble / exactD < 0.05,
      s"HLL estimate $approxD vs exact $exactD")
    assert(math.abs(quantiles.head - exactMedian) / math.max(exactMedian, 1e-9) < 0.05,
      s"approx median ${quantiles.head} vs exact $exactMedian")
    assert(quantiles.sorted === quantiles)
  }

  test("bot score: single-type burst flags, diverse slow traffic does not") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: 6 events, one type, one day → entropy 0, epd 6 → bot
    // user 2: 4 events, 4 types, 2 days → entropy ln(4)≈1.386 < 1.58
    //         but epd 2 < 2.5 → not a bot (rate arm saves them)
    val events = Seq(
      (1L, "click", "2020-01-01 10:00:00"), (1L, "click", "2020-01-01 10:00:01"),
      (1L, "click", "2020-01-01 10:00:02"), (1L, "click", "2020-01-01 10:00:03"),
      (1L, "click", "2020-01-01 10:00:04"), (1L, "click", "2020-01-01 10:00:05"),
      (2L, "view", "2020-01-01 09:00:00"), (2L, "click", "2020-01-01 11:00:00"),
      (2L, "buy", "2020-01-02 09:00:00"), (2L, "scroll", "2020-01-02 11:00:00")
    ).map { case (u, t, s) => (u, t, ts(s)) }.toDF("user_id", "event_type", "ts")
    val got = Profiling.botScore(events)
      .select("user_id", "n_events", "n_days", "n_types", "events_per_day",
        "type_entropy", "bot_flag")
      .as[(Long, Long, Long, Long, Double, Double, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 6L, 1L, 1L, 6.0, 0.0, true)))
    assert(got(2L)._5 === 2.0)
    assert(math.abs(got(2L)._6 - math.log(4)) < 1e-5)
    assert(!got(2L)._7)
  }

  test("portable HLL estimate tracks exact distinct within sketch error") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // day 1: 400 distinct users (raw-estimate branch territory for
    // m=64); day 2: 3 users (linear-counting branch)
    val rows =
      (1 to 400).map(u => (u.toLong, ts("2024-01-01 10:00:00"))) ++
        Seq((7L, ts("2024-01-02 10:00:00")), (8L, ts("2024-01-02 11:00:00")),
          (9L, ts("2024-01-02 12:00:00")), (7L, ts("2024-01-02 13:00:00")))
    val events = rows.toDF("user_id", "ts")
    val got = Profiling.hllUsers(events)
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.size === 2)
    val (big, small) = (got(19723L), got(19724L)) // epoch days
    assert(big._2 === 400L)
    // m=64 standard error is 1.04/sqrt(64) = 13%; allow 3 sigma
    assert(math.abs(big._5) < 0.4, s"day-1 rel_err ${big._5}")
    assert(small._2 === 3L)
    assert(small._3 > 0L) // empty registers -> linear counting ran
    assert(math.abs(small._5) < 0.4, s"day-2 rel_err ${small._5}")
    // duplicate events of one user must not move the sketch
    val dup = (rows ++ rows).toDF("user_id", "ts")
    assert(Profiling.hllUsers(dup).as[(Long, Long, Long, Double, Double)]
      .collect().map(r => r._1 -> r._4).toMap ===
      got.map { case (k, v) => k -> v._4 })
  }

  test("hllUsers withExact=false drops only the audit columns, never moves the estimate") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val rows =
      (1 to 400).map(u => (u.toLong, ts("2024-01-01 10:00:00"))) ++
        (7 to 9).map(u => (u.toLong, ts("2024-01-02 10:00:00")))
    val events = rows.toDF("user_id", "ts")
    val prod = Profiling.hllUsers(events, withExact = false)
    assert(prod.columns.toSeq === Seq("day", "v_empty", "hll_users"))
    val audit = Profiling.hllUsers(events)
      .select("day", "v_empty", "hll_users")
    assert(prod.exceptAll(audit).isEmpty && audit.exceptAll(prod).isEmpty)
    // the production form must not run the exact-distinct branch
    assert(!prod.queryExecution.optimizedPlan.toString.toLowerCase
      .contains("distinct"))
  }

  test("hll serve: folding stored registers equals the self-contained global, without raw rows") {
    val events = graft.sources.Tables(spark, SparkTestBase.sf0001, "events")
    val stored = Profiling.hllRegisters(events).localCheckpoint()
    val served = Profiling.hllGlobalFromRegisters(stored)
    // the scoring plan reads the checkpointed sketch only — no parquet
    // (i.e. no events) scan anywhere in it
    assert(!served.queryExecution.executedPlan.toString.toLowerCase
      .contains("parquet"))
    val self = Profiling.hllUsersGlobal(events).select("v_empty", "hll_users")
    assert(served.collect().toSeq === self.collect().toSeq)
  }

  test("rolling HLL: stored-sketch fold equals self-contained and tracks the exact rolling count") {
    val events = graft.sources.Tables(spark, SparkTestBase.sf0001, "events")
    val stored = Profiling.hllRegisters(events).localCheckpoint()
    val served = Profiling.rollingActiveFromRegisters(stored)
    // the rolling fold touches only the stored sketch — no raw scan
    assert(!served.queryExecution.executedPlan.toString.toLowerCase
      .contains("parquet"))
    val self = Profiling.rollingActiveHll(events)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(served.as[(Long, Long, Double)].collect().sortBy(_._1).toSeq === self)
    // the estimate tracks the exact trailing-7-day distinct within
    // 3-sigma HLL error (m=64 → 13% SE)
    val exact = graft.operators.Windows.rollingActive(events)
      .as[(Long, Long)].collect().toMap
    assert(self.nonEmpty && self.forall { case (d, _, est) =>
      math.abs(est - exact(d)) / exact(d).toDouble < 0.4 })
    // same report-day set as the exact operator
    assert(self.map(_._1).toSet === exact.keySet)
  }

  test("KMV audience overlap estimates a known Jaccard within sketch error") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // day 1: users 1..100; day 2: users 51..150 (J = 50/150);
    // day 3: users 1000..1049, disjoint from both
    val rows =
      (1 to 100).map(u => (u.toLong, ts("2024-01-01 10:00:00"))) ++
        (51 to 150).map(u => (u.toLong, ts("2024-01-02 10:00:00"))) ++
        (1000 to 1049).map(u => (u.toLong, ts("2024-01-03 10:00:00")))
    val got = Profiling.audienceOverlap(rows.toDF("user_id", "ts"))
      .as[(Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got.size === 3)
    val (est12, exact12) = got((19723L, 19724L))
    assert(exact12 === 0.333333)
    // k=32 coincidence estimator: sd ~ sqrt(J(1-J)/k) ~ 0.083
    assert(math.abs(est12 - 1.0 / 3) < 0.3, s"est $est12")
    val (est13, exact13) = got((19723L, 19725L))
    assert(exact13 === 0.0 && est13 <= 0.1)
    // duplicates must not move set estimates
    val dup = (rows ++ rows).toDF("user_id", "ts")
    assert(Profiling.audienceOverlap(dup)
      .as[(Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap === got)
    // KMV serve: the estimate column from STORED signatures matches the
    // self-contained audit's estimates, and the serve plan reads only
    // the checkpointed sketch
    val stored = Profiling.kmvSignatures(rows.toDF("user_id", "ts"))
      .localCheckpoint()
    val served = Profiling.audienceOverlapFromSignatures(stored)
    assert(!served.queryExecution.executedPlan.toString.toLowerCase
      .contains("parquet"))
    assert(served.as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap ===
      got.map { case (k, v) => k -> v._1 })
  }

  test("CMS: estimates never undercount, shard sketches merge by addition, serve probes the stored table") {
    val docs = Tables(spark, SparkTestBase.sf0001, "documents")
    // heavy-hitter audit: CMS point estimates are exact-or-over, never under
    val audit = Profiling.cmsTopK(docs)
      .as[(String, Int, Long, Long, Long)].collect()
    assert(audit.length === 20)
    assert(audit.forall { case (_, _, exact, est, over) =>
      est >= exact && over === est - exact
    })
    // mergeability — THE property that makes the sketch the persisted
    // artifact: per-shard sketches fold into the corpus sketch by
    // plain counter addition (no re-read of either shard)
    val full = Profiling.cmsSketch(docs)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val even = Profiling.cmsSketch(docs.filter(col("doc_id") % 2 === 0))
    val odd = Profiling.cmsSketch(docs.filter(col("doc_id") % 2 === 1))
    val merged = even.union(odd)
      .groupBy(col("tbl"), col("bucket")).agg(sum(col("c")).as("c"))
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(merged === full)
    // serve against the STORED sketch: in-corpus token estimates match
    // the audit's, an unseen token estimates exactly 0, and the serve
    // plan never touches parquet
    val stored = Profiling.cmsSketch(docs).localCheckpoint()
    val batch = (audit.map(_._1) :+ "zzz-never-a-token").toSeq.toDF("token")
    val served = Profiling.cmsEstimateAgainst(batch, stored)
    assert(!served.queryExecution.executedPlan.toString.toLowerCase
      .contains("parquet"))
    val est = served.as[(String, Long)].collect().toMap
    assert(est("zzz-never-a-token") === 0L)
    audit.foreach { case (tok, _, _, e, _) => assert(est(tok) === e) }
  }
}
