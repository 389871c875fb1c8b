package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data profiling — the first pass any large-scale ingest runs: per
  * column null counts, distinct cardinality, and min/max. One job,
  * one pruned single-column scan per profiled column (≈ one wide pass
  * of total I/O), all hash aggregation — see [[profile]] for why this
  * beats the one-scan Expand/stack formulation.
  *
  * Long/string columns only in the oracle-checked surface: integer and
  * string min/max render identically across engines, while float
  * formatting does not.
  */
object Profiling {

  /** Long-format profile of the named columns: (column, n_nulls,
    * n_distinct, min_s, max_s) — one branch per column, each a
    * two-phase `groupBy(value)` from which nulls, distinct count and
    * min/max all derive.
    *
    * Why per-column branches beat the classic "one wide agg + stack
    * unpivot": exact multi-column count-distinct plans as Expand
    * (|cols|+1 copies of every row) into a SortAggregate — string
    * min/max forces immutable agg buffers — i.e. a full sort of the
    * multiplied input. The branch shape stays in codegen'd hash
    * aggregation end to end (partial per partition, tiny final), and
    * column pruning means each branch's scan reads ONLY its column —
    * total bytes read ≈ the single wide scan. Measured at sf0.1:
    * 0.5 s vs 1.3 s warm for the stack/Expand form. At 100 TB the gap
    * widens: the Expand sort shuffles (|cols|+1)·N rows to ONE
    * aggregation, while each branch here shuffles its per-partition
    * DISTINCT values only, with no sort anywhere. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { c =>
      df.groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
        .agg(
          coalesce(sum(when(col("v").isNull, col("cnt"))), lit(0L)).as("n_nulls"),
          count(col("v")).as("n_distinct"),
          min(col("v")).cast("string").as("min_s"),
          max(col("v")).cast("string").as("max_s"))
        .select(lit(c).as("column"), col("n_nulls"), col("n_distinct"),
          col("min_s"), col("max_s"))
    }.reduce(_ unionAll _)

  /** Join-key skew diagnostic — the pre-flight any 100 TB join should
    * run: the k hottest keys of a column with exact counts, their
    * share of all rows, and a skew factor (count over the
    * uniform-expectation count, i.e. n·n_keys/total; 1.0 = perfectly
    * uniform). A key with skew ≫ 1 is the one that melts a reducer in
    * a shuffled join — the decision input for salting
    * ([[Scale.saltedJoin]]), AQE skew splitting, or a broadcast
    * rewrite.
    *
    * Scale shape: one partial+final count aggregation keyed on the
    * column (the hot key itself arrives as one partial per map task —
    * counting skew does not suffer the skew), a broadcast 1-row
    * totals frame, then a global top-k (TakeOrderedAndProject: O(k)
    * heap per partition, never a full sort). Ordering is exact-integer
    * count descending with the key as a total tie-break — no float
    * enters the ordering. */
  def heavyHitters(df: DataFrame, keyCol: String, k: Int = 20): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("total"), count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(tot))
      .select(col("key"), col("n"),
        round(col("n").cast("double") / col("total").cast("double"), 6).as("share"),
        round(col("n").cast("double") * col("n_keys").cast("double") /
          col("total").cast("double"), 4).as("skew"))
      .orderBy(col("n").desc, col("key").asc)
      .limit(k)
  }

  /** Exact interpolated quantiles (p50/p95/p99) + exact distinct count
    * of a bounded-domain numeric column, computed from VALUE COUNTS —
    * the same trick as Scale.aggExtras' counting-median, generalized to
    * arbitrary quantile fractions.
    *
    * Why not `percentile`: Spark's exact percentile is a
    * TypedImperativeAggregate that buffers every row per group and
    * forces non-codegen ObjectHashAggregate. Here the scan stays in
    * whole-stage codegen: groupBy(value) holds O(|domain|) state with
    * map-side partials, then the quantile is interpolated over the few
    * counted rows. The global window over the counted rows runs in one
    * partition — fine by construction, |domain| ≪ |rows| is the
    * operator's precondition (use sketchProfile otherwise).
    *
    * Interpolation matches DuckDB `quantile_cont` BIT-FOR-BIT: rank
    * r = q·(n−1), result = v[⌊r⌋]·(⌈r⌉−r) + v[⌈r⌉]·(r−⌊r⌋) — verified
    * empirically that DuckDB uses this weighted-sum form, not the
    * algebraically-equal-but-float-different lerp v[lo] + f·(v[hi]−v[lo]).
    */
  def quantileProfile(df: DataFrame, valueCol: String,
                      quantiles: Seq[(String, Double)] =
                        Seq("p50" -> 0.5, "p95" -> 0.95, "p99" -> 0.99)): DataFrame = {
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).cast("double").as("v"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    val ranked = counts
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
    // 0-based rank range [cum-cnt, cum) per value; a value contributes
    // at floor(r) and/or ceil(r) when its range covers them. All other
    // rows contribute exactly 0.0, so the sum's two payloads are the
    // only inexact terms and addition of two doubles is commutative.
    def covers(rank: Column) = col("cum") - col("cnt") <= rank && rank < col("cum")
    val qAggs = quantiles.map { case (name, q) =>
      val r = (col("n") - 1).cast("double") * lit(q)
      val lo = floor(r)
      val hi = ceil(r)
      val wLo = when(lo === hi, lit(1.0)).otherwise(hi - r)
      val wHi = when(lo === hi, lit(0.0)).otherwise(r - lo)
      val contrib =
        coalesce(when(covers(lo), col("v") * wLo), lit(0.0)) +
          coalesce(when(covers(hi), col("v") * wHi), lit(0.0))
      round(sum(contrib), 4).as(name)
    }
    // empty/all-null input: zero counted rows → max(n) is NULL where the
    // oracle's count(value) is 0; quantiles stay NULL on both engines
    val aggs =
      coalesce(max(col("n")), lit(0L)).as("n") +:
        count(lit(1)).as("n_distinct") +: qAggs
    ranked.agg(aggs.head, aggs.tail: _*)
  }

  /** PER-GROUP exact interpolated quantiles — [[quantileProfile]]
    * partitioned by a group column (the per-source length-distribution
    * report behind sequence-budget and truncation decisions: "is this
    * crawl slice short-doc heavy?"). Same counting formulation and the
    * same DuckDB-bit-identical weighted-sum interpolation; the cum/total
    * windows partition by GROUP, so no global single-partition stage
    * exists at all — each group's ranked value domain sorts
    * independently (bounded by ITS distinct values), and groups spread
    * across the cluster. Precondition as before: |domain| ≪ |rows|
    * per group (lengths, scores, counts — not raw ids). */
  def groupedQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                       quantiles: Seq[(String, Double)] =
                         Seq("p25" -> 0.25, "p50" -> 0.5,
                             "p75" -> 0.75, "p90" -> 0.9)): DataFrame = {
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("g"), col(valueCol).cast("double").as("v"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("g"))
    val ranked = counts
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
    def covers(rank: Column) = col("cum") - col("cnt") <= rank && rank < col("cum")
    val qAggs = quantiles.map { case (name, q) =>
      val r = (col("n") - 1).cast("double") * lit(q)
      val lo = floor(r)
      val hi = ceil(r)
      val wLo = when(lo === hi, lit(1.0)).otherwise(hi - r)
      val wHi = when(lo === hi, lit(0.0)).otherwise(r - lo)
      val contrib =
        coalesce(when(covers(lo), col("v") * wLo), lit(0.0)) +
          coalesce(when(covers(hi), col("v") * wHi), lit(0.0))
      round(sum(contrib), 4).as(name)
    }
    val aggs = max(col("n")).as("n") +: count(lit(1)).as("n_distinct") +: qAggs
    ranked.groupBy(col("g").as(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Sketch-based profile: HyperLogLog distinct estimate and
    * approximate p50/p95/p99 — the constant-memory versions of the
    * exact statistics, for when even one exact count-distinct per
    * column is too much state. Scalar columns only (the driver's
    * row-compare sorts on every column; an array column is unsortable
    * there). Checked by accuracy bounds in ProfilingSpec, not the hash
    * oracle: sketch internals are engine-specific by design. */
  def sketchProfile(df: DataFrame, numericCol: String, keyCol: String): DataFrame =
    df.agg(
      approx_count_distinct(col(keyCol)).as("approx_distinct"),
      expr(s"round(approx_percentile($numericCol, 0.5, 10000), 4)").as("p50"),
      expr(s"round(approx_percentile($numericCol, 0.95, 10000), 4)").as("p95"),
      expr(s"round(approx_percentile($numericCol, 0.99, 10000), 4)").as("p99"),
      count(lit(1)).as("n"))

  /** X6 engine-portable HyperLogLog distinct-users-per-day — the
    * sketch the EXACT `countDistinct` cannot be at 100 TB: per-day
    * state is 64 small integers (registers), mergeable across
    * partitions/days/clusters, vs a distinct-user shuffle whose state
    * is the user set itself. Unlike `approx_count_distinct` (whose
    * sketch is engine-internal), every step here is reproducible
    * arithmetic both engines run identically, so the ESTIMATE is
    * oracle-checkable:
    *
    *  - 31-bit md5-derived hash (the house scheme, [[Dedup]]):
    *    6 bucket bits (m = 64 registers) + a 25-bit register word.
    *  - rho = leading-zero rank via `length(bin(w))` — integer string
    *    ops, no float log2 anywhere near a boundary.
    *  - Σ 2^−M_j folded as INTEGER Z = Σ 2^(26−M_j) (absent registers
    *    contribute 2^26), so the harmonic sum is exact int64 and
    *    fold-order-free; the only floats are the final α·m²·2^26 / Z
    *    and the standard linear-counting branch m·ln(m/V) for small
    *    ranges — identical operand order in both engines, `round(_,4)`.
    *
    * 100 TB plan: one shuffle of (day, register) partial maxes
    * (map-side combine collapses each partition to ≤ 64·days rows),
    * then O(days·64) everything. The register grid cross join is
    * O(days)×64 — constant-side broadcast.
    *
    * `withExact = false` is the 100 TB form: it drops the
    * `countDistinct` audit branch (whose shuffle state is the user set
    * itself — the thing the sketch exists to avoid) and with it the
    * `n_exact`/`rel_err` columns; the estimate arithmetic is shared,
    * so it is bit-identical either way (ProfilingSpec pins this). The
    * audit form stays the default and is what the oracle checks. */
  def hllUsers(events: DataFrame, withExact: Boolean = true): DataFrame = {
    val base = hllBase(events)
    val grid = base.select(col("day")).distinct()
      .crossJoin(events.sparkSession.range(64).toDF("j"))
      .join(hllRegisters(events), Seq("day", "j"), "left")
      .select(col("day"), coalesce(col("reg"), lit(0)).as("reg"))
    val sums = grid.groupBy(col("day")).agg(
      sum(expr("shiftleft(CAST(1 AS BIGINT), 26 - reg)")).as("z"),
      sum(when(col("reg") === 0, 1L).otherwise(0L)).as("v_empty"))
    val raw = lit(0.709) * lit(64.0) * lit(64.0) * lit(67108864.0) /
      col("z").cast("double")
    val est = when(col("v_empty") > 0 && raw <= lit(160.0),
      lit(64.0) * log(lit(64.0) / col("v_empty").cast("double"))).otherwise(raw)
    if (!withExact)
      sums.select(col("day"), col("v_empty"), round(est, 4).as("hll_users"))
    else {
      val exact = base.groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
      sums.join(exact, Seq("day"))
        .select(col("day"), col("n_exact"), col("v_empty"),
          round(est, 4).as("hll_users"),
          round((est - col("n_exact").cast("double")) /
            col("n_exact").cast("double"), 6).as("rel_err"))
    }
  }

  /** (day, user_id, h) base frame of the HLL/KMV family — the house
    * 31-bit md5-derived user hash (identical CTE `h` in the oracles). */
  private def hllBase(events: DataFrame): DataFrame = events.select(
    expr("unix_micros(ts) div 86400000000").as("day"),
    col("user_id"),
    (conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
      .cast("long") % lit(2147483647L)).as("h"))

  /** The per-day HLL register table `(day, j, reg)` — the STORED
    * sketch artifact of the family: what a nightly job persists so
    * every later rollup ([[hllGlobalFromRegisters]], month-over-month
    * windows, cross-cluster merges) folds sketch rows instead of
    * re-reading raw events. Sparse: a (day, j) absent here means
    * register 0 (consumers re-densify against the 64-register grid).
    * O(days·64) rows regardless of corpus size. */
  def hllRegisters(events: DataFrame): DataFrame =
    hllBase(events)
      .select(col("day"), col("h").bitwiseAND(lit(63L)).as("j"),
        when(shiftright(col("h"), 6) === 0, lit(26))
          .otherwise(lit(26) - length(bin(shiftright(col("h"), 6)))).as("rho"))
      .groupBy(col("day"), col("j")).agg(max(col("rho")).as("reg"))

  /** X6 ROLLING 7-DAY ACTIVES FROM SKETCHES — the sketch-algebra
    * answer to [[graft.operators.Windows.rollingActive]]: each stored
    * day sketch fans out map-side to the `window` report days it
    * contributes to and the window's registers MAX-fold per report
    * day — the rolling-distinct curve over a 100 TB event log from
    * O(days·64·window) sketch rows, no raw re-read, no re-count
    * (this is exactly why HLL registers are the persisted artifact:
    * rolling windows, month rollups, and cross-shard merges are all
    * the same MAX-fold). Estimate arithmetic identical to
    * [[hllUsers]]; report days are the OBSERVED days (leading
    * partial windows by construction, like the exact operator). */
  def rollingActiveFromRegisters(stored: DataFrame, window: Int = 7): DataFrame = {
    val spark = stored.sparkSession
    val observed = stored.select(col("day")).distinct()
    val fanned = stored
      .select(explode(sequence(col("day"), col("day") + (window - 1))).as("day"),
        col("j"), col("reg"))
      .groupBy(col("day"), col("j")).agg(max(col("reg")).as("reg"))
    val grid = observed
      .crossJoin(broadcast(spark.range(64).toDF("j")))
      .join(fanned, Seq("day", "j"), "left")
      .select(col("day"), coalesce(col("reg"), lit(0)).as("reg"))
    val sums = grid.groupBy(col("day")).agg(
      sum(expr("shiftleft(CAST(1 AS BIGINT), 26 - reg)")).as("z"),
      sum(when(col("reg") === 0, 1L).otherwise(0L)).as("v_empty"))
    val raw = lit(0.709) * lit(64.0) * lit(64.0) * lit(67108864.0) /
      col("z").cast("double")
    val est = when(col("v_empty") > 0 && raw <= lit(160.0),
      lit(64.0) * log(lit(64.0) / col("v_empty").cast("double"))).otherwise(raw)
    sums.select(col("day"), col("v_empty"), round(est, 4).as("hll_active"))
  }

  /** [[rollingActiveFromRegisters]] with the register table built
    * inline — the self-contained form the oracle hash-checks;
    * production folds the STORED [[hllRegisters]] artifact. */
  def rollingActiveHll(events: DataFrame, window: Int = 7): DataFrame =
    rollingActiveFromRegisters(hllRegisters(events), window)

  /** The SERVE path of the mergeable-sketch story: global distinct
    * users estimated purely by MAX-folding a STORED `(day, j, reg)`
    * register table ([[hllRegisters]]'s output read back from
    * storage) — the scoring plan never touches raw events, which is
    * the entire point of persisting sketches: a month-over-month (or
    * 1000-executor cross-shard) rollup costs O(stored sketch rows),
    * not a raw re-read. Estimate arithmetic identical to
    * [[hllUsersGlobal]]; output is the estimate columns only — the
    * exact-audit columns are precisely what a raw-free plan cannot
    * and should not produce. */
  def hllGlobalFromRegisters(stored: DataFrame): DataFrame = {
    val merged = stored.groupBy(col("j")).agg(max(col("reg")).as("reg"))
    val grid = stored.sparkSession.range(64).toDF("j")
      .join(merged, Seq("j"), "left")
      .select(coalesce(col("reg"), lit(0)).as("reg"))
    val sums = grid.agg(
      sum(expr("shiftleft(CAST(1 AS BIGINT), 26 - reg)")).as("z"),
      sum(when(col("reg") === 0, 1L).otherwise(0L)).as("v_empty"))
    val raw = lit(0.709) * lit(64.0) * lit(64.0) * lit(67108864.0) /
      col("z").cast("double")
    val est = when(col("v_empty") > 0 && raw <= lit(160.0),
      lit(64.0) * log(lit(64.0) / col("v_empty").cast("double"))).otherwise(raw)
    sums.select(col("v_empty"), round(est, 4).as("hll_users"))
  }

  /** The MERGE property of [[hllUsers]], inside the hard oracle gate:
    * global distinct users estimated by MAX-folding the per-day
    * register tables into one sketch — the exact operation a
    * 1000-executor rollup (or a month-over-month re-aggregation of
    * stored per-day sketches) runs, without ever touching the raw
    * rows again. Estimate arithmetic identical to [[hllUsers]]. */
  def hllUsersGlobal(events: DataFrame): DataFrame = {
    val base = hllBase(events)
    val merged = hllRegisters(events)
      .groupBy(col("j")).agg(max(col("reg")).as("reg"))
    val grid = events.sparkSession.range(64).toDF("j")
      .join(merged, Seq("j"), "left")
      .select(coalesce(col("reg"), lit(0)).as("reg"))
    val sums = grid.agg(
      sum(expr("shiftleft(CAST(1 AS BIGINT), 26 - reg)")).as("z"),
      sum(when(col("reg") === 0, 1L).otherwise(0L)).as("v_empty"))
    val exact = base.agg(countDistinct(col("user_id")).as("n_exact"))
    val raw = lit(0.709) * lit(64.0) * lit(64.0) * lit(67108864.0) /
      col("z").cast("double")
    val est = when(col("v_empty") > 0 && raw <= lit(160.0),
      lit(64.0) * log(lit(64.0) / col("v_empty").cast("double"))).otherwise(raw)
    sums.crossJoin(exact)
      .select(col("n_exact"), col("v_empty"),
        round(est, 4).as("hll_users"),
        // empty corpus: the grand aggregate still emits its one row
        // (0 exact, all registers 0 → estimate 0) — ANSI division
        // throws on the 0/0 rel_err, so pin it to 0 explicitly
        round(when(col("n_exact") === 0, lit(0.0))
          .otherwise((est - col("n_exact").cast("double")) /
            col("n_exact").cast("double")), 6).as("rel_err"))
  }

  /** The per-day KMV signature `(day, h)` — the k smallest DISTINCT
    * user hashes of each day, the stored/mergeable sketch behind
    * [[audienceOverlap]] and the streaming
    * `StreamPipeline.audienceKmvStream` (which maintains exactly this
    * set as its bounded state; StreamingSpec pins stream ≡ batch).
    * k·days rows total. The window runs over the per-day DISTINCT
    * hash set, never raw events; swap in the TopKByScore heap
    * aggregate when a day holds billions of distinct users. */
  def kmvSignatures(events: DataFrame, k: Int = 32): DataFrame = {
    val hashed = hllBase(events).select(col("day"), col("h")).distinct()
    val w = Window.partitionBy(col("day")).orderBy(col("h"))
    hashed.withColumn("r", row_number().over(w))
      .filter(col("r") <= k).select(col("day"), col("h"))
  }

  /** X6 audience-overlap matrix via K-MINIMUM-VALUES sketches — the
    * set-INTERSECTION estimate HLL cannot give: for every day pair,
    * estimated user-set Jaccard from the k smallest user-hash values
    * (est = |kmin(A∪B) ∩ A ∩ B| / k, the classic KMV coincidence
    * estimator), audited against the exact Jaccard. Everything up to
    * the final division is integer/set arithmetic on the house md5
    * hash, so the sketch — like [[hllUsers]] — is engine-reproducible
    * and sits in the hash gate.
    *
    * 100 TB: signatures are k values per day, so the pairwise stage
    * touches O(days²·k) rows regardless of corpus size — THE point of
    * KMV (the exact side, quadratic in per-day audiences, is the
    * audit you run at test scale; its join is equi-keyed on user_id).
    * The day-pair frame is O(days²) bounded metadata; per-day k-min
    * selection is one window over the DISTINCT per-day hash set (swap
    * in the TopKByScore heap aggregate when days hold billions of
    * distinct users). */
  def audienceOverlap(events: DataFrame, k: Int = 32): DataFrame = {
    val du = events.select(
      expr("unix_micros(ts) div 86400000000").as("day"), col("user_id"))
      .distinct()
    val est = audienceOverlapFromSignatures(kmvSignatures(events, k), k)
    val nd = du.groupBy(col("day")).agg(count(lit(1)).as("n"))
    val inter = du.as("x").join(du.as("y"),
        col("x.user_id") === col("y.user_id") && col("x.day") < col("y.day"))
      .groupBy(col("x.day").as("day_a"), col("y.day").as("day_b"))
      .agg(count(lit(1)).as("inter"))
    est
      .join(nd.select(col("day").as("day_a"), col("n").as("na")), Seq("day_a"))
      .join(nd.select(col("day").as("day_b"), col("n").as("nb")), Seq("day_b"))
      .join(inter, Seq("day_a", "day_b"), "left")
      .select(col("day_a"), col("day_b"), col("est_jaccard"),
        round(coalesce(col("inter"), lit(0L)).cast("double") /
          (col("na") + col("nb") - coalesce(col("inter"), lit(0L))).cast("double"), 6)
          .as("exact_jaccard"))
  }

  /** The KMV SERVE path — pairwise audience-Jaccard estimates computed
    * purely from a STORED `(day, h)` signature table
    * ([[kmvSignatures]]' output, or the final state
    * `StreamPipeline.audienceKmvStream` emits) — the
    * [[hllGlobalFromRegisters]] discipline for the intersection
    * sketch: the scoring plan folds O(days²·k) stored sketch rows and
    * never touches raw events, so a quarter's day-pair matrix over a
    * 100 TB event log reads k·days values. Estimator identical to the
    * audited [[audienceOverlap]] (kmin_k of the pairwise union, then
    * the coincidence count / k); output is the estimate column only —
    * the exact audit needs the raw rows by definition. */
  def audienceOverlapFromSignatures(sig: DataFrame, k: Int = 32): DataFrame = {
    val days = sig.select(col("day")).distinct()
    val dp = days.select(col("day").as("da")).join(
      days.select(col("day").as("db")), col("da") < col("db"))
    val u = dp.join(sig.withColumnRenamed("day", "da"), Seq("da"))
      .select(col("da"), col("db"), col("h"))
      .unionByName(dp.join(sig.withColumnRenamed("day", "db"), Seq("db"))
        .select(col("da"), col("db"), col("h")))
      .distinct()
    val wp = Window.partitionBy(col("da"), col("db")).orderBy(col("h"))
    val rk = u.withColumn("r", row_number().over(wp))
      .filter(col("r") <= k).select(col("da"), col("db"), col("h"))
    rk
      .join(sig.select(col("day").as("da"), col("h"), lit(1).as("ina")),
        Seq("da", "h"), "left")
      .join(sig.select(col("day").as("db"), col("h"), lit(1).as("inb")),
        Seq("db", "h"), "left")
      .groupBy(col("da"), col("db"))
      .agg(sum(when(col("ina") === 1 && col("inb") === 1, 1L).otherwise(0L))
        .as("nboth"))
      .select(col("da").as("day_a"), col("db").as("day_b"),
        round(col("nboth").cast("double") / lit(k.toDouble), 6).as("est_jaccard"))
  }

  /** Behavioral bot audit over the event stream: per user, the volume
    * (events, active days, events/day) and DIVERSITY (event-type
    * entropy) signals a traffic-quality gate runs before events feed a
    * training corpus — scripted traffic is high-rate and low-entropy,
    * organic traffic is neither. Entropy uses the house exact-integer
    * micro-nat decomposition (`H = (ln(n)·n − Σk·ln(k)) / n`, each log
    * quantized half-up at 1e-6): group sums are exact int64, so the
    * score is fold-order-free and engine-identical. The flag compares
    * the ROUNDED rate and entropy — the same doubles the oracle
    * compares — so the boundary user lands identically on both
    * engines.
    *
    * 100 TB: two shuffles on user_id ((user,type) counts re-keyed to
    * user, distinct-day count), both with map-side partial
    * aggregation; output is O(users). The thresholds are calibrated
    * for the synthetic corpus (epd 1.9–3.1, entropy 1.50–1.61 nats);
    * production gates would feed measured quantiles instead. */
  def botScore(events: DataFrame, minEventsPerDay: Double = 2.5,
               maxEntropy: Double = 1.58): DataFrame = {
    val e = events.select(col("user_id"), col("event_type"),
      expr("unix_micros(ts) div 86400000000").as("day"))
    val days = e.groupBy(col("user_id"))
      .agg(countDistinct(col("day")).as("n_days"))
    val scored = e.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("k"))
      .select(col("user_id"), col("k"),
        (col("k") *
          floor(log(col("k").cast("double")) * 1e6 + 0.5).cast("long")).as("kl6"))
      .groupBy(col("user_id"))
      .agg(sum(col("k")).as("n_events"), count(lit(1)).as("n_types"),
        sum(col("kl6")).as("s"))
      .select(col("user_id"), col("n_events"), col("n_types"),
        round((floor(log(col("n_events").cast("double")) * 1e6 + 0.5).cast("long") *
          col("n_events") - col("s")).cast("double") /
          (col("n_events").cast("double") * lit(1e6)), 6).as("type_entropy"))
    scored.join(days, Seq("user_id"))
      .select(col("user_id"), col("n_events"), col("n_days"), col("n_types"),
        round(col("n_events").cast("double") / col("n_days").cast("double"), 4)
          .as("events_per_day"),
        col("type_entropy"))
      .withColumn("bot_flag",
        col("events_per_day") > minEventsPerDay &&
          col("type_entropy") < maxEntropy)
  }

  /** One of the CMS depth hashes: bucket of `tok` in table `tbl` —
    * the house md5 60-bit hash over a salted key (`"tbl:token"`), mod
    * the sketch width. Identical text arithmetic in the oracles. */
  private def cmsBucket(tok: Column, tbl: Int, width: Int): Column =
    conv(substring(md5(concat(lit(s"$tbl:"), tok)), 1, 15), 16, 10)
      .cast("long") % width

  /** The (token → corpus count) aggregate the CMS family folds into
    * buckets — aggregating BEFORE hashing is what makes the sketch
    * build a vocabulary-sized job: the raw token stream collapses with
    * map-side combine, then only distinct tokens hash. */
  private def cmsCounts(documents: DataFrame): DataFrame =
    documents.select(explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("c"))

  private[graft] def cmsProbes(keys: DataFrame, depth: Int, width: Int): DataFrame =
    keys.select(col("*"), posexplode(array((0 until depth).map(tt =>
        cmsBucket(col("token"), tt, width)): _*)).as(Seq("tbl", "bucket")))
      .withColumn("tbl", col("tbl").cast("long"))

  /** X6 COUNT-MIN SKETCH export — the frequency twin of the HLL
    * register table: a `depth`×`width` counter grid (sparse rows —
    * absent (tbl, bucket) means 0) summarizing the corpus token
    * frequency distribution in O(depth·width) rows regardless of
    * corpus size. Point estimate = min over the `depth` salted-hash
    * buckets; never an underestimate, overestimate bounded by
    * collision mass (≈ 2·N/width at 1−(1/2)^depth confidence — the
    * Cormode-Muthukrishnan bound). Counters are PLAIN SUMS, so sketch
    * rows from shards/days merge by addition — the same
    * persist-the-sketch discipline as [[hllRegisters]]: nightly jobs
    * store this table and every later heavy-hitter probe, cross-shard
    * fold, or serve-time lookup reads it instead of the corpus.
    * Build: one corpus scan (map-side-combined vocab count), then a
    * `depth`-way posexplode of the VOCABULARY only. */
  def cmsSketch(documents: DataFrame, depth: Int = 4,
                width: Int = 512): DataFrame =
    cmsProbes(cmsCounts(documents), depth, width)
      .groupBy(col("tbl"), col("bucket")).agg(sum(col("c")).as("c"))

  /** X6 CMS heavy-hitter audit: the exact top-`k` tokens (count desc,
    * token tie-break) probed through the sketch — per token the exact
    * count, the CMS estimate, and the overestimate (`est − exact`,
    * provably ≥ 0; a large value means the width is undersized for
    * the corpus). The global rank window is over the VOCABULARY
    * aggregate (bounded domain, the [[quantileProfile]] precondition),
    * never raw tokens. */
  def cmsTopK(documents: DataFrame, k: Int = 20, depth: Int = 4,
              width: Int = 512): DataFrame = {
    val cnt = cmsCounts(documents)
    val top = cnt
      .withColumn("rk",
        row_number().over(Window.orderBy(col("c").desc, col("token"))))
      .filter(col("rk") <= k)
      .select(col("token"), col("c").as("exact"), col("rk"))
    cmsProbes(top, depth, width)
      .join(cmsSketch(documents, depth, width), Seq("tbl", "bucket"))
      .groupBy(col("token"), col("exact"), col("rk"))
      .agg(min(col("c")).as("est"))
      .select(col("token"), col("rk").cast("integer").as("rank"),
        col("exact"), col("est"), (col("est") - col("exact")).as("overest"))
  }

  /** Serve half of the CMS family: point-estimate a batch of keys
    * against a STORED [[cmsSketch]] table — no corpus access; each key
    * hashes to its `depth` buckets, left-joins the sparse counter rows
    * (absent bucket = 0), and takes the min. O(batch·depth) probe
    * rows against an O(depth·width) broadcast-able table. */
  def cmsEstimateAgainst(keys: DataFrame, sketch: DataFrame,
                         depth: Int = 4, width: Int = 512): DataFrame =
    cmsProbes(keys, depth, width)
      .join(sketch, Seq("tbl", "bucket"), "left")
      .groupBy(col("token"))
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))

  /** Fold shard [[cmsSketch]] tables into the corpus sketch — plain
    * counter ADDITION, the property that makes CMS the persisted
    * artifact (`x6_cms_merge` pins merged ≡ whole-corpus by aliased
    * oracle; nightly shards/days/clusters fold the same way). */
  def cmsMerge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ union _)
      .groupBy(col("tbl"), col("bucket")).agg(sum(col("c")).as("c"))

  /** The deterministic serve batch `x6_cms_serve` estimates: the
    * distinct tokens of a doc-id hash sample of the corpus. */
  def cmsServeBatch(documents: DataFrame, samplePct: Int = 7): DataFrame =
    documents.filter(
      conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long") % 100 < samplePct)
      .select(explode(split(col("text"), " ")).as("token")).distinct()

  /** X6 FIXED-WIDTH HISTOGRAM SKETCH — the quantile member of the
    * mergeable-sketch family (HLL = distinct, CMS = frequency, KMV =
    * overlap, Bloom = membership, this = distribution): per event
    * type, `floor(value/width)` bucket counts. O(types · range/width)
    * rows regardless of event volume, counters are PLAIN SUMS so
    * shard/day sketches fold by addition (`x6_hist_merge` pins merged
    * ≡ whole-corpus by aliased oracle), and any quantile is later
    * answered from the stored rows without re-scanning events. Rank
    * error is bounded by the bucket mass — width trades accuracy for
    * sketch size, the same knob as CMS width. Build: one map-side-
    * combined aggregation, no window, no sort. */
  def histSketch(events: DataFrame, width: Double = 5.0): DataFrame =
    events
      .select(col("event_type"),
        floor(col("value") / lit(width)).cast("long").as("bucket"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Fold shard [[histSketch]] tables into the corpus sketch —
    * counter addition, the CMS merge law on the quantile sketch. */
  def histMerge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ union _)
      .groupBy(col("event_type"), col("bucket")).agg(sum(col("c")).as("c"))

  /** X6 sketch-served quantiles: p50/p90/p99 per event type from a
    * [[histSketch]] table — estimate = upper edge of the first bucket
    * whose cumulative count reaches `⌈p·n⌉` (a conservative ≤-width
    * overestimate of the true quantile). The cumulative window runs
    * over the AGGREGATED bucket rows (bounded domain, the house
    * no-window-over-raw rule); thresholds are exact integers
    * (`ceil(p·n)` with n ≪ 2⁵³), estimates are exact multiples of
    * `width` — nothing here can drift cross-engine. Duplicate bucket
    * rows (a raw shard UNION that skipped [[histMerge]]) are read
    * CORRECTLY: the ordered window's default RANGE frame includes
    * bucket-tied peers, so tied rows share one cumulative value and
    * the counters sum-merge implicitly (spec-pinned) — the serve read
    * is safe on un-merged shard tables, unlike a strict-keyed join. */
  def histQuantilesFrom(sketch: DataFrame, width: Double = 5.0): DataFrame =
    histQuantilesKeyed(sketch, Seq("event_type"), width)

  /** The quantile read shared by every grain: cumulative bucket mass
    * per key group, `⌈p·n⌉` threshold, upper-edge estimate. */
  private def histQuantilesKeyed(sketch: DataFrame, keys: Seq[String],
                                 width: Double): DataFrame = {
    val part = Window.partitionBy(keys.map(col): _*)
    val cum = sketch
      .withColumn("cum", sum(col("c")).over(part.orderBy(col("bucket"))))
      .withColumn("n", sum(col("c")).over(part))
    def est(p: Double): Column =
      round((min(when(col("cum") >=
        ceil(lit(p) * col("n")).cast("long"), col("bucket"))) + 1L) *
        lit(width), 2)
    cum.groupBy(keys.map(col): _*)
      .agg(max(col("n")).as("n"), est(0.5).as("p50_est"),
        est(0.9).as("p90_est"), est(0.99).as("p99_est"))
  }

  /** X6 time-bucketed histogram sketch: [[histSketch]] at (type, day)
    * grain — the nightly artifact the rolling read merges. Day =
    * `unix_micros(ts) div 86400000000`, the x6_trend convention. */
  def histDaily(events: DataFrame, width: Double = 5.0): DataFrame =
    events
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        floor(col("value") / lit(width)).cast("long").as("bucket"))
      .groupBy(col("event_type"), col("day"), col("bucket"))
      .agg(count(lit(1)).as("c"))

  /** X6 per-day quantiles from the daily sketches — the distribution
    * drift monitor (is p99 latency/value creeping day over day?). */
  def histDailyQuantiles(events: DataFrame, width: Double = 5.0): DataFrame =
    histQuantilesKeyed(histDaily(events, width), Seq("event_type", "day"), width)

  /** X6 ROLLING-window quantiles — p50/p90/p99 over the trailing
    * `windowDays` days per (type, day), answered by SUM-MERGING the
    * stored daily sketches (the mergeable-sketch payoff: a rolling
    * quantile with NO event re-scan — the `x6_rolling_hll` fan
    * pattern applied to counters). Each day's O(range/width) bucket
    * rows fan to the `windowDays` window ends they serve, counters
    * add, and the keyed quantile read runs on the merged grid;
    * restricting to OBSERVED days drops the fan's overhang past the
    * corpus end. Work scales with days·buckets, never events. */
  def histRolling(events: DataFrame, width: Double = 5.0,
                  windowDays: Int = 7): DataFrame =
    histRollingFromDaily(histDaily(events, width), width, windowDays)

  /** [[histRolling]] answered from a STORED daily-sketch table — the
    * serve form a resident pipeline uses: the streaming aggregation
    * ([[graft.streaming.StreamPipeline.histDailyStream]]) maintains
    * the (type, day, bucket) counters and this read merges them, so
    * rolling quantiles never touch raw events (spec pins sink-served
    * ≡ batch). */
  def histRollingFromDaily(dsk: DataFrame, width: Double = 5.0,
                           windowDays: Int = 7): DataFrame = {
    val fan = dsk
      .select(col("event_type"), col("day"), col("bucket"), col("c"),
        explode(array((0 until windowDays).map(o => lit(o.toLong)): _*)).as("o"))
      .select(col("event_type"), (col("day") + col("o")).as("day"),
        col("bucket"), col("c"))
    val merged = fan.groupBy(col("event_type"), col("day"), col("bucket"))
      .agg(sum(col("c")).as("c"))
    val observed = dsk.select(col("event_type"), col("day")).distinct()
    histQuantilesKeyed(merged.join(observed, Seq("event_type", "day")),
      Seq("event_type", "day"), width)
  }

  /** X6 self-contained histogram quantiles: sketch built inline. The
    * serve form (`x6_hist_serve`) answers from the STORED sketch and
    * is pinned ≡ this by aliased oracle. */
  def histQuantiles(events: DataFrame, width: Double = 5.0): DataFrame =
    histQuantilesFrom(histSketch(events, width), width)

  /** X6 sketch ACCURACY audit — the measure-don't-guess gate for the
    * histogram sketch (the `x2_sq_recall` discipline applied to
    * quantiles): exact order-statistic p50/p90/p99 per event type next
    * to the sketch estimates, with per-quantile error and the bound
    * check `0 ≤ err ≤ width` (upper-edge estimates can never
    * undershoot, and can never overshoot by more than one bucket).
    * Exactness discipline: values quantize to centi-units first
    * (`floor(100v + 0.5)`, the house half-up rule) so the exact side
    * aggregates a BOUNDED integer domain — the cumulative window runs
    * over O(distinct cents) aggregated rows per type, never raw
    * events — and the same `⌈p·n⌉` threshold convention as the sketch
    * side makes the two quantile definitions comparable. */
  def histAccuracy(events: DataFrame, width: Double = 5.0): DataFrame = {
    val g = events
      .select(col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("q"))
      .groupBy(col("event_type"), col("q")).agg(count(lit(1)).as("c"))
    val cu = g
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy(col("event_type")).orderBy(col("q"))))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("event_type"))))
    def exact(p: Double): Column =
      round(min(when(col("cum") >=
        ceil(lit(p) * col("n").cast("double")).cast("long"), col("q")))
        .cast("double") / 100.0, 2)
    val ex = cu.groupBy(col("event_type"))
      .agg(max(col("n")).as("n"), exact(0.5).as("p50_exact"),
        exact(0.9).as("p90_exact"), exact(0.99).as("p99_exact"))
    def err(tag: String): Column =
      round(col(s"${tag}_est") - col(s"${tag}_exact"), 2).as(s"${tag}_err")
    val est = histQuantiles(events, width)
      .select(col("event_type"), col("p50_est"), col("p90_est"), col("p99_est"))
    ex.join(est, "event_type")
      .select(col("event_type"), col("n"),
        col("p50_exact"), col("p50_est"), err("p50"),
        col("p90_exact"), col("p90_est"), err("p90"),
        col("p99_exact"), col("p99_est"), err("p99"))
      .withColumn("within_width",
        when(col("p50_err") >= 0 && col("p50_err") <= width &&
             col("p90_err") >= 0 && col("p90_err") <= width &&
             col("p99_err") >= 0 && col("p99_err") <= width, 1L).otherwise(0L))
  }

  /** The DYADIC log-width bucket: 0 for gap ≤ 0, else
    * `1 + 4·octave + sub` where octave = bitlen(gap) − 1 =
    * ⌊log₂ gap⌋ and sub = the 2 bits below the MSB
    * (`(gap·4) div 2^octave − 4`) — 4 sub-buckets per power of two,
    * i.e. `⌊log₂(gap)·4⌋`-style resolution with ≤25% relative bucket
    * width at every magnitude. All INTEGER bit arithmetic
    * (`length(bin(…))` + shifts, the HLL/gap-histogram string-op that
    * is identical in both engines) — never libm `log2`, whose last
    * ulp differs across engines and would flip `floor` at bucket
    * boundaries. */
  private val logBucket =
    """CASE WHEN gap_s <= 0 THEN CAST(0 AS BIGINT)
       ELSE CAST(1 + (length(bin(gap_s)) - 1) * 4
         + ((gap_s * 4) div shiftleft(CAST(1 AS BIGINT), length(bin(gap_s)) - 1)
            - 4) AS BIGINT) END"""

  /** Upper edge of a dyadic bucket: 0 for bucket 0, else
    * `2^octave · (sub + 5) / 4` — an exact dyadic rational (integer
    * product then one divide-by-4), so estimates are exactly
    * representable and `round(_, 2)` is drift-free. */
  private val logEdge =
    """CASE WHEN bucket = 0 THEN CAST(0 AS DOUBLE)
       ELSE CAST(shiftleft(CAST(1 AS BIGINT), CAST((bucket - 1) div 4 AS INT))
         * ((bucket - 1) % 4 + 5) AS DOUBLE) / 4.0 END"""

  /** X6 LOG-WIDTH (dyadic) HISTOGRAM SKETCH — the heavy-tail member
    * of the histogram family: same-user inter-event gaps (seconds,
    * [[graft.operators.Windows.gapSeconds]] — the domain
    * `x6_gap_hist` showed is octave-spread) bucketed at 4 buckets per
    * POWER OF TWO instead of [[histSketch]]'s fixed width 5, so one
    * O(4·log₂ range) ≈ 100-row sketch covers seconds-to-months gap
    * scales with ≤25% relative error everywhere — fixed width 5
    * either loses the sub-minute structure or needs millions of rows
    * for the month tail. Same mergeable contract: plain-sum counters,
    * shard sketches fold by addition, quantiles served from stored
    * rows. Build: one user-keyed lag window (the gap stream) + one
    * map-side-combined aggregation. */
  def histLogSketch(events: DataFrame): DataFrame =
    Windows.gapSeconds(events)
      .select(expr(logBucket).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_gaps"))
      .withColumn("hi_edge", round(expr(logEdge), 2))

  /** X6 SESSION-LENGTH PROFILE — whole-second session durations
    * ([[graft.operators.Windows.sessions]]'s end − start) through the
    * dyadic log sketch: a single-event session is 0 s, an engaged one
    * runs to hours — heavy-tailed, exactly the log-width domain. One
    * profile row (n sessions + p50/p90/p99 length) via the same
    * [[histLogQuantilesFrom]] read the gap family serves. */
  def sessionLengthProfile(events: DataFrame, gapMinutes: Int = 5): DataFrame =
    histLogQuantilesFrom(sessionLengthSketch(events, gapMinutes))

  /** The session-length dyadic sketch — mergeable counters over the
    * session frame's duration seconds. Shard sketches fold with
    * [[histLogMerge]] when sharded BY USER: sessions are per-user, so
    * a user cut never splits a session (the gap-stream merge law). */
  def sessionLengthSketch(events: DataFrame, gapMinutes: Int = 5): DataFrame =
    Windows.sessions(events, gapMinutes)
      .select(expr("(session_end_us - session_start_us) div 1000000").as("gap_s"))
      .select(expr(logBucket).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_gaps"))
      .withColumn("hi_edge", round(expr(logEdge), 2))

  /** Fold shard [[histLogSketch]] tables — counter addition by
    * bucket, the same merge law as every sketch in the family
    * (hi_edge is a pure function of bucket, so it rides the key). */
  def histLogMerge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ union _)
      .groupBy(col("bucket"), col("hi_edge"))
      .agg(sum(col("n_gaps")).as("n_gaps"))
      .select(col("bucket"), col("n_gaps"), col("hi_edge"))

  /** Sketch-served gap quantiles: p50/p90/p99 from a [[histLogSketch]]
    * table — estimate = UPPER EDGE of the first bucket whose
    * cumulative count reaches `⌈p·n⌉` (the [[histQuantilesFrom]]
    * convention on dyadic edges). The cumulative window runs over the
    * ≤ 4·log₂(range) aggregated bucket rows — bounded domain, the
    * house no-window-over-raw rule. Rank error is one dyadic bucket:
    * ≤ 25% of the estimate, at every magnitude. */
  def histLogQuantilesFrom(sketch: DataFrame): DataFrame = {
    val cum = sketch
      .withColumn("cum", sum(col("n_gaps")).over(
        Window.partitionBy(lit(1)).orderBy(col("bucket"))))
      .withColumn("n", sum(col("n_gaps")).over(Window.partitionBy(lit(1))))
    def est(p: Double): Column =
      round(min(when(col("cum") >=
        ceil(lit(p) * col("n").cast("double")).cast("long"),
        expr(logEdge))), 2)
    cum.groupBy(lit(1).as("grp"))
      .agg(max(col("n")).as("n"), est(0.5).as("p50_est"),
        est(0.9).as("p90_est"), est(0.99).as("p99_est"))
      .drop("grp")
  }

  /** X6 self-contained log-sketch quantiles; the serve form
    * (`x6_hist_log_serve`) answers from the STORED sketch, pinned ≡
    * this by aliased oracle. */
  def histLogQuantiles(events: DataFrame): DataFrame =
    histLogQuantilesFrom(histLogSketch(events))

  /** X6 time-bucketed log sketch: the dyadic gap counters at DAY
    * grain ([[histDaily]]'s discipline on the heavy-tail domain) —
    * the nightly artifact the rolling read merges. A gap belongs to
    * the day of its CLOSING event ([[Windows.gapSecondsByDay]]), so
    * the day cut never splits a gap. */
  def histLogDaily(events: DataFrame): DataFrame =
    Windows.gapSecondsByDay(events)
      .select(col("day"), expr(logBucket).as("bucket"))
      .groupBy(col("day"), col("bucket"))
      .agg(count(lit(1)).as("c"))

  /** The keyed dyadic quantile read shared by the daily and rolling
    * grains — cumulative bucket mass per key, `⌈p·n⌉` threshold,
    * dyadic upper-edge estimate (the [[histQuantilesKeyed]] shape on
    * log buckets). */
  private def histLogQuantilesKeyed(sketch: DataFrame,
                                    keys: Seq[String]): DataFrame = {
    val part = Window.partitionBy(keys.map(col): _*)
    val cum = sketch
      .withColumn("cum", sum(col("c")).over(part.orderBy(col("bucket"))))
      .withColumn("n", sum(col("c")).over(part))
    def est(p: Double): Column =
      round(min(when(col("cum") >=
        ceil(lit(p) * col("n").cast("double")).cast("long"),
        expr(logEdge))), 2)
    cum.groupBy(keys.map(col): _*)
      .agg(max(col("n")).as("n"), est(0.5).as("p50_est"),
        est(0.9).as("p90_est"), est(0.99).as("p99_est"))
  }

  /** X6 per-day gap quantiles from the daily log sketches — the
    * engagement-cadence drift monitor (is the p90 inter-event gap
    * stretching day over day?), [[histDailyQuantiles]]'s heavy-tail
    * twin. */
  def histLogDailyQuantiles(events: DataFrame): DataFrame =
    histLogQuantilesKeyed(histLogDaily(events), Seq("day"))

  /** [[histLogRolling]] answered from a STORED daily log-sketch
    * table — trailing-window gap quantiles with NO event re-scan
    * (each day's ≤ 4·log₂(range) counter rows fan to the window ends
    * they serve and add; observed-day join drops the overhang). */
  def histLogRollingFromDaily(dsk: DataFrame,
                              windowDays: Int = 7): DataFrame = {
    val fan = dsk
      .select(col("day"), col("bucket"), col("c"),
        explode(array((0 until windowDays).map(o => lit(o.toLong)): _*)).as("o"))
      .select((col("day") + col("o")).as("day"), col("bucket"), col("c"))
    val merged = fan.groupBy(col("day"), col("bucket"))
      .agg(sum(col("c")).as("c"))
    val observed = dsk.select(col("day")).distinct()
    histLogQuantilesKeyed(merged.join(observed, Seq("day")), Seq("day"))
  }

  /** X6 trailing-7-day gap quantiles by sum-merging the daily dyadic
    * sketches — [[histRolling]]'s heavy-tail twin. */
  def histLogRolling(events: DataFrame): DataFrame =
    histLogRollingFromDaily(histLogDaily(events))

  /** X6 log-sketch ACCURACY audit — [[histAccuracy]]'s
    * measure-don't-guess gate adapted to PER-BUCKET width: exact
    * order-statistic gap quantiles (gaps are already integers — the
    * cumulative window runs over aggregated per-value rows) next to
    * the dyadic estimates; the bound check is
    * `0 ≤ err ≤ width(bucket(exact))` where width = 2^octave/4 — the
    * bucket the exact quantile lands in is by construction the bucket
    * the estimate reads its edge from, so the error can never exceed
    * that ONE bucket's own width (≤ 25% relative), not a global
    * constant. */
  def histLogAccuracy(events: DataFrame): DataFrame = {
    val g = Windows.gapSeconds(events)
      .groupBy(col("gap_s")).agg(count(lit(1)).as("c"))
    val cu = g
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy(lit(1)).orderBy(col("gap_s"))))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(lit(1))))
    def exact(p: Double): Column =
      min(when(col("cum") >=
        ceil(lit(p) * col("n").cast("double")).cast("long"), col("gap_s")))
    val ex = cu.groupBy(lit(1).as("grp"))
      .agg(max(col("n")).as("n"), exact(0.5).as("p50_exact"),
        exact(0.9).as("p90_exact"), exact(0.99).as("p99_exact"))
      .drop("grp")
    val est = histLogQuantiles(events)
      .select(col("p50_est"), col("p90_est"), col("p99_est"))
    // per-quantile bound: width of the dyadic bucket the exact gap
    // falls in = 2^octave / 4 (octaves from the same bin() bit-length)
    def width(tag: String): String =
      s"CASE WHEN ${tag}_exact <= 0 THEN CAST(0 AS DOUBLE) " +
        s"ELSE CAST(shiftleft(CAST(1 AS BIGINT), length(bin(${tag}_exact)) - 1) " +
        "AS DOUBLE) / 4.0 END"
    ex.crossJoin(est)
      .select(col("n"),
        col("p50_exact"), col("p50_est"),
        round(col("p50_est") - col("p50_exact").cast("double"), 2).as("p50_err"),
        col("p90_exact"), col("p90_est"),
        round(col("p90_est") - col("p90_exact").cast("double"), 2).as("p90_err"),
        col("p99_exact"), col("p99_est"),
        round(col("p99_est") - col("p99_exact").cast("double"), 2).as("p99_err"))
      .withColumn("within_width",
        when(
          col("p50_err") >= 0 && col("p50_err") <= expr(width("p50")) &&
          col("p90_err") >= 0 && col("p90_err") <= expr(width("p90")) &&
          col("p99_err") >= 0 && col("p99_err") <= expr(width("p99")),
          1L).otherwise(0L))
  }

  /** X6 FUNNEL-LATENCY profile — [[Windows.funnel]]'s step-transition
    * times summarized by the dyadic log sketch: per transition
    * (view→click, click→purchase), n + p50/p90/p99 of the
    * whole-second conversion latency. Conversion times are the
    * canonical heavy-tail domain (seconds to weeks), exactly what the
    * log-width buckets exist for — fixed width 5 either loses the
    * minutes structure or needs millions of rows for the weeks tail.
    * Build: the funnel frame (three keyed min-aggregations) → a
    * two-rows-per-converting-user transition stream → the same
    * integer-bit dyadic bucket + cumulative upper-edge read as
    * [[histLogQuantilesFrom]], partitioned by step; the cumulative
    * window runs over O(steps · 4·log₂ range) aggregated bucket rows,
    * never raw events. */
  def funnelLatency(events: DataFrame): DataFrame =
    funnelLatencyFrom(Windows.funnel(events))

  /** [[funnelLatency]] over any (t1_us, t2_us, t3_us) funnel frame —
    * the serve form: a continuously-maintained conversion table
    * ([[graft.streaming.StreamPipeline.funnelStream]]'s sink, or a
    * stored batch funnel) feeds the same latency read without
    * re-scanning events (spec pins stream-sink-served ≡ batch on the
    * completed-conversion subset). */
  def funnelLatencyFrom(f: DataFrame): DataFrame = {
    val g = f.filter(col("t2_us").isNotNull)
      .select(lit("view_click").as("step"),
        expr("(t2_us - t1_us) div 1000000").as("gap_s"))
      .union(f.filter(col("t3_us").isNotNull)
        .select(lit("click_purchase").as("step"),
          expr("(t3_us - t2_us) div 1000000").as("gap_s")))
    val sk = g.select(col("step"), expr(logBucket).as("bucket"))
      .groupBy(col("step"), col("bucket")).agg(count(lit(1)).as("c"))
    val cum = sk
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy(col("step")).orderBy(col("bucket"))))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("step"))))
    def est(p: Double): Column =
      round(min(when(col("cum") >=
        ceil(lit(p) * col("n").cast("double")).cast("long"),
        expr(logEdge))), 2)
    cum.groupBy(col("step"))
      .agg(max(col("n")).as("n"), est(0.5).as("p50_est"),
        est(0.9).as("p90_est"), est(0.99).as("p99_est"))
  }
}
