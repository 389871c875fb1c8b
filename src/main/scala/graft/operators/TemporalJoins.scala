package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators — the classic "Spark lacks this natively"
  * pair from the custom-operator preference list, implemented at
  * preference level (a): composition of built-ins, no custom strategy
  * needed.
  *
  *  - As-of join: for each left event, the most recent right event at
  *    or before it, per key. Implemented as union + ordered window
  *    (the sort-merge formulation): one shuffle on (key), then a
  *    single ordered pass — at 100 TB this is the same cost as any
  *    windowed aggregation, never a range crossJoin.
  *  - Range (interval) join: pairs within a time tolerance, per key.
  *    Implemented by time-binning: candidates share a (key, bin)
  *    cell with bin offsets covering the tolerance, turning the
  *    interval predicate into an equi-join plus a cheap residual
  *    filter. Candidate volume scales with bin occupancy, not n².
  */
object TemporalJoins {

  /** As-of: for every `click` event, the most recent prior-or-equal
    * `view` event by the same user. Output keeps unmatched clicks with
    * null view columns (left as-of semantics). */
  def asofViewBeforeClick(events: DataFrame): DataFrame = {
    val tagged = events
      .filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    tagged
      .withColumn("last_view_id",
        last(when(col("event_type") === "view", col("event_id")), ignoreNulls = true).over(w))
      .withColumn("last_view_us",
        last(when(col("event_type") === "view", unix_micros(col("ts"))),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        unix_micros(col("ts")).as("click_us"),
        col("last_view_id"), col("last_view_us"))
  }

  /** Range join: (a, b) event pairs for the same user with
    * 0 < ts_b − ts_a ≤ `toleranceSec`, via time-bin bucketing. Each
    * left event joins only the two bins its tolerance window can
    * reach — an equi-join on (user_id, bin) — then the exact interval
    * predicate filters residuals. No dedup pass is needed: a matching
    * pair has b_us − a_us in (0, tol], so bin(b) is bin(a) or
    * bin(a)+1, and the left side emits those two DISTINCT bin values
    * exactly once each — every pair meets in exactly one joined row. */
  def intervalPairs(events: DataFrame, toleranceSec: Long = 60): DataFrame = {
    val tolUs = toleranceSec * 1000000L
    val a = events.select(col("user_id"), col("event_id").as("a_id"),
      unix_micros(col("ts")).as("a_us"))
    val b = events.select(col("user_id"), col("event_id").as("b_id"),
      unix_micros(col("ts")).as("b_us"))
      .withColumn("bin", expr(s"b_us div $tolUs"))
    // left event at bin k can only match right events in bins k or k+1
    val aBinned = a
      .withColumn("bin0", expr(s"a_us div $tolUs"))
      .withColumn("bin", explode(array(col("bin0"), col("bin0") + 1)))
      .drop("bin0")
    aBinned.join(b, Seq("user_id", "bin"))
      .filter(col("b_us") > col("a_us") && col("b_us") <= col("a_us") + tolUs)
      .select(col("user_id"), col("a_id"), col("b_id"),
        (col("b_us") - col("a_us")).as("gap_us"))
  }
}
