package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data profiling — the first pass any large-scale ingest runs: per
  * column null counts, distinct cardinality, and min/max. One job
  * computes all columns' aggregates in a single scan (one wide agg
  * row, exploded to long format), so profiling 100 TB costs one pass
  * regardless of column count.
  *
  * Long/string columns only in the oracle-checked surface: integer and
  * string min/max render identically across engines, while float
  * formatting does not.
  */
object Profiling {

  /** Long-format profile of the named columns: (column, n_nulls,
    * n_distinct, min_s, max_s). The wide agg row unpivots through
    * `stack`, NOT a union of per-column selects — a union re-plans the
    * aggregation (and re-scans the table) once per branch, turning the
    * one-pass promise into |cols| passes. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', ${c}__nulls, ${c}__distinct, ${c}__min, ${c}__max").mkString(", ")
    one.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS (column, n_nulls, n_distinct, min_s, max_s)")
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
}
