package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset sampling and sharding for a training-data pipeline
  * (SURVEY §2 X1-adjacent): deterministic hash splits and
  * token-budget shard packing.
  *
  * Random sampling via `rand()` is a correctness bug in a training
  * pipeline — re-running the job (speculative task, stage retry,
  * backfill) would reassign rows across train/val/test and leak test
  * data into training. Hash-based assignment is deterministic per key
  * on any engine, any cluster, any retry: the md5-derived 60-bit
  * integer (same `conv(substring(md5(k),1,15),16,10)` base as the
  * dedup family, reproduced bit-for-bit by the DuckDB oracle) is a
  * uniform function of the key alone. Both operators are a single
  * narrow projection or one window — no shuffle beyond the stated
  * partitioning, so they stream through 100 TB map-side.
  */
object Sampling {

  /** 60-bit md5 integer of a column, identical across engines. */
  private def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** X1 deterministic train/val/test split: percentile bucket =
    * hash(key) mod 100 → 80/10/10 assignment. Narrow, shuffle-free,
    * reproducible under retries and backfills. */
  def sampleSplit(documents: DataFrame, keyCol: String = "doc_id",
                  trainPct: Int = 80, valPct: Int = 10): DataFrame =
    documents.select(col("doc_id"), col("lang"),
        (hash60(col(keyCol)) % 100).as("pct"))
      .withColumn("split",
        when(col("pct") < trainPct, "train")
          .when(col("pct") < trainPct + valPct, "val")
          .otherwise("test"))

  /** X1 per-source balancing cap: keep at most `cap` documents per
    * source, chosen by hash order — a deterministic unbiased subset
    * (head-of-table order would bias toward whatever the upstream
    * writer emitted first; `rand()` would reshuffle on every retry).
    * One window per source partition; no global ordering anywhere, so
    * sources cap independently at any scale. */
  def sourceCap(documents: DataFrame, cap: Int = 15): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(hash60(col("doc_id")), col("doc_id"))
    documents.select(col("doc_id"), col("source"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= cap)
  }

  /** X3/X1 token-budget shard packing (sequence packing): documents are
    * packed in key order per source into shards of ~`budget` tokens —
    * shard id = preceding cumulative token count over the budget. One
    * window (partition by source, order by doc_id); at 100 TB each
    * source packs independently, and the running sum is the same
    * single-pass prefix computation every engine executes identically
    * (integer arithmetic end to end). */
  def packShards(documents: DataFrame, budget: Long = 500L): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        expr(s"(cum - n_tokens) div $budget").as("shard"))
  }
}
