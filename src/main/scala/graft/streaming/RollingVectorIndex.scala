package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, sqrt}

import graft.functions.DotProduct.dot_product
import graft.operators.Similarity

/** Generation-rolling near-dup index for VECTOR modalities — the
  * [[RollingBandIndex]] discipline applied to media/embedding assets:
  * each generation holds the PRE-BUILT wide centered bucket table
  * ([[Similarity.lshDedupBucketIndex]], one slim row per asset per
  * table) plus the normalized vector frame the scoring join needs,
  * both materialized ONCE per generation — the embed/hash pipeline
  * runs at refresh time, never per micro-batch — and swapped
  * atomically under a volatile read.
  *
  * The micro-batch loop reads [[currentBuckets]]/[[currentVectors]] at
  * every trigger, so assets accepted into generation N start gating
  * generation N+1 the moment [[refresh]] returns: no query restart, no
  * streaming-state reset, no re-hashing of the collection inside a
  * trigger ([[StreamPipeline.mediaDedupStream]] wires this into the
  * same auto-refresh epilogue `curateStream` uses for text).
  *
  * Each generation is an eager `localCheckpoint` — lineage-free, owned
  * by no CacheManager entry; superseded generations are reclaimed by
  * the ContextCleaner once the last in-flight batch drops its
  * reference. `refresh` is safe to call concurrently with a running
  * query: an in-flight batch keeps the generation PAIR it read at its
  * start (one volatile read hands out both frames), the next trigger
  * sees the new one.
  */
final class RollingVectorIndex private (
    @volatile private var cur: (DataFrame, DataFrame)) {

  /** The live generation's (match_id, tbl, bucket) bucket table. */
  def currentBuckets: DataFrame = cur._1

  /** The live generation's normalized (vec_id, v, nrm) vector frame. */
  def currentVectors: DataFrame = cur._2

  /** The live generation as an atomic pair — use this from a
    * micro-batch so candidates and scores come from the SAME
    * generation even if a refresh lands mid-batch. */
  def current: (DataFrame, DataFrame) = cur

  /** Roll to a new generation built from `vectors` (vec_id, v) —
    * typically the accepted collection re-embedded from the upserted
    * output, or any superset the next generation must not
    * near-duplicate. */
  def refresh(vectors: DataFrame): Unit =
    cur = RollingVectorIndex.materialize(vectors)
}

object RollingVectorIndex {
  private def materialize(vectors: DataFrame): (DataFrame, DataFrame) = {
    val vn = vectors
      .withColumn("nrm", sqrt(dot_product(col("v"), col("v"))))
      .localCheckpoint()
    (Similarity.lshDedupBucketIndex(vn.select(col("vec_id"), col("v")))
      .localCheckpoint(), vn)
  }

  /** Build generation 0 from an initial accepted collection (may be
    * empty: an empty (vec_id, v) frame gates nothing until the first
    * [[RollingVectorIndex.refresh]]). */
  def build(vectors: DataFrame): RollingVectorIndex =
    new RollingVectorIndex(materialize(vectors))
}
