package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.Dedup

/** Generation-rolling near-dup index for
  * [[StreamPipeline.curateStream]]: holds the PRE-AGGREGATED
  * (band, key, match_id) table of the accepted corpus
  * ([[Dedup.bandIndex]]), materialized once per generation — the
  * signature → band → bucket-min pipeline runs at refresh time, never
  * per micro-batch — and swapped atomically under a volatile read.
  *
  * The micro-batch loop reads [[current]] at every trigger, so
  * documents accepted into generation N start gating generation N+1
  * the moment [[refresh]] returns: no query restart, no streaming-state
  * reset, no re-signing of the corpus inside a trigger. This is the
  * index-refresh story the static `index` parameter of `curateStream`
  * can't provide (a static frame is one generation forever).
  *
  * Each generation is an eager `localCheckpoint` — lineage-free, owned
  * by no CacheManager entry; a superseded generation's blocks are
  * reclaimed by the ContextCleaner once the last in-flight batch that
  * read it completes and drops the reference. `refresh` is safe to call
  * concurrently with a running query: an in-flight batch keeps using
  * the generation it read at its start, the next trigger sees the new
  * one.
  */
final class RollingBandIndex private (@volatile private var cur: DataFrame) {

  /** The live generation's aggregated band-key frame. */
  def current: DataFrame = cur

  /** Roll to a new generation built from `accepted` (doc_id, text) —
    * typically the upserted output directory of the curation stream
    * read back ([[StreamPipeline.readUpserted]]), or any superset of
    * the corpus the next generation must not near-duplicate. */
  def refresh(accepted: DataFrame): Unit =
    cur = RollingBandIndex.materialize(accepted)
}

object RollingBandIndex {
  private def materialize(accepted: DataFrame): DataFrame =
    Dedup.bandIndex(accepted).localCheckpoint()

  /** Build generation 0 from an initial accepted corpus (may be
    * empty: an empty frame with (doc_id, text) columns gates
    * nothing until the first [[RollingBandIndex.refresh]]). */
  def build(accepted: DataFrame): RollingBandIndex =
    new RollingBandIndex(materialize(accepted))
}
