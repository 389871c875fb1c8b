package graft

/** The MEASURED sf0.001 recall-gate constants, centralized (round-19
  * ADVICE): every drift-tripwire pin reads from here, so a corpus
  * regeneration — the only legitimate reason these move — updates ONE
  * object instead of constants scattered across suites. These are
  * measurements, NOT invariants: a failure means the test corpus or an
  * encode formula changed, so diagnose as data drift first (the
  * x7_curate_neardup 3-round-convergence discipline). The composed
  * gates exist precisely because the residual-vs-raw margin is
  * data-dependent — on the embeddings table residual wins (PQ) or ties
  * (SQ), while on the media stub geometry raw PQ BEATS residual —
  * so no inequality may be assumed across distributions.
  */
object MeasuredGatesSf0001 {
  /** x2_ivfpq_recall: Σ hits over 20 queries × 3 slots, embeddings table. */
  val ivfPqRawHits = 12L
  val ivfPqResHits = 14L

  /** x2_ivfsq_recall: raw int8 re-priced by the asymmetric L2 estimate
    * ties residual int8 on this corpus (43 = 43 of 60 slots). */
  val ivfSqRawHits = 43L
  val ivfSqResHits = 43L

  /** x5_mm_ivfpq_recall: the measured INVERSION — raw PQ beats residual
    * on the dyadic media stub geometry (28 > 26 of 60 slots). */
  val mediaIvfPqRawHits = 28L
  val mediaIvfPqResHits = 26L

  /** x2_pq_recall: the flat ADC ranking keeps 15 of 60 exact-L2 slots
    * on the embeddings table — the 8-byte code is a SHORTLIST tier
    * here (the rerank form recovers exact order), consistent with the
    * composed gate's raw leg (12). */
  val flatPqHits = 15L

  /** x5_mm_pq_recall: 27 of 60 on the dyadic media stub — in line with
    * the media composed raw-PQ leg (28). */
  val mediaFlatPqHits = 27L

  /** x2_pq_rerank_recall: shortlist S=64 → exact-L2 rerank recovers
    * 50 of 60 slots (0.833) from the flat ADC's 15 — the SURVEY-cited
    * 0.25 → 0.83 recovery, now an oracle-checked measurement. */
  val pqRerankHits = 50L

  /** x2_sq_recall / x2_sq_rerank_recall: flat int8 ranking keeps
    * 98 of 100; the kCand=20 shortlist → exact-dot rerank is PERFECT
    * (100/100) — int8 is a free candidate generator on this corpus. */
  val flatSqHits = 98L
  val sqRerankHits = 100L

  /** x2_binary_recall / x2_binary_rerank_recall: the Hamming ranking
    * keeps 22 of 100 and the kCand=20 exact-cosine rerank doubles it
    * to 45 — 8 bytes/vector buys a shortlist, never a final order. */
  val flatBinaryHits = 22L
  val binaryRerankHits = 45L

  /** x5_mm_sq_recall: the flat int8 rung keeps 14 of 15 slots on the
    * media stub distribution — int8 storage is near-free here. */
  val mediaFlatSqHits = 14L

  /** x5_mm_binary_recall: the flat binary rung COLLAPSES on the
    * all-positive [0,1] stub geometry — 0 of 15 slots. Centered sign
    * bits lose the uncentered-cosine order entirely. The gate finding
    * this is why it exists. */
  val mediaFlatBinaryHits = 0L

  /** x5_mm_binary_rerank_recall: even the two-stage form recovers only
    * 2 of 15 at kCand=20 (0/15 at sf0.01) — barely above a random
    * shortlist, so the CANDIDATE GENERATION is what's broken on this
    * geometry, not just the ranking. Deploy the int8 tier here. */
  val mediaBinaryRerankHits = 2L
}
