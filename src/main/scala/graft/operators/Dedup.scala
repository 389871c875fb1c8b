package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication family for a training-data pipeline (SURVEY §2 X1/X4):
  * exact keyed dedup, content-fingerprint dedup, MinHash signatures +
  * LSH banding, n-gram Jaccard verification, and SimHash.
  *
  * Scale design: signatures (MinHash, SimHash) are computed with
  * higher-order array functions in a single narrow projection — NO
  * explode, NO shuffle, no state; a 100 TB corpus streams through
  * map-side only. The only shuffles in the family are (a) the group-by
  * on fingerprint for exact dedup and (b) the band-bucket self-join,
  * both on keys whose cardinality grows with data size (no hot key).
  *
  * All hash arithmetic is 64-bit integer with md5-derived bases, so the
  * DuckDB oracle reproduces signatures bit-for-bit:
  * Spark `conv(substring(md5(t),1,15),16,10)` ≡ DuckDB
  * `CAST(('0x'||substr(md5(t),1,15)) AS BIGINT)`.
  */
object Dedup {
  /** MinHash modulus (2^31 - 1, prime). */
  val P = 2147483647L
  val NumPerms = 16
  val BandRows = 4

  /** 60-bit integer hash of a token, identical in Spark and DuckDB. */
  private def tokenHash(t: Column): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long")

  private def toks: Column = split(col("text"), " ")

  /** X1 exact keyed dedup, batch flavor: keep the earliest event per
    * (user_id, event_type). Deterministic survivor via (ts, event_id)
    * tie-break — the reproducible form of `dropDuplicates`. One shuffle
    * on the dedup key. */
  def firstEventPerKey(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    events.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"))
  }

  /** X1 exact content dedup via md5 fingerprint: survivor id + group
    * size per distinct content. Hash-groupBy, partial aggregation
    * map-side; the 100 TB version is the same plan. */
  def fingerprintDedup(documents: DataFrame): DataFrame =
    documents.groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))

  import graft.functions.TextSignatureColumns._

  /** X4 MinHash signatures, long format (doc_id, perm, minhash), over
    * 3-gram shingles — shingles, not unigram tokens: unigram sets over
    * a small vocabulary are near-identical for every pair (52% of all
    * pairs collided on this corpus), while shingle sets track the
    * n-gram Jaccard measure the LSH candidates are later verified
    * against. Permutation i is `h_i(x) = ((2i+1)·x + 12289i + 7) mod P`
    * over the 60-bit md5 shingle hash; shingling/hashing/min run in the
    * compiled kernels of graft.functions.TextSignatures (the
    * higher-order-function formulation interprets a lambda per element
    * and was ~4 s per pass at sf0.1). */
  def minhashSignatures(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"),
        posexplode(minhash_sig(shingle_hashes(col("text"), 3, P), NumPerms, P)))
      .toDF("doc_id", "perm", "minhash")

  /** X4 LSH banding over the MinHash signature: 4 bands × 4 rows; docs
    * sharing any band key become candidate near-dup pairs. The
    * self-join shuffles on (band, key) — band-key cardinality scales
    * with corpus size, so no hot partition; at 100 TB add salting on
    * degenerate band keys (all-equal signatures). The repartition on
    * the band key doubles as the exchange both join sides reuse
    * (ReuseExchange), so signatures are computed once. */
  def minhashBandPairs(documents: DataFrame): DataFrame = {
    val bands = documents
      .withColumn("sig", minhash_sig(shingle_hashes(col("text"), 3, P), NumPerms, P))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(NumPerms / BandRows - 1)),
          b => concat_ws(":", slice(col("sig"), b * BandRows + 1, lit(BandRows))))))
      .toDF("doc_id", "band", "key")
      .repartition(col("band"), col("key"))
    bands.alias("x").join(bands.alias("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
  }

  /** X4 n-gram Jaccard: top-k most similar document pairs by word
    * 3-gram Jaccard, via the inverted shingle index (explode → self-join
    * on shingle → per-pair intersection count). This is both the exact
    * near-dup measure and the verification stage behind MinHash/LSH
    * candidates. The repartition on shingle sits ABOVE the explode so
    * the materialized exchange holds finished (doc_id, shingle) rows;
    * both self-join sides and the per-doc counts reuse that one
    * exchange instead of re-evaluating the (interpreted,
    * non-codegen) shingle lambda. */
  def ngramJaccardTopK(documents: DataFrame, n: Int = 3, k: Int = 20): DataFrame = {
    val inv = documents
      .select(col("doc_id"), explode(word_shingles(col("text"), n)).as("shingle"))
      .repartition(col("shingle"))
    val counts = inv.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"))
    val inter = inv.alias("x").join(inv.alias("y"),
        col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(counts.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n_shingles", "na"), "doc_a")
      .join(counts.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n_shingles", "nb"), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("n_inter"),
        round(col("n_inter") / (col("na") + col("nb") - col("n_inter")).cast("double"), 6)
          .as("jaccard"))
      .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
      .limit(k)
  }

  /** X4 SimHash: 60-bit signature; bit i is the sign of the sum over
    * distinct tokens of ±1 according to bit i of the token hash.
    * Commutative integer sums ⇒ insensitive to token order (and to
    * DuckDB's unordered list_distinct). Single narrow pass through the
    * compiled kernel (the equivalent nested aggregate() lambdas
    * interpreted at ~7 s per evaluation at sf0.1). */
  def simhash(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
      simhash64(shingle_hashes(col("text"), 1, 0L)).as("simhash"))

  /** SimHash near-dup: top-k closest pairs by Hamming distance on the
    * 60-bit signatures (deterministic tie-break on ids).
    *
    * Exact all-pairs Hamming is O(n²) and only feasible when the
    * signature table (16 bytes/doc) fits one node — which any exact
    * method requires — so this broadcasts the signatures and scores
    * pairs in a tight xor/popcount loop with per-partition bounded
    * heaps (a join formulation materializes rows per pair and is an
    * order of magnitude slower). The 100 TB path bands the simhash
    * bits exactly like MinHash LSH and verifies candidates only. */
  def simhashTopK(documents: DataFrame, k: Int = 20): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val s = simhash(documents)
      .repartition(spark.sparkContext.defaultParallelism).as[(Long, Long)]
    val collected = s.collect()
    // primitive arrays: the hot loop must not unbox tuples per pair
    val bcIds = spark.sparkContext.broadcast(collected.map(_._1))
    val bcSigs = spark.sparkContext.broadcast(collected.map(_._2))
    // "best" = lowest hamming, then smallest ids; PQ head = worst kept
    val pairOrd: Ordering[(Long, Long, Long)] =
      Ordering.Tuple3(Ordering[Long], Ordering[Long], Ordering[Long])
    val local = s.mapPartitions { it =>
      val ids = bcIds.value
      val sigs = bcSigs.value
      val heap = scala.collection.mutable.PriorityQueue.empty[(Long, Long, Long)](pairOrd)
      // worst kept pair mirrored in locals: the eviction test must not
      // allocate a Tuple3 per candidate pair
      var wh = Long.MaxValue; var wa = Long.MaxValue; var wb = Long.MaxValue
      def syncWorst(): Unit = { val t = heap.head; wh = t._1; wa = t._2; wb = t._3 }
      it.foreach { case (aId, aSig) =>
        var j = 0
        while (j < ids.length) {
          val bId = ids(j)
          if (bId > aId) {
            val h = java.lang.Long.bitCount(aSig ^ sigs(j)).toLong
            if (heap.size < k) { heap.enqueue((h, aId, bId)); syncWorst() }
            else if (h < wh || (h == wh && (aId < wa || (aId == wa && bId < wb)))) {
              heap.dequeue(); heap.enqueue((h, aId, bId)); syncWorst()
            }
          }
          j += 1
        }
      }
      heap.iterator
    }
    local.toDF("hamming", "doc_a", "doc_b")
      .orderBy(col("hamming"), col("doc_a"), col("doc_b")).limit(k)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }
}
