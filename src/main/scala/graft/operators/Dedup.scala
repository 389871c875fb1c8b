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

  /** X4 MinHash signatures, long format (doc_id, perm, minhash).
    * Permutation i is `h_i(x) = ((2i+1)·x + 12289i + 7) mod P` over the
    * 60-bit token hash. Computed entirely with nested higher-order
    * functions — one narrow pass, no explode/shuffle. */
  def minhashSignatures(documents: DataFrame): DataFrame =
    documents
      .withColumn("hs", transform(array_distinct(toks), t => tokenHash(t) % P))
      .withColumn("sig", transform(sequence(lit(0), lit(NumPerms - 1)),
        i => array_min(transform(col("hs"),
          h => ((lit(2) * i + 1) * h + lit(12289) * i + 7) % P))))
      .select(col("doc_id"), posexplode(col("sig")))
      .toDF("doc_id", "perm", "minhash")

  /** X4 LSH banding over the MinHash signature: 4 bands × 4 rows; docs
    * sharing any band key become candidate near-dup pairs. The
    * self-join shuffles on (band, key) — band-key cardinality scales
    * with corpus size, so no hot partition; at 100 TB add salting on
    * degenerate band keys (all-equal signatures). */
  def minhashBandPairs(documents: DataFrame): DataFrame = {
    val sigs = documents
      .withColumn("hs", transform(array_distinct(toks), t => tokenHash(t) % P))
      .withColumn("sig", transform(sequence(lit(0), lit(NumPerms - 1)),
        i => array_min(transform(col("hs"),
          h => ((lit(2) * i + 1) * h + lit(12289) * i + 7) % P))))
    val bands = sigs.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(NumPerms / BandRows - 1)),
          b => concat_ws(":", slice(col("sig"), b * BandRows + 1, lit(BandRows))))))
      .toDF("doc_id", "band", "key")
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
    * candidates. Shuffles on shingle then on pair — both high-cardinality
    * keys. */
  def ngramJaccardTopK(documents: DataFrame, n: Int = 3, k: Int = 20): DataFrame = {
    val withShingles = documents.select(col("doc_id"),
      array_distinct(when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
        .otherwise(array().cast("array<string>"))).as("shingles"))
    val counts = withShingles.select(col("doc_id"),
      size(col("shingles")).cast("long").as("n_shingles"))
    val inv = withShingles.select(col("doc_id"), explode(col("shingles")).as("shingle"))
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
    * DuckDB's unordered list_distinct). Single narrow pass. */
  def simhash(documents: DataFrame): DataFrame =
    documents
      .withColumn("hs", transform(array_distinct(toks), t => tokenHash(t)))
      .select(col("doc_id"), expr(
        """aggregate(sequence(0, 59), CAST(0 AS BIGINT), (acc, i) -> acc +
          |  IF(aggregate(hs, 0, (a, h) -> a + IF((shiftright(h, i) & 1) = 1, 1, -1)) > 0,
          |     shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT)))""".stripMargin)
        .as("simhash"))

  /** SimHash near-dup: top-k closest pairs by Hamming distance on the
    * 60-bit signatures (deterministic tie-break). The O(n²) compare is
    * the verification-scale fallback; at 100 TB candidates come from
    * banding the simhash bits exactly like MinHash LSH. */
  def simhashTopK(documents: DataFrame, k: Int = 20): DataFrame = {
    val s = simhash(documents)
    s.alias("x").join(s.alias("y"), col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).cast("long")
          .as("hamming"))
      .orderBy(col("hamming"), col("doc_a"), col("doc_b"))
      .limit(k)
  }
}
