package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (SURVEY §2 X2):
  * brute-force cosine top-k as the exact baseline, plus two scale
  * paths — random-hyperplane LSH bucketing and IVF cells.
  *
  * Scale design: the brute-force variant is O(|Q|·N) with the query
  * set broadcast (fine for small query batches, the verification
  * baseline); LSH/IVF prune the candidate set so the crossJoin touches
  * only one bucket/cell — at 100 TB the bucket id becomes the shuffle
  * key and each cell is processed independently.
  *
  * Float determinism: embeddings are float32 in parquet; both engines
  * cast to double (exact) and fold dot products in array order, so
  * cosines are bit-identical with the DuckDB oracle. Outputs still
  * round to 6 decimals as belt-and-braces.
  */
object Similarity {

  /** Embedding as double array plus its L2 norm — one narrow pass. */
  private def withVec(embeddings: DataFrame): DataFrame =
    embeddings
      .withColumn("v", transform(col("embedding"), _.cast("double")))
      .withColumn("nrm", sqrt(aggregate(col("v"), lit(0.0), (acc, x) => acc + x * x)))

  /** Sequential-fold dot product of two double arrays (matches DuckDB's
    * list_reduce order). */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** X2 brute-force ANN: top-k neighbors by cosine for each query
    * vector (vec_id < nQueries), deterministic tie-break on neighbor
    * id. Query side is broadcast; the big side streams. */
  def annBruteForce(embeddings: DataFrame, nQueries: Int = 20, k: Int = 5): DataFrame = {
    val all = withVec(embeddings)
    val q = all.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = all.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), round(col("cos"), 6).as("cos"), col("rank"))
  }

  /** X2 near-dup flavor: globally most-similar k pairs (a < b). The
    * all-pairs compare is the exact baseline; LSH below is the scale
    * path. */
  def cosinePairsTopK(embeddings: DataFrame, k: Int = 20): DataFrame = {
    val a = withVec(embeddings).select(col("vec_id").as("a_id"),
      col("v").as("av"), col("nrm").as("an"))
    val b = withVec(embeddings).select(col("vec_id").as("b_id"),
      col("v").as("bv"), col("nrm").as("bn"))
    a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(dot(col("av"), col("bv")) / (col("an") * col("bn")), 6).as("cos"))
      .orderBy(col("cos").desc, col("a_id"), col("b_id"))
      .limit(k)
  }

  /** Random-hyperplane LSH, 4 tables × 4 sign bits (OR-amplification:
    * a candidate matches if it shares a bucket in ANY table — single
    * wide tables prune recall to nothing, many narrow tables recover
    * it; this is the standard multi-table construction). Hyperplane
    * components come from a fixed LCG-style integer formula so the
    * oracle reproduces them exactly:
    * hp(p,d) = ((1103515245·(64p+d) + 12345) mod 2^31) / 2^31 − 0.5,
    * plane p = table·4 + bit. */
  private val bucketsExpr =
    """transform(sequence(0, 3), tt ->
      |  aggregate(sequence(0, 3), 0, (bk, j) -> bk + IF(
      |    aggregate(sequence(0, 63), CAST(0.0 AS DOUBLE), (acc, d) -> acc +
      |      element_at(v, d + 1) *
      |      (CAST((CAST(1103515245 AS BIGINT) * ((tt * 4 + j) * 64 + d) + 12345)
      |         % 2147483648 AS DOUBLE) / 2147483648.0 - 0.5)) > 0,
      |    shiftleft(1, j), 0)))""".stripMargin

  /** X2 LSH-bucketed ANN: queries (vec_id < nQueries) retrieve top-k by
    * cosine among vectors sharing a bucket in at least one of the 4
    * tables. Candidate generation is a hash join on (table, bucket) +
    * distinct — never a crossJoin; at scale each (table, bucket) cell
    * is an independent partition of work. */
  def annLsh(embeddings: DataFrame, nQueries: Int = 20, k: Int = 3): DataFrame = {
    val all = withVec(embeddings).withColumn("buckets", expr(bucketsExpr))
    val buckets = all.select(col("vec_id"), col("v"), col("nrm"),
      posexplode(col("buckets"))).toDF("vec_id", "v", "nrm", "tbl", "bucket")
    val q = buckets.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("tbl"), col("bucket"))
    val cands = buckets.join(q, Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id")).distinct()
    val vecs = withVec(embeddings)
    val scored = cands
      .join(vecs.select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qn")), Seq("q_id"))
      .join(vecs.select(col("vec_id").as("n_id"), col("v"), col("nrm")), Seq("n_id"))
      .select(col("q_id"), col("n_id"),
        (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), round(col("cos"), 6).as("cos"), col("rank"))
  }

  /** X2 IVF-flat ANN with fixed seed centroids (vec_id < nCells):
    * every vector is assigned to its max-cosine centroid (tie → lowest
    * centroid id); queries search only their own cell. At scale the
    * cell id partitions the index — probing more cells = joining more
    * cell ids, never a full scan. */
  def annIvf(embeddings: DataFrame, nCells: Int = 8,
             nQueries: Int = 20, k: Int = 3): DataFrame = {
    val all = withVec(embeddings)
    val cents = all.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    val aw = Window.partitionBy(col("vec_id"))
      .orderBy((dot(col("cv"), col("v")) / (col("cn") * col("nrm"))).desc, col("c_id"))
    val assigned = all.crossJoin(broadcast(cents))
      .withColumn("arank", row_number().over(aw))
      .filter(col("arank") === 1)
      .select(col("vec_id"), col("v"), col("nrm"), col("c_id").as("cell"))
    val q = assigned.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("cell"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    assigned.join(q, Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"), col("cell"),
        (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("cos"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("cell"),
        round(col("cos"), 6).as("cos"), col("rank"))
  }
}
