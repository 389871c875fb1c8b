package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over relations the corpus already implies — here the
  * token co-occurrence graph (nodes = tokens, directed edge a→b with
  * weight = corpus bigram count). Complements the fixpoint
  * connected-components clustering in [[Dedup]]: that one converges by
  * label propagation, this one runs a FIXED number of power iterations,
  * so the whole computation stays one lazy declarative plan (no
  * eager checkpoint, no driver loop state).
  *
  * All rank arithmetic is integer micro-units: ranks start at 1e6, the
  * damping split is 0.15/0.85 expressed as exact integer division
  * (`(r·w·17) div (wa·20)` — `div` on both engines truncates positive
  * int64 identically), so every iteration is fold-order-free and the
  * oracle (the same three iterations unrolled as CTEs) matches to the
  * last digit. Dangling mass (tokens that only ever END bigrams) leaks
  * out of the system rather than redistributing — acceptable for a
  * keyword-importance signal, and exactly mirrored by the oracle.
  */
object Graph {

  /** X3 token PageRank: importance of each token in the bigram
    * co-occurrence graph after `iters` damped power iterations,
    * top-k by final rank.
    *
    * 100 TB: the corpus is touched ONCE (the bigram count shuffle —
    * map-side combined, so a stopword pair's billions of occurrences
    * arrive as one partial per task); everything after is
    * vocabulary-scale. Each iteration is one hash join rank⋈edges on
    * the source token plus one re-aggregation on the destination —
    * O(E) rows per round with E already min-count pruned, never
    * corpus rows. `iters` is fixed and small, so the lineage stays a
    * plan (no checkpoint needed); nodes/edges are reused subtrees that
    * AQE plans once per round. */
  def tokenPageRank(documents: DataFrame, minEdgeCount: Long = 3L,
                    iters: Int = 3, k: Int = 50): DataFrame = {
    val pairs = documents
      .select(split(col("text"), " ").as("s"))
      .select(col("s"),
        slice(col("s"), lit(2), greatest(size(col("s")) - 1, lit(0))).as("r"))
      .select(explode(arrays_zip(col("s"), col("r"))).as("p"))
      .select(col("p.s").as("a"), col("p.r").as("b"))
      .filter(col("b").isNotNull)
    val edges = pairs.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= minEdgeCount)
    val outW = edges.groupBy(col("a")).agg(sum(col("w")).as("wa"))
    val ew = edges.join(outW, Seq("a"))
    val nodes = edges.select(col("a").as("tok"))
      .union(edges.select(col("b").as("tok"))).distinct()
    var rank = nodes.select(col("tok"), lit(1000000L).as("r"))
    for (_ <- 1 to iters) {
      val contrib = ew.join(rank, ew("a") === rank("tok"))
        .select(col("b").as("tok"),
          expr("(r * w * 17) div (wa * 20)").as("c"))
        .groupBy(col("tok")).agg(sum(col("c")).as("c"))
      rank = nodes.join(contrib, Seq("tok"), "left")
        .select(col("tok"),
          (lit(150000L) + coalesce(col("c"), lit(0L))).as("r"))
    }
    rank.orderBy(col("r").desc, col("tok")).limit(k)
      .select(col("tok"), (col("r").cast("double") / 1e6).as("rank"))
  }
}
