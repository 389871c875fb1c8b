package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed BPE merge training (the learning half of X3's BPE-ish
  * tokenization — `regexTokenCounts` applies a tokenizer; this LEARNS
  * one). Classic byte-pair-encoding over the corpus word-frequency
  * table: repeatedly count adjacent symbol pairs (weighted by word
  * frequency, overlapping occurrences counted as in the reference
  * algorithm) and merge the most frequent pair, ties broken
  * lexicographically so the learned table is deterministic.
  *
  * Scale shape: the iterative driver loop is INHERENT to BPE (merge
  * r+1's counts depend on merge r), but each iteration is fully
  * distributed — one flatMap + hash aggregation over the vocabulary
  * (not the corpus: the word-frequency table is the working set, built
  * once with the corpus's only full scan), and exactly ONE row (the
  * argmax pair) reaches the driver per merge. Generations are cached
  * and the previous one unpersisted, so lineage stays O(1) deep
  * instead of O(nMerges).
  */
object BpeTrainer {

  /** Greedy left-to-right application of one merge to a symbol array. */
  private[operators] def applyMerge(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Learn `nMerges` merges; returns (rank, left, right) in learned
    * order. Stops early when no pair repeats. */
  def train(documents: DataFrame, nMerges: Int = 20): Seq[(Int, String, String)] = {
    val spark = documents.sparkSession
    import spark.implicits._
    var words: Dataset[(Seq[String], Long)] = documents
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .as[(String, Long)]
      .map { case (w, f) => (w.map(_.toString): Seq[String], f) }
      .cache()
    val merges = ArrayBuffer.empty[(Int, String, String)]
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      val top = words.flatMap { case (syms, f) =>
        syms.iterator.sliding(2).withPartial(false)
          .map(p => (p.head, p(1), f))
      }.toDF("a", "b", "f")
        .groupBy(col("a"), col("b")).agg(sum(col("f")).as("s"))
        .orderBy(col("s").desc, col("a"), col("b"))
        .limit(1).as[(String, String, Long)].collect()
      top match {
        case Array((a, b, s)) if s > 1 =>
          merges += ((rank, a, b))
          val next = words.map { case (syms, f) => (applyMerge(syms, a, b), f) }.cache()
          next.foreach(_ => ()) // materialize before dropping the parent
          words.unpersist()
          words = next
          rank += 1
        case _ => done = true
      }
    }
    words.unpersist()
    merges.toSeq
  }

  /** Tokenize text with a learned merge table (merges applied in
    * learned order — the standard BPE inference rule). Narrow per-row
    * map; the merge table ships in the closure. */
  def encode(documents: DataFrame, merges: Seq[(Int, String, String)]): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val table = merges.sortBy(_._1).map { case (_, a, b) => (a, b) }
    documents.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val toks = text.split(' ').iterator.map { w =>
          var syms: Seq[String] = w.map(_.toString)
          table.foreach { case (a, b) => syms = applyMerge(syms, a, b) }
          syms
        }.flatten.toSeq
        (id, toks.length.toLong, toks.mkString(" "))
      }.toDF("doc_id", "n_bpe_symbols", "encoded")
  }
}
