package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}
import graft.functions.RollingHash

/** Semantics tests for X1/X3/X4 on hand-made documents (value-level
  * correctness vs DuckDB is covered by the oracle at sf0.01). */
class TextDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("rolling hash matches the reference fold and runs under codegen") {
    val s = "spark table"
    var expected = 0L
    s.foreach(ch => expected = (expected * 31 + ch) % RollingHash.DefaultPrime)
    val got = docs((1L, s)).select(RollingHash.rolling_hash(col("text")))
      .head.getLong(0)
    assert(got === expected)
  }

  test("rolling hash folds codepoints, not UTF-16 units (ord parity)") {
    val s = "héllo 😀 世界" // BMP accents, a surrogate pair, CJK
    var expected = 0L
    s.codePoints().forEach(cp =>
      expected = (expected * 31 + cp) % RollingHash.DefaultPrime)
    val got = docs((1L, s)).select(RollingHash.rolling_hash(col("text")))
      .head.getLong(0)
    assert(got === expected)
  }

  test("identical documents share minhash signatures; disjoint ones do not") {
    val d = docs((1L, "a b c d e f g h"), (2L, "a b c d e f g h"),
      (3L, "q r s t u v w x"))
    val sigs = Dedup.minhashSignatures(d)
      .groupBy("doc_id").agg(concat_ws(",", collect_list(col("minhash"))))
      .as[(Long, String)].collect().toMap
    assert(sigs(1L) === sigs(2L))
    assert(sigs(1L) !== sigs(3L))
  }

  test("minhash LSH banding surfaces the exact-duplicate pair") {
    val d = docs((1L, "a b c d e f g h"), (2L, "a b c d e f g h"),
      (3L, "q r s t u v w x"))
    val pairs = Dedup.minhashBandPairs(d).as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)))
  }

  test("ngram jaccard: identical docs score 1.0 and rank first") {
    val d = docs((1L, "a b c d e"), (2L, "a b c d e"), (3L, "a b c x y"))
    val top = Dedup.ngramJaccardTopK(d, 3, 10)
      .as[(Long, Long, Long, Double)].collect()
    assert(top.head._1 === 1L && top.head._2 === 2L && top.head._4 === 1.0)
  }

  test("simhash: identical docs at hamming 0, unrelated docs far apart") {
    val d = docs((1L, "a b c d e f g h"), (2L, "a b c d e f g h"),
      (3L, "q r s t u v w x"))
    val top = Dedup.simhashTopK(d, 3).as[(Long, Long, Long)].collect()
    val h = top.map { case (a, b, hm) => (a, b) -> hm }.toMap
    assert(h((1L, 2L)) === 0L)
    assert(h((1L, 3L)) > 10L)
  }

  test("langid picks the dominant stopword language, 'und' when none") {
    val d = docs((1L, "der hund und die katze ist da"),
      (2L, "the cat of a dog and to go"), (3L, "xyz abc"))
    val got = TextAnalysis.langId(d).select("doc_id", "lang_pred")
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "de", 2L -> "en", 3L -> "und"))
  }

  test("first-event dedup keeps exactly one earliest row per key") {
    val e = Seq(
      (10L, java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), 7L, "click"),
      (11L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 7L, "click"),
      (12L, java.sql.Timestamp.valueOf("2024-01-01 00:00:03"), 7L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = Dedup.firstEventPerKey(e).select("event_id")
      .as[Long].collect().toSet
    assert(got === Set(11L, 12L))
  }

  test("quality score stays within [0, 1]") {
    val q = TextAnalysis.qualityScore(
      docs((1L, "the a of short"), (2L, ("word " * 99).trim)))
      .as[(Long, Double)].collect()
    assert(q.forall { case (_, s) => s >= 0.0 && s <= 1.0 })
  }
}
