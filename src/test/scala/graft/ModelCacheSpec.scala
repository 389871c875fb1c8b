package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{ModelCache, Similarity}

/** Pins [[graft.operators.ModelCache]]'s resident-driver story: memo
  * hits are reference-identical (cost-only, never results), eviction
  * drops EXACTLY the retired corpus's entries (other corpora survive;
  * no prefix over-match), and — the round-19 advice — eviction cannot
  * miss on a path-spelling variant because both the key builder and
  * the eviction prefix normalize trailing separators. */
class ModelCacheSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark

  test("memo: second call is a hit; evictCorpus forces a retrain for that corpus only") {
    import spark.implicits._
    ModelCache.clear()
    val embA = (0L to 19L).map(i =>
      (i, Seq.tabulate(8)(d => ((i * 7 + d) % 13).toFloat / 13f), 0))
      .toDF("vec_id", "embedding", "label")
    val embB = (0L to 19L).map(i =>
      (i, Seq.tabulate(8)(d => ((i * 11 + d) % 17).toFloat / 17f), 0))
      .toDF("vec_id", "embedding", "label")
    val a1 = Similarity.ivfModelCached(embA, "/tmp/corpusA", nCells = 2)
    val b1 = Similarity.ivfModelCached(embB, "/tmp/corpusB", nCells = 2)
    // hit: the memoized Seq comes back by REFERENCE (no retrain)
    assert(Similarity.ivfModelCached(embA, "/tmp/corpusA", nCells = 2) eq a1)
    ModelCache.evictCorpus("/tmp/corpusA")
    // corpus A retrains (fresh object, equal content — training is
    // deterministic); corpus B's entry survived the eviction
    val a2 = Similarity.ivfModelCached(embA, "/tmp/corpusA", nCells = 2)
    assert(!(a2 eq a1) && a2 === a1)
    assert(Similarity.ivfModelCached(embB, "/tmp/corpusB", nCells = 2) eq b1)
  }

  test("evictCorpus: trailing-slash spelling evicts the same entries the key builder wrote") {
    ModelCache.clear()
    var builds = 0
    def build(): java.lang.Integer = { builds += 1; Integer.valueOf(builds) }
    ModelCache.memo(ModelCache.key("/data/sfX", "ivf-8-2"))(build())
    ModelCache.memo(ModelCache.key("/data/sfX/", "pq-8-16"))(build())
    // both spellings built under the SAME normalized prefix
    assert(ModelCache.key("/data/sfX/", "s") === ModelCache.key("/data/sfX", "s"))
    ModelCache.evictCorpus("/data/sfX///")
    ModelCache.memo(ModelCache.key("/data/sfX", "ivf-8-2"))(build())
    ModelCache.memo(ModelCache.key("/data/sfX/", "pq-8-16"))(build())
    assert(builds === 4, s"eviction missed a path-spelling variant: $builds builds")
  }

  test("evictCorpus: prefix match cannot over-evict a corpus whose dir extends the retired one") {
    ModelCache.clear()
    var builds = 0
    def build(): java.lang.Integer = { builds += 1; Integer.valueOf(builds) }
    ModelCache.memo(ModelCache.key("/data/sf1", "ivf"))(build())
    ModelCache.memo(ModelCache.key("/data/sf10", "ivf"))(build())
    ModelCache.evictCorpus("/data/sf1")
    // sf10 survives: the prefix is dir + "#", never a bare startsWith
    ModelCache.memo(ModelCache.key("/data/sf10", "ivf"))(build())
    assert(builds === 2)
    ModelCache.memo(ModelCache.key("/data/sf1", "ivf"))(build())
    assert(builds === 3)
  }
}
