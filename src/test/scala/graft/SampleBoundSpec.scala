package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Similarity}

/** Pins the sampled ≡ full contract of the quadratic ground-truth
  * audits' `samplePct` knobs (the 100 TB bound: the exact side runs on
  * a deterministic hash sample, never the whole corpus).
  *
  *  - `jaccardPairs(samplePct = p)` must equal the FULL pair frame
  *    restricted to pairs whose BOTH endpoints fall in the hash
  *    sample — possible only because the df cap stats are computed on
  *    the full corpus before the sample filter (a naive
  *    filter-the-input-docs form would shift the relative df cap and
  *    fail this test).
  *  - `knnPredictions(samplePct = p)` must equal the FULL run's rows
  *    restricted to sampled query ids — every sampled query still
  *    votes over the whole corpus.
  *  - `samplePct = 100` must leave the frames identical to the
  *    pre-knob forms (oracle stability).
  */
class SampleBoundSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  private def inSample(c: org.apache.spark.sql.Column, pct: Int) =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10)
      .cast("long") % 100 < pct

  test("bandRecall ground truth: sampled pair frame == full pair frame restricted to the sample") {
    val d = graft.sources.Tables(spark, SparkTestBase.sf0001, "documents")
    val pct = 37
    val sampled = Dedup.jaccardPairs(d, samplePct = pct)
    val restricted = Dedup.jaccardPairs(d)
      .filter(inSample(col("doc_a"), pct) && inSample(col("doc_b"), pct))
    assert(sampled.exceptAll(restricted).isEmpty &&
      restricted.exceptAll(sampled).isEmpty)
    val nSampled = sampled.count()
    val nFull = Dedup.jaccardPairs(d).count()
    assert(nSampled > 0, "sample must not be degenerate at sf0.001")
    assert(nSampled < nFull, "sample must actually shrink the pair stage")
  }

  test("bandRecallReport at samplePct=100 is byte-identical to the unsampled form") {
    val d = graft.sources.Tables(spark, SparkTestBase.sf0001, "documents")
    val a = Dedup.bandRecallReport(d).orderBy("decile").collect().toSeq
    val b = Dedup.bandRecallReport(d, samplePct = 100).orderBy("decile").collect().toSeq
    assert(a == b)
  }

  test("sampled bandRecallReport runs and stays decile-shaped") {
    val d = graft.sources.Tables(spark, SparkTestBase.sf0001, "documents")
    val rows = Dedup.bandRecallReport(d, samplePct = 37).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val recall = r.getDouble(3)
      r.getLong(0) >= 0 && r.getLong(0) <= 9 && recall >= 0.0 && recall <= 1.0
    })
  }

  test("knnPredictions: sampled run == full run restricted to sampled query ids") {
    val e = graft.sources.Tables(spark, SparkTestBase.sf0001, "embeddings")
    val pct = 37
    val sampled = Similarity.knnPredictions(e, samplePct = pct)
    val restricted = Similarity.knnPredictions(e)
      .filter(inSample(col("q_id"), pct))
    assert(sampled.exceptAll(restricted).isEmpty &&
      restricted.exceptAll(sampled).isEmpty)
    val nSampled = sampled.count()
    assert(nSampled > 0, "sample must not be degenerate at sf0.001")
    assert(nSampled < Similarity.knnPredictions(e).count())
  }

  test("knnLabelAccuracy at samplePct=100 is byte-identical to the unsampled form") {
    val e = graft.sources.Tables(spark, SparkTestBase.sf0001, "embeddings")
    val a = Similarity.knnLabelAccuracy(e).orderBy("label").collect().toSeq
    val b = Similarity.knnLabelAccuracy(e, samplePct = 100).orderBy("label").collect().toSeq
    assert(a == b)
  }
}
