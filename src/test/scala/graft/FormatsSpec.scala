package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.sources.{Formats, Tables}

/** Storage breadth: every built-in format round-trips the corpus
  * byte-identically, and the columnar formats prune/push down. */
class FormatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def docs = Tables(spark, SparkTestBase.sf0001, "documents")

  test("documents round-trip through every supported format") {
    import spark.implicits._
    // include an EMPTY document: csv's default writer emits it as a
    // bare empty field, which reads back as NULL — the quoted
    // emptyValue in Formats.write must preserve it
    val src = docs.unionByName(Seq((99999L, "", "en", "srcE", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val expected = src.collect().toSet
    Formats.supported.foreach { fmt =>
      val dir = java.nio.file.Files.createTempDirectory(s"graft-fmt-$fmt").toString
      Formats.write(src, dir, fmt)
      val back = Formats.read(spark, dir, fmt, src.schema)
      assert(back.schema === src.schema, s"$fmt schema drift")
      assert(back.collect().toSet === expected, s"$fmt content drift")
    }
  }

  test("partitioned parquet write prunes partitions at plan time") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fmt-part").toString
    val ev = Tables(spark, SparkTestBase.sf0001, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    Formats.write(ev, dir, "parquet", partitionBy = Seq("event_type"))
    val q = Formats.read(spark, dir, "parquet")
      .filter(col("event_type") === "click")
    val scan = q.queryExecution.executedPlan
      .collectFirst { case s: FileSourceScanExec => s }.get
    // the filter became a PARTITION filter: directories skipped, not rows
    assert(scan.partitionFilters.exists(_.toString.contains("event_type")))
    assert(scan.relation.location.inputFiles.length >
      scan.selectedPartitions.totalNumberOfFiles,
      "pruning should select a strict subset of files")
    val total = ev.filter(col("event_type") === "click").count()
    assert(q.count() === total && total > 0)
  }

  test("orc predicate pushdown reaches the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fmt-orc").toString
    Formats.write(docs, dir, "orc")
    val q = Formats.read(spark, dir, "orc", docs.schema)
      .filter(col("doc_id") >= 40)
    val scan = q.queryExecution.executedPlan
      .collectFirst { case s: FileSourceScanExec => s }.get
    assert(scan.metadata("PushedFilters").contains("GreaterThanOrEqual(doc_id,40)"))
    assert(q.count() === docs.filter(col("doc_id") >= 40).count())
  }
}
