package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import graft.gen.DataGen

/** End-to-end streaming smoke: rate-source order events (reference
  * producer distributions) → stream-static broadcast enrichment against
  * a generated customers table → id-stamped parquet sink, then reads
  * the sink back and prints one JSON status line.
  *
  * Usage: runMain graft.streaming.StreamDemo [seconds] [rowsPerSecond]
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val runSeconds = args.headOption.map(_.toInt).getOrElse(10)
    val rps = args.lift(1).map(_.toInt).getOrElse(500)
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-stream-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("graft-demo")
    val out = s"$dir/out"; val ck = s"$dir/ck"
    val customers = DataGen.customersBatch(spark, 10000)
    val q = StreamPipeline.run(spark, StreamPipeline.RateOrders(rps), customers,
      out, ck, Trigger.ProcessingTime("1 second"))
    Thread.sleep(runSeconds * 1000L)
    q.stop()
    val sink = spark.read.parquet(out)
    val n = sink.count()
    val nCities = sink.select("city").distinct().count()
    val idsDistinct = sink.select("id").distinct().count()
    println(s"""{"demo":"stream","rows":$n,"cities":$nCities,"distinct_ids":$idsDistinct,"join_plan_broadcast":${sink.columns.mkString(",").contains("customer_name")}}""")
    spark.stop()
  }
}
