package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the formatted physical plan (and optionally times) for named
  * SparkEntry queries. Usage:
  *   runMain graft.tools.PlanDump <sfDir> <query1> [query2 ...]
  * Add `--time` to also execute each query and report seconds.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val time = args.contains("--time")
    val rest = args.filterNot(_ == "--time")
    val sfDir = rest.head
    val names = rest.tail
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      println(s"========== $name ==========")
      // time CONSTRUCTION + execution: eager operators (x4_cluster's
      // propagation rounds, simhashTopK's certificate) do their real
      // work inside queries() — timing only count() would miss it
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      if (time) {
        val n = df.count()
        println(f"[time] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
      }
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
