package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc SQL entry point: registers the driver corpus tables as temp
  * views plus the graft custom functions, runs each argument as a SQL
  * statement, and prints the result.
  *
  * Usage: runMain graft.tools.SqlShell <sfDir> "SELECT ..." ["SELECT ..."]
  */
object SqlShell {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "16384")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftFunctions.register(spark)
    graft.sources.Tables.names.foreach { n =>
      graft.sources.Tables(spark, sfDir, n).createOrReplaceTempView(n)
    }
    args.tail.foreach { sql =>
      println(s"graft> $sql")
      spark.sql(sql).show(20, truncate = false)
    }
    spark.stop()
  }
}
