package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Uniform batch write/read over Spark's built-in columnar and text
  * formats — the storage-breadth axis of the source/sink surface
  * (reference C3–C5 cover csv/json/jdbc reads; this adds the write
  * side plus orc, and partitioned layouts for pruning).
  *
  * Format quirks handled here so callers cannot get them wrong:
  *  - csv is written HEADERLESS (the reference's `bcp` load shape,
  *    `customers.csv`) and must be read back with an explicit schema —
  *    csv carries no types;
  *  - json preserves values but not types (everything re-infers) — an
  *    explicit read schema restores longs vs doubles exactly;
  *  - parquet/orc are self-describing and support predicate pushdown;
  *    `partitionBy` produces hive-style directories that partition
  *    pruning eliminates wholesale at plan time (the 100 TB layout:
  *    partition on the coarse filter column, let the scan skip
  *    directories, not rows).
  */
object Formats {

  val supported: Seq[String] = Seq("parquet", "orc", "csv", "json")

  def write(df: DataFrame, path: String, format: String,
            partitionBy: Seq[String] = Nil): Unit = {
    require(supported.contains(format), s"unsupported format $format")
    val w0 = df.write.mode("overwrite")
    val w = if (partitionBy.nonEmpty) w0.partitionBy(partitionBy: _*) else w0
    format match {
      // empty string vs NULL must survive the trip: write empties
      // QUOTED ("") and nulls as an explicit \N sentinel — with the
      // defaults both land as a bare empty field and read back NULL
      case "csv" => w.option("header", "false")
        .option("emptyValue", "\"\"").option("nullValue", "\\N").csv(path)
      case "json" => w.json(path)
      case "orc" => w.orc(path)
      case "parquet" => w.parquet(path)
    }
  }

  /** Bucketed catalog-table write — the CO-LOCATED join layout: both
    * sides of a recurring join bucketed on the join key into the SAME
    * bucket count hash-partition identically at write time, so the
    * join plans with NO shuffle exchange on either side — at 100 TB
    * this converts every repeated fact/fact join on the key into a
    * local merge per bucket. `bucketBy` requires `saveAsTable`:
    * bucket metadata lives in the catalog, not in the files (a plain
    * path read sees ordinary parquet and re-shuffles). Optional
    * `sortBy` pre-sorts within buckets, letting single-file buckets
    * skip the merge sort too. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    bucketCols: Seq[String], sortCols: Seq[String] = Nil,
                    format: String = "parquet"): Unit = {
    require(supported.contains(format), s"unsupported format $format")
    val w0 = df.write.mode("overwrite").format(format)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    val w = if (sortCols.nonEmpty) w0.sortBy(sortCols.head, sortCols.tail: _*) else w0
    w.saveAsTable(table)
  }

  /** Raw media ingestion via the built-in `binaryFile` source — how
    * image/audio/video blobs ENTER the multimodal pipeline: one row
    * per file with (path, modificationTime, length, content), globbed
    * and length-capped at the SOURCE (`pathGlobFilter`, a length
    * filter pushed into the file listing) so oversized assets never
    * reach an executor. Downstream is the existing X5 surface: the
    * content column is the `media` bytes the decode/feature/embed
    * kernels consume. */
  def readBinary(spark: SparkSession, dir: String, glob: String = "*",
                 maxBytes: Long = 64L * 1024 * 1024): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .filter(org.apache.spark.sql.functions.col("length") <= maxBytes)

  /** Small-file compaction — the operational fix for the classic
    * many-small-files problem (a streaming sink or over-parallel write
    * leaves thousands of KB-sized files; every later scan pays task
    * scheduling and footer reads per file). Rewrites `inPath` to
    * `outPath` in `targetBytes`-sized output files: per-directory file
    * count is estimated from the INPUT's on-disk bytes, so compression
    * ratio carries over, and a round-robin repartition spreads rows
    * evenly (no skewed leftovers).
    *
    * PARTITION-PRESERVING: a hive-partitioned layout (the kind
    * [[write]]'s own `partitionBy` produces) is walked recursively and
    * each leaf data directory is compacted IN PLACE OF ITSELF under
    * `outPath` — `lang=en/` stays `lang=en/`, so partition values ride
    * in the preserved directory names, partition pruning still works on
    * the output, and a huge partition still splits into multiple
    * target-sized files. A flat directory is simply the one-leaf case.
    * Within-leaf row order is not preserved (columnar formats never
    * promise it). Returns (files_before, files_after). */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              format: String = "parquet",
              targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    import org.apache.hadoop.fs.{FileStatus, Path}
    val fs = new Path(inPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // canonicalized guard: textual inequality would wave through
    // trailing slashes / relative spellings of the SAME directory, and
    // the overwrite write would then delete the input it is lazily
    // reading. Also refuse nesting either way — writing under the tree
    // being walked (or truncating an ancestor) is the same corruption.
    val inQ = fs.makeQualified(new Path(inPath)).toUri.getPath
    val outQ = fs.makeQualified(new Path(outPath)).toUri.getPath
    require(outQ != inQ && !outQ.startsWith(inQ + "/") && !inQ.startsWith(outQ + "/"),
      s"compact rewrites to a DIFFERENT, non-nested directory (in=$inQ out=$outQ)")
    def hidden(p: Path) = p.getName.startsWith("_") || p.getName.startsWith(".")
    // leaves = every directory that directly holds data files (a flat
    // input is one leaf: its own root)
    def walk(dir: Path): Seq[(Path, Seq[FileStatus])] = {
      val entries = fs.listStatus(dir).filterNot(s => hidden(s.getPath))
      val files = entries.filter(_.isFile).toSeq
      (if (files.nonEmpty) Seq(dir -> files) else Nil) ++
        entries.filter(_.isDirectory).toSeq.flatMap(d => walk(d.getPath))
    }
    val inRoot = fs.makeQualified(new Path(inPath))
    val leaves = walk(inRoot)
    leaves.foreach { case (dir, files) =>
      val rel = dir.toUri.getPath.stripPrefix(inQ).stripPrefix("/")
      val dest = if (rel.isEmpty) outPath else s"$outPath/$rel"
      val nOut = math.max(1,
        math.ceil(files.map(_.getLen).sum.toDouble / targetBytes).toInt)
      // read the leaf directly: partition values live in the preserved
      // directory names, not in the rows, on both sides of the rewrite
      write(read(spark, dir.toString, format).repartition(nOut), dest, format)
    }
    val before = leaves.map(_._2.size).sum
    val after = walk(fs.makeQualified(new Path(outPath))).map(_._2.size).sum
    (before, after)
  }

  def read(spark: SparkSession, path: String, format: String,
           schema: StructType = null): DataFrame = {
    require(supported.contains(format), s"unsupported format $format")
    // csv carries no types: a schema-less read would silently yield
    // all-string _c0.._cN columns, the exact trap this module exists
    // to close
    require(format != "csv" || schema != null,
      "csv reads require an explicit schema")
    val r0 = spark.read
    val r = if (schema != null) r0.schema(schema) else r0
    format match {
      // mirror of write: quoted "" parses as empty string (reader
      // emptyValue must stay default — setting it substitutes the
      // LITERAL option text), \N is NULL
      case "csv" => r.option("header", "false")
        .option("nullValue", "\\N").csv(path)
      case "json" => r.json(path)
      case "orc" => r.orc(path)
      case "parquet" => r.parquet(path)
    }
  }
}
