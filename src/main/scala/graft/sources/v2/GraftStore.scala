package graft.sources.v2

import java.util.{Map => JMap}

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, IsNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** In-memory table registry backing the `graft_orders` connector's
  * WRITE path: `df.write.format("graft_orders").option("table", "t")`
  * lands rows here, and `spark.read.format("graft_orders")
  * .option("table", "t")` reads them back — the round-trip half of the
  * connector axis (the generator half is [[OrdersGeneratorSource]]).
  *
  * This is a dev/test sink by design (the reference's document-store
  * sink role, `README.md:107-131`, minus the managed service): rows
  * live on the driver and travel inside [[WriterCommitMessage]]s /
  * [[InputPartition]]s, exactly like Spark's own in-memory V2 test
  * sources. Commit is all-or-nothing — rows only become visible in
  * [[BatchWrite.commit]] after every task succeeded, so a failed or
  * speculatively-re-executed task never half-publishes (each task's
  * rows ride its OWN commit message; duplicates from speculation are
  * resolved by Spark delivering one message per partition).
  */
object GraftStore {
  private val tables = TrieMap.empty[String, (StructType, Vector[InternalRow])]
  private val epochs = TrieMap.empty[String, Long]

  def schemaOf(name: String): StructType =
    tables.get(name).map(_._1).getOrElse(
      throw new IllegalArgumentException(
        s"graft_orders in-memory table '$name' does not exist — write it first " +
          "or pass an explicit schema"))

  def rowsOf(name: String): Vector[InternalRow] =
    tables.get(name).map(_._2).getOrElse(Vector.empty)

  def exists(name: String): Boolean = tables.contains(name)

  def append(name: String, schema: StructType, rows: Seq[InternalRow]): Unit =
    tables.synchronized {
      tables.get(name).foreach { case (stored, _) =>
        // stored rows are UnsafeRows decoded BY POSITION under the
        // registry schema — silently swapping it would reinterpret old
        // bytes under new field order/types (garbage, not an error)
        require(stored == schema,
          s"graft_orders table '$name' exists with schema ${stored.simpleString}; " +
            s"append with ${schema.simpleString} is not allowed — overwrite instead")
      }
      val cur = tables.get(name).map(_._2).getOrElse(Vector.empty)
      tables.put(name, (schema, cur ++ rows))
    }

  def truncate(name: String, schema: StructType): Unit =
    tables.put(name, (schema, Vector.empty))

  def drop(name: String): Unit = {
    tables.remove(name)
    epochs.keys.filter(_.startsWith(s"$name#")).foreach(epochs.remove)
  }

  /** Epoch-idempotent streaming append: Structured Streaming replays a
    * micro-batch whose commit never finished, so a re-delivered epoch
    * must be a no-op — exactly-once lands here, in the SINK's commit,
    * not in the writer tasks. The gate is keyed by (table, queryId):
    * epoch ids restart at 0 for every fresh checkpoint, so a
    * table-keyed gate would silently swallow a NEW query's early
    * batches after an old query had advanced the watermark. */
  def appendEpoch(name: String, queryId: String, schema: StructType,
                  epochId: Long, rows: Seq[InternalRow]): Unit =
    tables.synchronized {
      val k = s"$name#$queryId"
      if (epochs.get(k).forall(_ < epochId)) {
        append(name, schema, rows)
        epochs.put(k, epochId)
      }
    }

  /** Epoch-idempotent COMPLETE-mode commit: Structured Streaming plans
    * a complete-output aggregation sink through [[SupportsTruncate]] —
    * each epoch carries the FULL result snapshot and must REPLACE the
    * table, not append to it (an append-only read would show every
    * epoch's snapshot concatenated). Same (table, queryId) epoch gate
    * as [[appendEpoch]], so a replayed epoch is a no-op and the
    * truncate+append pair is atomic under the registry lock. */
  def replaceEpoch(name: String, queryId: String, schema: StructType,
                   epochId: Long, rows: Seq[InternalRow]): Unit =
    tables.synchronized {
      val k = s"$name#$queryId"
      if (epochs.get(k).forall(_ < epochId)) {
        truncate(name, schema)
        append(name, schema, rows)
        epochs.put(k, epochId)
      }
    }
}

/** The table surfaced for `option("table", name)`: batch read + batch
  * write (append / overwrite-as-truncate). */
private[v2] class GraftMemTable(tableName: String, tschema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft_mem($tableName)"
  override def schema(): StructType = tschema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.STREAMING_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MemScanBuilder(tableName, tschema)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new MemWriteBuilder(tableName, info.schema(), info.queryId())
}

/** Read-side pushdown for the stored-artifact serve path: a plan that
  * probes a stored sketch/pair/baseline table projects and filters
  * INSIDE the scan — partitions ship only the surviving columns of
  * the surviving rows, the property every serve query's "reads only
  * the stored artifact" claim rests on. Comparison filters evaluate
  * EXACTLY here (same int64/double/string semantics as the engine),
  * so Spark plans no re-filter for what was pushed; anything the
  * store can't prove (nested types, unknown predicates) is returned
  * to Spark for post-scan evaluation — correctness never depends on
  * the pushdown. */
private[v2] class MemScanBuilder(table: String, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownAggregates {
  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty
  private var nCounts = 0
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, rest) = filters.partition(MemScan.evaluable(full, _))
    pushed = ok
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** COUNT(*) with no grouping answers from the registry — the scan
    * ships ONE row and deserializes nothing (the [[OrdersGenerator
    * Source]] closed-form-count pattern on the store side). Complete
    * pushdown is safe because the pushed filters are evaluated
    * EXACTLY (see [[MemScan.eval]]); anything fancier (group-by,
    * distinct, other functions) stays in Spark. */
  private def canPushAgg(agg: Aggregation): Boolean =
    agg.groupByExpressions().isEmpty && agg.aggregateExpressions().nonEmpty &&
      agg.aggregateExpressions().forall {
        case _: CountStar => true
        case _ => false
      }
  override def supportCompletePushDown(agg: Aggregation): Boolean = canPushAgg(agg)
  override def pushAggregation(agg: Aggregation): Boolean = {
    if (!canPushAgg(agg)) return false
    nCounts = agg.aggregateExpressions().length
    true
  }

  override def build(): Scan =
    if (nCounts > 0) new MemCountScan(table, full, pushed, nCounts)
    else new MemScan(table, full, required, pushed)
}

/** The COUNT(*)-pushdown scan: one row, no data movement. */
private[v2] class MemCountScan(table: String, full: StructType,
                               pushed: Array[Filter], nCounts: Int)
    extends Scan with Batch {
  override def readSchema(): StructType =
    StructType((0 until nCounts).map(i =>
      org.apache.spark.sql.types.StructField(s"agg_$i", LongType, nullable = false)))
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_mem($table) PushedAggregates: [COUNT(*)]" +
      (if (pushed.isEmpty) "" else s" PushedFilters: [${pushed.mkString(", ")}]")
  override def planInputPartitions(): Array[InputPartition] = {
    val all = GraftStore.rowsOf(table)
    val n =
      if (pushed.isEmpty) all.size.toLong
      else all.count(r => pushed.forall(MemScan.eval(full, r, _))).toLong
    // ALWAYS one partition — an empty table still answers count 0
    Array(MemPartition(Seq(
      new GenericInternalRow(Array.fill[Any](nCounts)(n)))))
  }
  override def createReaderFactory(): PartitionReaderFactory = MemReaderFactory
}

private[v2] class MemScan(table: String, full: StructType,
                          required: StructType, pushed: Array[Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_mem($table) ReadSchema: ${required.fieldNames.mkString(",")}" +
      (if (pushed.isEmpty) "" else s" PushedFilters: [${pushed.mkString(", ")}]")
  override def planInputPartitions(): Array[InputPartition] = {
    val all = GraftStore.rowsOf(table)
    val kept =
      if (pushed.isEmpty) all
      else all.filter(r => pushed.forall(MemScan.eval(full, r, _)))
    val rows =
      if (required == full) kept
      else {
        val ords = required.fields.map(f => (full.fieldIndex(f.name), f.dataType))
        kept.map { r =>
          new GenericInternalRow(ords.map { case (i, dt) =>
            if (r.isNullAt(i)) null else r.get(i, dt)
          }): InternalRow
        }
      }
    if (rows.isEmpty) Array.empty
    else rows.grouped(math.max(1, (rows.size + 7) / 8)).map(MemPartition(_)).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = MemReaderFactory
}

private[v2] object MemScan {
  /** A filter is pushable iff the store can evaluate it EXACTLY:
    * comparison/null tests on flat int/long/timestamp/double/string
    * fields. Everything else goes back to Spark. */
  def evaluable(full: StructType, f: Filter): Boolean = {
    def flat(attr: String, v: Any): Boolean =
      full.fieldNames.contains(attr) && ((full(attr).dataType, v) match {
        case (LongType | IntegerType | TimestampType, _: Number) => true
        case (DoubleType, _: Number) => true
        case (StringType, _: String) => true
        case _ => false
      })
    f match {
      case EqualTo(a, v) => flat(a, v)
      case GreaterThan(a, v) => flat(a, v)
      case GreaterThanOrEqual(a, v) => flat(a, v)
      case LessThan(a, v) => flat(a, v)
      case LessThanOrEqual(a, v) => flat(a, v)
      case IsNotNull(a) => full.fieldNames.contains(a)
      case IsNull(a) => full.fieldNames.contains(a)
      case _ => false
    }
  }

  /** SQL comparison semantics: NULL fails every comparison. */
  private def cmp(full: StructType, row: InternalRow,
                  attr: String, v: Any): Option[Int] = {
    val i = full.fieldIndex(attr)
    if (row.isNullAt(i)) None
    else full(i).dataType match {
      case LongType | TimestampType =>
        Some(java.lang.Long.compare(row.getLong(i), v.asInstanceOf[Number].longValue))
      case IntegerType =>
        Some(java.lang.Long.compare(row.getInt(i).toLong, v.asInstanceOf[Number].longValue))
      case DoubleType =>
        // Spark's nanSafeCompareDoubles treats -0.0 == 0.0 (plain == short-
        // circuit) while java.lang.Double.compare orders -0.0 < 0.0; pushed
        // filters are not re-evaluated post-scan, so the == check must come
        // first or a stored -0.0 row is dropped by EqualTo(col, 0.0).
        val x = row.getDouble(i); val y = v.asInstanceOf[Number].doubleValue
        Some(if (x == y) 0 else java.lang.Double.compare(x, y))
      case StringType =>
        Some(row.getUTF8String(i).toString.compareTo(v.asInstanceOf[String]))
      case _ => None
    }
  }

  def eval(full: StructType, row: InternalRow, f: Filter): Boolean = f match {
    case EqualTo(a, v) => cmp(full, row, a, v).contains(0)
    case GreaterThan(a, v) => cmp(full, row, a, v).exists(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(full, row, a, v).exists(_ >= 0)
    case LessThan(a, v) => cmp(full, row, a, v).exists(_ < 0)
    case LessThanOrEqual(a, v) => cmp(full, row, a, v).exists(_ <= 0)
    case IsNotNull(a) => !row.isNullAt(full.fieldIndex(a))
    case IsNull(a) => row.isNullAt(full.fieldIndex(a))
    case _ => false
  }
}

private[graft] case class MemPartition(rows: Seq[InternalRow]) extends InputPartition

private[v2] object MemReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val it = partition.asInstanceOf[MemPartition].rows.iterator
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}

private[v2] class MemWriteBuilder(table: String, wschema: StructType,
                                  queryId: String)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  // mode("overwrite") plans TruncateAndAppend through here
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new MemBatchWrite(table, wschema, doTruncate)
    override def toStreaming: StreamingWrite =
      new MemStreamingWrite(table, wschema, queryId, doTruncate)
  }
}

/** Micro-batch sink flavor: same per-task buffering as the batch path,
  * made exactly-once by [[GraftStore.appendEpoch]]'s epoch gate. In
  * COMPLETE output mode (planned through truncate()) each epoch's
  * snapshot REPLACES the table via [[GraftStore.replaceEpoch]] — the
  * contract an aggregation stream (e.g. the daily histogram sketch)
  * needs to serve reads from the physically stored table. */
private[v2] class MemStreamingWrite(table: String, wschema: StructType,
                                    queryId: String, truncateEachEpoch: Boolean)
    extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    MemStreamWriterFactory
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val rows = messages.iterator.flatMap(_.asInstanceOf[MemCommit].rows).toVector
    if (truncateEachEpoch)
      GraftStore.replaceEpoch(table, queryId, wschema, epochId, rows)
    else GraftStore.appendEpoch(table, queryId, wschema, epochId, rows)
  }
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

private[v2] object MemStreamWriterFactory extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    MemWriterFactory.createWriter(partitionId, taskId)
}

private[v2] class MemBatchWrite(table: String, wschema: StructType, doTruncate: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    MemWriterFactory
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val rows = messages.iterator.flatMap(_.asInstanceOf[MemCommit].rows).toVector
    if (doTruncate) GraftStore.truncate(table, wschema)
    GraftStore.append(table, wschema, rows)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

/** Task rows ride the commit message; UnsafeRow copies are
  * self-contained and serializable, so this works beyond local mode. */
private[v2] case class MemCommit(rows: Vector[InternalRow]) extends WriterCommitMessage

private[v2] object MemWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = ArrayBuffer.empty[InternalRow]
      // the incoming row buffer is REUSED per row — copy or corrupt
      override def write(row: InternalRow): Unit = buf += row.copy()
      override def commit(): WriterCommitMessage = MemCommit(buf.toVector)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}
