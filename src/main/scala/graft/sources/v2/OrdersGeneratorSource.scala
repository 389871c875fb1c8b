package graft.sources.v2

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform, Expression => V2Expression}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector generating the reference producer's order
  * workload (`orders-generator/main.go:82-84,104-108`) as a
  * first-class Spark source:
  *
  * {{{
  *   spark.read.format("graft_orders")
  *     .option("numRows", 1000000).option("numPartitions", 64).load()
  * }}}
  *
  * This is the connector-integration axis of the engine (alongside the
  * custom expressions and the TypedImperativeAggregate): Spark plans
  * the scan like any table — `numPartitions` range splits become
  * independent [[InputPartition]]s (the unit of cluster parallelism),
  * and column pruning reaches the generator through
  * [[SupportsPushDownRequiredColumns]], so `select(customerID)` never
  * computes an md5 order id (visible as ReadSchema in
  * `.explain("formatted")`).
  *
  * Generation is a pure function of the row id (md5-derived, same
  * 60-bit integer construction as the dedup family) — NOT `rand()` —
  * so any partitioning, retry, or speculative re-execution of a split
  * produces identical rows. Distributions mirror the reference
  * producer: customerID uniform in [1, 10000], amount uniform in
  * [20, 499], orderID a 32-hex-char unique id.
  */
class OrdersGeneratorSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft_orders"
  // writes carry the frame's own schema into getTable
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Option(options.get("table")) match {
      case Some(t) => GraftStore.schemaOf(t)
      case None    => OrdersGeneratorSource.schema
    }
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    // properties arrive with the caller's original key case
    val opts = new CaseInsensitiveStringMap(properties)
    Option(opts.get("table")) match {
      case Some(t) =>
        val s = if (schema != null && schema.nonEmpty) schema else GraftStore.schemaOf(t)
        new GraftMemTable(t, s)
      case None =>
        new OrdersGenTable(
          opts.getOrDefault("numrows", "1000").toLong,
          opts.getOrDefault("numpartitions", "4").toInt,
          opts.getBoolean("columnar", false))
    }
  }
}

object OrdersGeneratorSource {
  val schema: StructType = new StructType()
    .add("id", LongType, nullable = false)
    .add("orderID", StringType, nullable = false)
    .add("customerID", LongType, nullable = false)
    .add("amount", LongType, nullable = false)

  // per-thread digest: MessageDigest.getInstance is a provider lookup,
  // far too expensive per generated row (three hashes per row)
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val hexDigits = "0123456789abcdef".toCharArray

  /** 60-bit md5 integer of `tag:id` — deterministic, uniform, and the
    * same construction the SQL surface exposes (`conv(substring(
    * md5(x),1,15),16,10)`), so generated data is reproducible from
    * pure SQL too. */
  private[v2] def hash60(tag: String, id: Long): Long = {
    val d = md.get()
    d.reset()
    val bytes = d.digest(s"$tag:$id".getBytes("UTF-8"))
    var acc = 0L
    var i = 0
    while (i < 7) { acc = (acc << 8) | (bytes(i) & 0xffL); i += 1 }
    (acc << 4) | ((bytes(7) & 0xf0L) >> 4)
  }

  private[v2] def orderId(id: Long): String = {
    val d = md.get()
    d.reset()
    val bytes = d.digest(id.toString.getBytes("UTF-8"))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(i * 2) = hexDigits((bytes(i) >> 4) & 0xf)
      out(i * 2 + 1) = hexDigits(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  private[v2] def customerId(id: Long): Long = hash60("cust", id) % 10000L + 1L
  private[v2] def amount(id: Long): Long = hash60("amt", id) % 480L + 20L
}

private[v2] class OrdersGenTable(numRows: Long, numPartitions: Int,
                                 columnar: Boolean = false)
    extends Table with SupportsRead {
  override def name(): String = s"graft_orders($numRows)"
  override def schema(): StructType = OrdersGeneratorSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new OrdersGenScanBuilder(numRows, numPartitions, columnar)
}

private[v2] class OrdersGenScanBuilder(numRows: Long, numPartitions: Int,
                                       columnar: Boolean = false)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownAggregates {
  private var required: StructType = OrdersGeneratorSource.schema
  private var pushed: Array[Filter] = Array.empty
  private var lo: Long = 0L
  private var hi: Long = Long.MaxValue
  private var aggSchema: Option[StructType] = None
  private var aggFuncs: Seq[AggregateFunc] = Nil

  /** COUNT/MIN/MAX over `id` — the generator's dense row cursor — are
    * CLOSED-FORM over the (filter-pruned) id range: count = end−start,
    * min = start, max = end−1. Complete pushdown: the scan answers
    * with ONE row and generates NOTHING — the connector equivalent of
    * answering count(*) from table statistics instead of scanning
    * 100 TB. Anything touching the md5-derived payload columns stays
    * in Spark (their aggregates genuinely require generation). Spark
    * pushes filters BEFORE aggregates, so the range is already
    * pruned. */
  private def isId(e: V2Expression): Boolean = e match {
    case r: NamedReference => r.fieldNames.toSeq == Seq("id")
    case _ => false
  }
  private def canPush(agg: Aggregation): Boolean =
    agg.groupByExpressions().isEmpty && agg.aggregateExpressions().nonEmpty &&
      agg.aggregateExpressions().forall {
        case _: CountStar => true
        // id is never null, so Count(id) = CountStar; DISTINCT stays up
        case c: Count => !c.isDistinct && isId(c.column)
        case m: Min => isId(m.column)
        case m: Max => isId(m.column)
        case _ => false
      }
  override def supportCompletePushDown(agg: Aggregation): Boolean = canPush(agg)
  override def pushAggregation(agg: Aggregation): Boolean = {
    if (!canPush(agg)) return false
    aggFuncs = agg.aggregateExpressions().toSeq
    aggSchema = Some(StructType(aggFuncs.zipWithIndex.map {
      case (_: CountStar, i) => StructField(s"agg_$i", LongType, nullable = false)
      case (_: Count, i)     => StructField(s"agg_$i", LongType, nullable = false)
      case (_, i)            => StructField(s"agg_$i", LongType, nullable = true)
    }))
    true
  }
  override def pruneColumns(requiredSchema: StructType): Unit =
    // an empty projection (e.g. count(*)) still needs row COUNTS;
    // keep the zero-column schema as-is, the reader emits empty rows
    required = requiredSchema
  /** Range predicates on `id` — the generator's row cursor — prune the
    * id range EXACTLY, so split planning shrinks with the predicate and
    * the accepted filters need no post-scan re-evaluation. Everything
    * else (customerID/amount are hash functions of id) stays post-scan. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // saturating increment: a bare `v + 1` wraps at Long.MaxValue, so
    // `id > MaxValue` (satisfiable by nothing) would accept-then-match
    // EVERYTHING and `id <= MaxValue` (satisfiable by all) nothing.
    // Saturation keeps both exact: ids live in [0, numRows) < MaxValue,
    // so the unreachable MaxValue endpoint never matters.
    def inc(v: Long): Long = if (v == Long.MaxValue) Long.MaxValue else v + 1
    def bound(f: Filter): Boolean = f match {
      case EqualTo("id", n: Number) =>
        lo = math.max(lo, n.longValue); hi = math.min(hi, inc(n.longValue)); true
      case GreaterThan("id", n: Number) =>
        lo = math.max(lo, inc(n.longValue)); true
      case GreaterThanOrEqual("id", n: Number) =>
        lo = math.max(lo, n.longValue); true
      case LessThan("id", n: Number) =>
        hi = math.min(hi, n.longValue); true
      case LessThanOrEqual("id", n: Number) =>
        hi = math.min(hi, inc(n.longValue)); true
      case IsNotNull("id") => true // id is never null — trivially exact
      case _ => false
    }
    val (acc, rest) = filters.partition(bound)
    pushed = acc
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = aggSchema match {
    case Some(schema) =>
      // values computed on the DRIVER at plan time — the reader ships
      // a literal row, no AggregateFunc crosses the wire
      val start = math.max(0L, lo)
      val end = math.min(numRows, hi)
      val n = math.max(0L, end - start)
      val values: Array[Any] = aggFuncs.map {
        case _: CountStar | _: Count => n: Any
        case _: Min => if (n > 0) (start: Any) else null
        case _ => if (n > 0) (end - 1: Any) else null
      }.toArray
      new OrdersGenAggScan(values, schema, start, end, aggFuncs)
    case None =>
      new OrdersGenScan(numRows, numPartitions, required, lo, hi, columnar)
  }
}

/** The completely-pushed-down aggregate answer: one partition, one
  * row, zero generation. */
private[v2] class OrdersGenAggScan(values: Array[Any], aggSchema: StructType,
                                   start: Long, end: Long,
                                   funcs: Seq[AggregateFunc])
    extends Scan with Batch with Serializable {
  override def readSchema(): StructType = aggSchema
  override def description(): String =
    s"graft_orders PushedAggregates: [${funcs.map(_.toString).mkString(", ")}] " +
      s"over [$start, $end)"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(OrdersGenAggPartition(values))
  override def createReaderFactory(): PartitionReaderFactory =
    new OrdersGenAggReaderFactory
}

private[v2] case class OrdersGenAggPartition(values: Array[Any]) extends InputPartition

private[v2] class OrdersGenAggReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val vals = p.asInstanceOf[OrdersGenAggPartition].values
      private var emitted = false
      override def next(): Boolean = if (emitted) false else { emitted = true; true }
      override def get(): InternalRow =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
      override def close(): Unit = ()
    }
}

private[v2] class OrdersGenScan(numRows: Long, numPartitions: Int,
                                required: StructType,
                                lo: Long, hi: Long,
                                columnar: Boolean = false) extends Scan with Batch {
  private val start = math.max(0L, lo)
  private val end = math.min(numRows, hi)
  override def readSchema(): StructType = required
  override def description(): String =
    s"graft_orders PushedIdRange: [$start, $end) of $numRows"
  override def toBatch: Batch = this
  /** Split size stays anchored to numRows/numPartitions, so a predicate
    * selecting a fraction of the id space plans proportionally FEWER
    * splits rather than the same count of thinner ones. */
  override def planInputPartitions(): Array[InputPartition] =
    if (end <= start) Array.empty
    else {
      val per = math.max(1L, (numRows + numPartitions - 1) / numPartitions)
      (start until end by per)
        .map(s => OrdersGenPartition(s, math.min(s + per, end)))
        .toArray
    }
  override def createReaderFactory(): PartitionReaderFactory =
    new OrdersGenReaderFactory(required, columnar)
  // accepted filters are removed from the streaming plan too — the
  // micro-batch flavor must honor the same id range or silently
  // return unfiltered rows. The streaming path stays row-based: a
  // micro-batch is rowsPerBatch rows, usually far below the vector
  // capacity, so columnar batching buys nothing there.
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new OrdersGenMicroBatch(numRows, numPartitions, required, checkpointLocation, lo, hi)
}

private[v2] object OrdersGenScan {
  def split(start: Long, end: Long, numPartitions: Int): Array[InputPartition] = {
    val total = end - start
    val per = math.max(1L, (total + numPartitions - 1) / numPartitions)
    (start until end by per)
      .map(s => OrdersGenPartition(s, math.min(s + per, end)))
      .toArray
  }
}

/** Streaming flavor: the row-id cursor IS the offset, so a micro-batch
  * is a deterministic id range — replaying any (start, end) offset pair
  * regenerates byte-identical rows, which makes the source exactly-once
  * under checkpoint recovery by construction (the property the rate
  * source has, with the reference producer's payload). `numRows` acts
  * as rows-per-trigger; an AvailableNow run processes one such batch.
  *
  * The offered high-water is persisted in the source's checkpoint
  * directory at OFFER time (`latestOffset`) and re-read on
  * construction: a restarted query may snapshot `latestOffset()`
  * BEFORE Spark hands the source its restored offset (the
  * AvailableNow wrapper does exactly that), and `commit()` for a
  * run's final batch only arrives at the NEXT run — so a source that
  * counts in memory would re-offer the committed range and the
  * restarted run would process an empty batch. Persisting at offer
  * time means a crash between offer and commit SKIPS the unprocessed
  * ids on restart — for a synthetic generator that is the right
  * trade (never replay, ids are free); a source fronting real data
  * would persist nothing and rely on the restored offset instead. */
private[v2] class OrdersGenMicroBatch(rowsPerBatch: Long, numPartitions: Int,
                                      required: StructType,
                                      checkpointLocation: String,
                                      lo: Long = 0L,
                                      hi: Long = Long.MaxValue) extends MicroBatchStream {
  import org.apache.hadoop.fs.Path
  private case class GenOffset(v: Long) extends Offset {
    override def json(): String = v.toString
  }
  private val cursorPath = new Path(checkpointLocation, "graft_orders_cursor")
  // the SESSION hadoop conf (newHadoopConf merges spark.hadoop.* with
  // runtime spark.conf.set overrides), NOT a bare Configuration: the
  // checkpoint may live on object storage configured either way
  private val fs = cursorPath.getFileSystem(
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
  private var cursor: Long =
    if (fs.exists(cursorPath)) {
      val in = fs.open(cursorPath)
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        "UTF-8").trim.toLong
      finally in.close()
    } else 0L
  private def persist(v: Long): Unit = {
    val out = fs.create(cursorPath, true)
    try out.write(v.toString.getBytes("UTF-8"))
    finally out.close()
  }
  override def initialOffset(): Offset = GenOffset(0L)
  override def latestOffset(): Offset = {
    cursor += rowsPerBatch
    persist(cursor)
    GenOffset(cursor)
  }
  override def deserializeOffset(json: String): Offset = {
    val v = json.toLong
    cursor = math.max(cursor, v) // never re-offer data behind the restored offset
    GenOffset(v)
  }
  // clamp each batch's id range to the pushed [lo, hi): the offset
  // cursor keeps advancing, batches outside the range plan empty
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = math.max(start.asInstanceOf[GenOffset].v, lo)
    val e = math.min(end.asInstanceOf[GenOffset].v, hi)
    if (e <= s) Array.empty else OrdersGenScan.split(s, e, numPartitions)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new OrdersGenReaderFactory(required)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[v2] case class OrdersGenPartition(start: Long, end: Long)
    extends InputPartition

private[v2] class OrdersGenReaderFactory(required: StructType,
                                         columnar: Boolean = false)
    extends PartitionReaderFactory {
  /** Columnar is opt-in (`.option("columnar", true)`): the scan node
    * then emits [[org.apache.spark.sql.vectorized.ColumnarBatch]]es
    * and Spark plans a ColumnarToRow boundary above it — the
    * high-throughput shape every file source uses (row-at-a-time
    * `InternalRow` pays a per-row virtual call and per-row allocation;
    * the vectorized path amortizes both over `VectorCapacity` rows and
    * lets the boundary copy land in codegen). */
  override def supportColumnarReads(partition: InputPartition): Boolean = columnar

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[OrdersGenPartition]
    // resolve the projection ONCE per split, not per row
    val gens: Array[Long => Any] = required.fieldNames.map {
      case "id" => (id: Long) => id
      case "orderID" =>
        (id: Long) => UTF8String.fromString(OrdersGeneratorSource.orderId(id))
      case "customerID" => (id: Long) => OrdersGeneratorSource.customerId(id)
      case "amount" => (id: Long) => OrdersGeneratorSource.amount(id)
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
    new PartitionReader[InternalRow] {
      private var id = p.start - 1
      override def next(): Boolean = { id += 1; id < p.end }
      override def get(): InternalRow =
        InternalRow.fromSeq(gens.map(g => g(id)).toIndexedSeq)
      override def close(): Unit = ()
    }
  }

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
    import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
    val p = partition.asInstanceOf[OrdersGenPartition]
    val cap = OrdersGenReaderFactory.VectorCapacity
    // per-column fill resolved ONCE per split (mirror of the row
    // reader's `gens`): the hot loop is fill(vector, slot, id) with no
    // name dispatch per cell
    val fills: Array[(OnHeapColumnVector, Int, Long) => Unit] =
      required.fieldNames.map {
        case "id" => (v: OnHeapColumnVector, i: Int, id: Long) => v.putLong(i, id)
        case "orderID" => (v: OnHeapColumnVector, i: Int, id: Long) => {
          val b = OrdersGeneratorSource.orderId(id).getBytes("UTF-8")
          v.putByteArray(i, b, 0, b.length); ()
        }
        case "customerID" => (v: OnHeapColumnVector, i: Int, id: Long) =>
          v.putLong(i, OrdersGeneratorSource.customerId(id))
        case "amount" => (v: OnHeapColumnVector, i: Int, id: Long) =>
          v.putLong(i, OrdersGeneratorSource.amount(id))
        case other => throw new IllegalArgumentException(s"unknown column $other")
      }
    new PartitionReader[ColumnarBatch] {
      private var cursor = p.start
      // vectors are allocated once and REFILLED per batch (reset, not
      // reallocate) — the standard vectorized-reader lifecycle; the
      // consumer finishes a batch before next() is called again. A
      // zero-column projection (count(*)) still reports row counts
      // through ColumnarBatch.numRows.
      private val vectors = required.fields.map(f =>
        new OnHeapColumnVector(cap, f.dataType))
      private val batch =
        new ColumnarBatch(vectors.map(_.asInstanceOf[ColumnVector]))
      override def next(): Boolean =
        if (cursor >= p.end) false
        else {
          val n = math.min(cap.toLong, p.end - cursor).toInt
          var c = 0
          while (c < vectors.length) {
            vectors(c).reset()
            val fill = fills(c)
            var i = 0
            while (i < n) { fill(vectors(c), i, cursor + i); i += 1 }
            c += 1
          }
          batch.setNumRows(n)
          cursor += n
          true
        }
      override def get(): ColumnarBatch = batch
      override def close(): Unit = batch.close()
    }
  }
}

private[v2] object OrdersGenReaderFactory {
  /** Rows per ColumnarBatch — Spark's own parquet-reader default. */
  val VectorCapacity = 4096
}
