package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k heap state: keeps the k best (score desc, id asc)
  * pairs seen so far. */
final class TopKBuffer(val k: Int) {
  // parallel arrays, heap-ordered lazily: we just keep them unsorted and
  // bounded — k is small, so insertion scans are cheap and merge is trivial
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0
  private def worstIdx: Int = {
    var w = 0
    var i = 1
    while (i < size) {
      if (scores(i) < scores(w) ||
        (scores(i) == scores(w) && ids(i) > ids(w))) w = i
      i += 1
    }
    w
  }
  def insert(score: Double, id: Long): Unit = {
    if (size < k) { scores(size) = score; ids(size) = id; size += 1 }
    else {
      val w = worstIdx
      if (score > scores(w) || (score == scores(w) && id < ids(w))) {
        scores(w) = score; ids(w) = id
      }
    }
  }
  /** Indices sorted best-first (score desc, id asc). */
  def sortedIdx: Array[Int] =
    (0 until size).sortBy(i => (-scores(i), ids(i))).toArray
}

/** Per-group top-k (score, id) pairs as a native
  * TypedImperativeAggregate (SURVEY §4's one custom-aggregate
  * candidate). Returns array<struct<score double, id bigint>> sorted
  * best-first with deterministic (score desc, id asc) order.
  *
  * Compared to the window row_number() formulation, the aggregate
  * keeps O(k) state per group and never materializes or sorts the full
  * candidate set — with partial aggregation the map side already
  * reduces each partition to k rows per group before the shuffle, so
  * at 100 TB the exchange carries k·groups rows instead of all
  * candidates. */
case class TopKByScore(scoreExpr: Expression, idExpr: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (scoreExpr.dataType == DoubleType && idExpr.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "top_k_by_score requires (double score, bigint id), got " +
          s"(${scoreExpr.dataType.sql}, ${idExpr.dataType.sql})")
  override def dataType: DataType = ArrayType(new StructType()
    .add("score", DoubleType).add("id", LongType), containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    val id = idExpr.eval(input)
    if (s != null && id != null)
      b.insert(s.asInstanceOf[Double], id.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKBuffer, o: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < o.size) { b.insert(o.scores(i), o.ids(i)); i += 1 }
    b
  }

  override def eval(b: TopKBuffer): Any = {
    val idx = b.sortedIdx
    new GenericArrayData(idx.map { i =>
      InternalRow(b.scores(i), b.ids(i))
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    var i = 0
    while (i < b.size) { out.writeDouble(b.scores(i)); out.writeLong(b.ids(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new TopKBuffer(k)
    val n = in.readInt()
    var i = 0
    while (i < n) { b.insert(in.readDouble(), in.readLong()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKByScore =
    copy(scoreExpr = c(0), idExpr = c(1))
  override def prettyName: String = "top_k_by_score"
}

object TopKByScore {
  def top_k_by_score(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByScore(ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())
}
