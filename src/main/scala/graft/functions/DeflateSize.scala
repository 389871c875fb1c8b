package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed size of a string's UTF-8 bytes — the signal
  * behind the compression-ratio quality filter (highly repetitive or
  * templated text compresses far below natural prose; near-random
  * noise barely compresses at all). Level and wrapping are pinned
  * (level 6, raw stream) so the size is a pure function of the bytes
  * within a JVM; the ratio built on it is used for ORDERING and
  * THRESHOLDS, not as a portable checksum — no SQL engine exposes
  * deflate, so this operator is spec-tested rather than
  * oracle-matched.
  *
  * Native `Expression` with `doGenCode` (one static call per row, no
  * UDF boxing) — the hot loop lives in zlib, not in generated code.
  */
case class DeflateSize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"deflate_size requires a string argument, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    DeflateSize.compressedSize(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DeflateSize.compressedSize($c.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): DeflateSize =
    copy(child = newChild)
}

object DeflateSize {

  /** Deflater holds native zlib state and is single-thread-confined —
    * which a ThreadLocal satisfies exactly (each Spark task runs on one
    * thread). Reusing via reset() instead of allocating per row matters
    * for SHORT documents, where native init/end would otherwise
    * dominate the compression itself: at corpus scale a per-row
    * Deflater is billions of JNI malloc/free pairs. Level 6 / nowrap
    * stay pinned in the initializer; reset() preserves both. */
  private val deflater: ThreadLocal[java.util.zip.Deflater] =
    ThreadLocal.withInitial(() => new java.util.zip.Deflater(6, true))

  /** Size of the raw (nowrap) DEFLATE stream at the pinned level. */
  def compressedSize(bytes: Array[Byte]): Long = {
    val d = deflater.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var n = 0L
    while (!d.finished()) n += d.deflate(buf)
    n
  }

  def deflate_size(c: Column): Column =
    ColumnBridge.column(DeflateSize(ColumnBridge.expression(c)))
}
