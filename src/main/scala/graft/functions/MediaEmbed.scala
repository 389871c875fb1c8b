package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** STUB media encoder as a compiled kernel (SURVEY §2 X5): `dim`
  * doubles sampled from the payload at `stride`, scaled to [0, 1] —
  * v(i) = codepoint(text[(i·stride) mod len]) / 255. A real pipeline
  * runs an image/audio model here; the kernel keeps the retrieval plan
  * (embed → ANN) production-shaped while staying reproducible in the
  * DuckDB oracle (`ord(text[(i*7) % greatest(length(text),1) + 1])`).
  *
  * Implemented as a [[KernelExpression]] because the equivalent
  * `transform(sequence(...), ...)` higher-order lambda is interpreted
  * per element per row — 64 interpreted `ascii(substring(...))` calls
  * per document dominated the media-search query (4.7 s of its driver
  * bench time). The kernel walks the string's codepoints once and
  * emits a primitive double array.
  *
  * Codepoints, not UTF-16 code units: DuckDB's `text[n]`/`ord` index
  * and read codepoints, so surrogate pairs would diverge under a
  * charAt formulation. An empty payload embeds as the zero vector
  * (the oracle guards the same case explicitly).
  *
  * `dyadic = true` additionally snaps each component to the 2⁻²⁰ grid
  * (`floor(x·2²⁰ + 0.5) / 2²⁰`, the exactness precondition of every
  * trained media index) INSIDE the kernel — the previous post-hoc
  * `transform` lambda re-walked the array interpreted per element in
  * the hot `x5_mm_pq`/`x5_mm_ivf`/`x5_mm_search_pq` paths. Operand
  * order matches the oracle's `floor(x * 1048576 + 0.5) / 1048576.0`
  * with x = cp/255.0, so the doubles are bit-identical to the lambda
  * formulation.
  */
case class MediaEmbed(child: Expression, dim: Int, stride: Int,
                      dyadic: Boolean = false)
    extends KernelExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def kernel(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val cps = s.codePoints().toArray
    val out = new Array[Double](dim)
    if (cps.length > 0) {
      var i = 0
      while (i < dim) {
        val x = cps((i * stride) % cps.length).toDouble / 255.0
        out(i) = if (dyadic) math.floor(x * 1048576 + 0.5) / 1048576.0 else x
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): MediaEmbed = copy(child = c)
}

object MediaEmbed {
  def media_embed(text: Column, dim: Int, stride: Int): Column =
    ColumnBridge.column(MediaEmbed(ColumnBridge.expression(text), dim, stride))

  /** The dyadic-snapped encoder — one kernel pass, no post-hoc lambda. */
  def media_embed_dyadic(text: Column, dim: Int, stride: Int): Column =
    ColumnBridge.column(
      MediaEmbed(ColumnBridge.expression(text), dim, stride, dyadic = true))
}
