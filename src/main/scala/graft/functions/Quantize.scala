package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructType}

/** Int8 quantization statistics of a double vector in ONE compiled
  * pass: (scale, q_l1, q_sum, q_max) where scale = max|v|/127 and
  * qᵢ = clamp(⌊vᵢ/scale + 0.5⌋, ±127). Replaces the higher-order
  * `transform`/`aggregate` formulation, which evaluated six
  * interpreted lambdas per row (the hot per-element loop belongs in a
  * kernel — the repo invariant that retired the SimHash lambdas).
  * Arithmetic matches the DuckDB oracle term for term: double
  * division, floor(x + 0.5) (half-up incl. negatives, where engine
  * `round` tie rules differ), clamping in double before the long
  * cast. A zero (or empty) vector quantizes to all-zero counters. */
case class QuantizeStats(child: Expression) extends KernelExpression {
  override def dataType: DataType = QuantizeStats.schema

  override def kernel(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var amax = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(v.getDouble(i)); if (a > amax) amax = a; i += 1
    }
    val scale = amax / 127.0
    var l1 = 0L
    var sum = 0L
    var qmax = 0L
    if (scale != 0.0) {
      i = 0
      while (i < n) {
        val q0 = math.floor(v.getDouble(i) / scale + 0.5)
        val q = math.min(math.max(q0, -127.0), 127.0).toLong
        l1 += math.abs(q); sum += q; if (i == 0 || q > qmax) qmax = q
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](scale, l1, sum, qmax))
  }

  override protected def withNewChildInternal(c: Expression): QuantizeStats =
    copy(child = c)
}

object QuantizeStats {
  val schema: StructType = new StructType()
    .add("scale", DoubleType, nullable = false)
    .add("q_l1", LongType, nullable = false)
    .add("q_sum", LongType, nullable = false)
    .add("q_max", LongType, nullable = false)

  def quantize_stats(v: Column): Column =
    ColumnBridge.column(QuantizeStats(ColumnBridge.expression(v)))
}

/** Full int8 encode of a double vector: (scale, q) with the SAME
  * arithmetic as [[QuantizeStats]] (scale = max|v|/127, half-up
  * clamp to ±127) but returning the code VECTOR — the stored-artifact
  * form scalar-quantized ANN searches against. Codes are emitted as
  * exact small doubles (|q| ≤ 127) so the codegen'd DotProduct
  * consumes them directly: a dim-64 int8 inner product is ≤ 2²⁰,
  * exactly representable, so double accumulation is integer-exact on
  * both engines. One compiled pass per row, no per-element lambda. */
case class SqEncode(child: Expression) extends KernelExpression {
  override def dataType: DataType = SqEncode.schema

  override def kernel(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var amax = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(v.getDouble(i)); if (a > amax) amax = a; i += 1
    }
    val scale = amax / 127.0
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      out(i) =
        if (scale == 0.0) 0.0
        else math.min(math.max(
          math.floor(v.getDouble(i) / scale + 0.5), -127.0), 127.0)
      i += 1
    }
    new GenericInternalRow(Array[Any](scale,
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)))
  }

  override protected def withNewChildInternal(c: Expression): SqEncode =
    copy(child = c)
}

object SqEncode {
  import org.apache.spark.sql.types.ArrayType
  val schema: StructType = new StructType()
    .add("scale", DoubleType, nullable = false)
    .add("q", ArrayType(DoubleType, containsNull = false), nullable = false)

  def sq_encode(v: Column): Column =
    ColumnBridge.column(SqEncode(ColumnBridge.expression(v)))
}

/** Sign-bit binarization of a double vector into two 32-bit words:
  * bit i of w0 (dims 0–31) / w1 (dims 32–63) is set iff vᵢ > 0 —
  * the 32×-compression binary-embedding code whose Hamming distance
  * approximates angle (Charikar sign hashes at full rank). Two
  * uint32 words instead of one int64 so neither engine touches the
  * sign bit (DuckDB and Spark differ on int64 `1<<63` semantics);
  * both words are non-negative and xor/bit_count stay exact. Dims
  * past 64 are ignored by contract (embedding dim = 64).
  * `threshold` shifts the sign plane (bit set iff vᵢ > threshold) —
  * the [0,1]-domain media stub centers with threshold 0.5 INSIDE this
  * one compiled pass instead of a per-element `transform(_ − 0.5)`
  * lambda (the hot-loop invariant); `v > t` ≡ `(v − t) > 0` exactly,
  * so the centered-oracle SQL is unchanged. */
case class SignPack(child: Expression, threshold: Double) extends KernelExpression {
  override def dataType: DataType = SignPack.schema

  override def kernel(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), 64)
    var w0 = 0L
    var w1 = 0L
    var i = 0
    while (i < n) {
      if (v.getDouble(i) > threshold) {
        if (i < 32) w0 |= (1L << i) else w1 |= (1L << (i - 32))
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](w0, w1))
  }

  override protected def withNewChildInternal(c: Expression): SignPack =
    copy(child = c)
}

object SignPack {
  val schema: StructType = new StructType()
    .add("w0", LongType, nullable = false)
    .add("w1", LongType, nullable = false)

  def sign_pack(v: Column, threshold: Double = 0.0): Column =
    ColumnBridge.column(SignPack(ColumnBridge.expression(v), threshold))
}

/** Dyadic-grid residual of a vector against a centroid in ONE compiled
  * pass: rᵢ = ⌊(vᵢ − cᵢ)·2²⁰ + 0.5⌋ / 2²⁰ (half-up, incl. negatives)
  * over min(len) elements — the exactness device that makes PQ
  * training on IVF residuals fold-order-free cross-engine: raw
  * residuals `v − round6(centroid)` have full-length mantissas (round6
  * is decimal, not binary), so their Lloyd mean-sums would drift with
  * fold order; snapped to the 2⁻²⁰ grid every residual is k·2⁻²⁰ with
  * |k| ≲ 2²¹, partial sums stay exact integers scaled by 2⁻²⁰, and
  * the trained codebook is bit-identical on both engines (the media
  * dyadic-embed discipline applied to residual encoding). The
  * subtraction and ×2²⁰ (a power of two) are single exact-or-
  * correctly-rounded IEEE ops, identical in Spark and DuckDB. */
case class ResidualDyadic(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.types.ArrayType

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private def compute(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val c = b.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), c.numElements())
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = math.floor((v.getDouble(i) - c.getDouble(i)) * 1048576.0 + 0.5) / 1048576.0
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(a: Any, b: Any): Any = compute(a, b)

  /** Codegen calls back into the compiled kernel via a bound reference
    * (the KernelExpression pattern) — keeps the whole-stage span alive
    * without generating array construction inline. */
  def kernel(a: Any, b: Any): Any = compute(a, b)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("residualExpr", this, classOf[ResidualDyadic].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.kernel($a, $b);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ResidualDyadic = copy(left = newLeft, right = newRight)
}

object ResidualDyadic {
  def residual_dyadic(v: Column, c: Column): Column =
    ColumnBridge.column(
      ResidualDyadic(ColumnBridge.expression(v), ColumnBridge.expression(c)))
}
