package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native signature kernels for the dedup family (SURVEY §2 X4).
  *
  * The declarative formulations (nested `transform`/`aggregate`
  * higher-order functions) are semantically right but interpret a
  * lambda per array element per row — measured 7-9 s per evaluation at
  * sf0.1 just for SimHash. These expressions compute the identical
  * values (same md5-derived 60-bit hashes, same permutation and bit
  * arithmetic, so the DuckDB oracle still matches bit-for-bit) in
  * compiled JVM loops, invoked from whole-stage codegen via a bound
  * reference — per-row method call, per-element straight-line code.
  */
object TextSignatures {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex chars of md5 as unsigned long — identical to Spark
    * `conv(substring(md5(s),1,15),16,10)` and DuckDB
    * `('0x'||substr(md5(s),1,15))::BIGINT`. */
  def md5Hash60(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val bytes = d.digest(s.getBytes)
    // first 7.5 bytes → 60 bits, matching the leading 15 hex chars
    var acc = 0L
    var i = 0
    while (i < 7) { acc = (acc << 8) | (bytes(i) & 0xffL); i += 1 }
    (acc << 4) | ((bytes(7) & 0xf0L) >> 4)
  }

  /** Distinct word n-gram shingles, first-occurrence order (same set as
    * `array_distinct(transform(...))` over a single-space split). */
  def shingleStrings(text: UTF8String, n: Int): Array[UTF8String] = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < n) return Array.empty
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[UTF8String](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    out
  }

  def shingleHashes(text: UTF8String, n: Int, mod: Long): Array[Long] = {
    val sh = shingleStrings(text, n)
    val out = new Array[Long](sh.length)
    var i = 0
    while (i < sh.length) {
      val h = md5Hash60(sh(i))
      out(i) = if (mod > 0) h % mod else h
      i += 1
    }
    out
  }
}

/** Base for expressions that run a compiled kernel from codegen via a
  * bound object reference (keeps the whole-stage span alive without
  * generating the loop inline). */
trait KernelExpression extends UnaryExpression {
  /** The kernel, called with the non-null child value. */
  def kernel(input: Any): Any

  override def nullSafeEval(input: Any): Any = kernel(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kernelExpr", this, classOf[KernelExpression].getName)
    import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
    val javaType = CodeGenerator.javaType(dataType)
    nullSafeCodeGen(ctx, ev, c =>
      if (CodeGenerator.isPrimitiveType(dataType)) {
        // kernel() returns a boxed value; a direct (long) cast of Object
        // fails janino compilation and silently drops the whole stage to
        // interpreted execution — unbox through the boxed type instead
        val boxed = CodeGenerator.boxedType(dataType)
        s"${ev.value} = (($boxed) $ref.kernel($c)).${javaType}Value();"
      } else {
        s"${ev.value} = ($javaType) $ref.kernel($c);"
      })
  }
}

/** Distinct word n-gram shingles of a single-space-joined text. */
case class WordShingles(child: Expression, n: Int) extends KernelExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def kernel(input: Any): Any =
    new GenericArrayData(
      TextSignatures.shingleStrings(input.asInstanceOf[UTF8String], n)
        .asInstanceOf[Array[Any]])
  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
}

/** 60-bit md5 hashes of the distinct n-gram shingles, optionally mod a
  * prime (0 = no mod). */
case class ShingleHashes(child: Expression, n: Int, mod: Long) extends KernelExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def kernel(input: Any): Any =
    new GenericArrayData(TextSignatures.shingleHashes(input.asInstanceOf[UTF8String], n, mod))
  override protected def withNewChildInternal(c: Expression): ShingleHashes = copy(child = c)
}

/** SimHash over an array of 60-bit hashes: bit i of the result is set
  * iff Σ over hashes of (±1 per bit i) is positive. */
case class SimHash(child: Expression, bits: Int) extends KernelExpression {
  override def dataType: DataType = LongType
  override def kernel(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    var acc = 0L
    var i = 0
    while (i < bits) {
      var cnt = 0
      var j = 0
      while (j < n) {
        cnt += (if (((hs.getLong(j) >> i) & 1L) == 1L) 1 else -1)
        j += 1
      }
      if (cnt > 0) acc |= 1L << i
      i += 1
    }
    acc
  }
  override protected def withNewChildInternal(c: Expression): SimHash = copy(child = c)
}

/** MinHash signature: sig(i) = min over hashes h of (a_i·h + b_i) mod
  * prime, with LCG-mixed permutation constants
  * a_i = ((1103515245·(i+1) + 12345) mod (prime−1)) + 1,
  * b_i = (1103515245·(i+17) + 54321) mod prime.
  * Small sequential multipliers (2i+1) would let the globally smallest
  * shingle hash win every permutation, collapsing the signature to an
  * arithmetic progression — large mixed multipliers make each
  * permutation's argmin independent, which is what LSH banding needs.
  * Null entries (empty input) mirror `array_min` of an empty array. */
case class MinHashSig(child: Expression, numPerms: Int, prime: Long)
    extends KernelExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def kernel(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n == 0) return new GenericArrayData(Array.fill[Any](numPerms)(null))
    val out = new Array[Any](numPerms)
    var i = 0
    while (i < numPerms) {
      val a = (1103515245L * (i + 1) + 12345L) % (prime - 1) + 1
      val b = (1103515245L * (i + 17) + 54321L) % prime
      var best = Long.MaxValue
      var j = 0
      while (j < n) {
        // reduce the hash mod prime BEFORE multiplying: callers pass
        // pre-reduced hashes (identity then), but a raw 60-bit hash
        // times a ~2^31 multiplier would silently overflow Long
        val hv = hs.getLong(j) % prime
        val v = (a * hv + b) % prime
        if (v < best) best = v
        j += 1
      }
      out(i) = best
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

/** Per-list stopword counts over a single-space token split — ONE
  * compiled pass over the tokens instead of one interpreted
  * higher-order `filter` lambda per language per row (the langId hot
  * path; round-11 showed those five lambdas 8× slower under JIT
  * pressure). Counts include duplicates, exactly matching
  * `size(filter(split(text,' '), t => t.isin(list)))` per list, so the
  * DuckDB oracles are unchanged. Tokens may belong to several lists
  * (bitmask membership), though the shipped lists are disjoint. */
case class StopwordCounts(child: Expression, lists: Seq[Seq[String]])
    extends KernelExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val masks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    lists.zipWithIndex.foreach { case (ws, i) =>
      ws.foreach { w =>
        m.put(w, Integer.valueOf(m.getOrDefault(w, 0).intValue() | (1 << i)))
      }
    }
    m
  }

  override def kernel(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val out = new Array[Long](lists.length)
    var i = 0
    while (i < toks.length) {
      val m = masks.get(toks(i))
      if (m ne null) {
        var mask = m.intValue()
        while (mask != 0) {
          out(java.lang.Integer.numberOfTrailingZeros(mask)) += 1L
          mask &= mask - 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): StopwordCounts = copy(child = c)
}

/** Sign-LSH bucket ids for a double vector: bucket of table t =
  * Σ_j (1<<j) over bits j where dot(v, hyperplane(t·bits + j)) > 0,
  * with the LCG-derived hyperplane components
  * hp(p, d) = ((1103515245·(p·dim + d) + 12345) mod 2^31) / 2^31 − 0.5
  * (reproduced literally by the DuckDB oracle; dots fold in ascending
  * d, the same sequential order as DotProduct, so every sign decision
  * is bit-identical).
  *
  * One compiled kernel instead of numTables·bits inline DotProduct
  * expressions against 64-element literal arrays — the inline form
  * generates thousands of lines of janino source per operator, paying
  * seconds of codegen compile per query and blowing past JIT inlining
  * budgets. */
case class LshBuckets(child: Expression, numTables: Int, bitsPerTable: Int, dim: Int,
                      center: Double = 0.0)
    extends KernelExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val planes: Array[Array[Double]] =
    Array.tabulate(numTables * bitsPerTable) { p =>
      Array.tabulate(dim) { d =>
        ((1103515245L * (p * dim + d) + 12345L) % 2147483648L).toDouble /
          2147483648.0 - 0.5
      }
    }

  override def kernel(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val out = new Array[Int](numTables)
    var t = 0
    while (t < numTables) {
      var bucket = 0
      var j = 0
      while (j < bitsPerTable) {
        val hp = planes(t * bitsPerTable + j)
        var acc = 0.0
        var d = 0
        while (d < n) { acc += (v.getDouble(d) - center) * hp(d); d += 1 }
        if (acc > 0) bucket |= 1 << j
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): LshBuckets = copy(child = c)
}

object TextSignatureColumns {
  import ColumnBridge.{column => toCol, expression => toExpr}
  def word_shingles(text: Column, n: Int): Column = toCol(WordShingles(toExpr(text), n))
  def shingle_hashes(text: Column, n: Int, mod: Long): Column =
    toCol(ShingleHashes(toExpr(text), n, mod))
  def simhash64(hashes: Column, bits: Int = 60): Column = toCol(SimHash(toExpr(hashes), bits))
  def stopword_counts(text: Column, lists: Seq[Seq[String]]): Column =
    toCol(StopwordCounts(toExpr(text), lists))
  def minhash_sig(hashes: Column, numPerms: Int, prime: Long): Column =
    toCol(MinHashSig(toExpr(hashes), numPerms, prime))
  def lsh_buckets(v: Column, numTables: Int, bitsPerTable: Int, dim: Int,
                  center: Double = 0.0): Column =
    toCol(LshBuckets(toExpr(v), numTables, bitsPerTable, dim, center))
}
