package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Document fingerprinting via a polynomial rolling hash (SURVEY §2
  * X3): `acc := (acc * 31 + codepoint) mod P` left-folded over the
  * string's Unicode CODEPOINTS, P a prime below 2^53 so
  * `acc * 31 + c` (c ≤ 0x10FFFF) never overflows a signed 64-bit long.
  *
  * Implemented as a native Catalyst `Expression` with `doGenCode` so it
  * participates in whole-stage codegen (no UDF boxing, no codegen
  * fallback) — this is the hot path of content-dedup over billions of
  * documents. Codepoints, not UTF-16 code units: DuckDB's
  * `string_split(s,'')`/`ord` iterate codepoints, so a charAt fold
  * would diverge on every non-Latin script and surrogate pair. The
  * result equals the oracle fold
  * `list_reduce(list_transform(string_split(s,''), c -> ord(c)),
  * (a,b) -> (a*31+b) % P)` for ALL text.
  */
case class RollingHash(child: Expression, prime: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash requires a string argument, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % prime
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val acc = ctx.freshName("acc")
      s"""
         |String $s = $c.toString();
         |long $acc = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $acc = ($acc * 31L + $cp) % ${prime}L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** Default prime: largest prime below 2^53 / 31 would be over-careful;
    * 9007199254740881 (largest prime < 2^53) keeps `acc*31 + 0xFFFF`
    * < 2^58, safely inside Long. */
  val DefaultPrime = 9007199254740881L

  def rolling_hash(c: Column): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c), DefaultPrime))
}
