package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Document fingerprinting via a polynomial rolling hash (SURVEY §2
  * X3): `acc := (acc * 31 + codeunit) mod P` left-folded over the
  * string, P a prime below 2^53 so `acc * 31 + c` never overflows a
  * signed 64-bit long.
  *
  * Implemented as a native Catalyst `Expression` with `doGenCode` so it
  * participates in whole-stage codegen (no UDF boxing, no codegen
  * fallback) — this is the hot path of content-dedup over billions of
  * documents. For ASCII text the result equals the DuckDB fold
  * `list_reduce(list_transform(string_split(s,''), c -> ord(c)),
  * (a,b) -> (a*31+b) % P)`, which is what the oracle runs.
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
    while (i < s.length) { acc = (acc * 31 + s.charAt(i)) % prime; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |String $s = $c.toString();
         |long $acc = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $acc = ($acc * 31L + $s.charAt($i)) % ${prime}L;
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
