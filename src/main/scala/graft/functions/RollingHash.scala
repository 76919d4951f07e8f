package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint:
  * `acc_i = (acc_{i-1} * mult + codepoint_i) mod modulus`, acc_0 = 0.
  *
  * A native Catalyst `Expression` with `doGenCode` so it participates in
  * whole-stage codegen — no UDF serialization, no codegen fences in the hot
  * path (the preference order of SURVEY §2.9: built-ins > native Expression >
  * UDF). With the default modulus 1e9+7 the accumulator stays ≪ 2^63, so the
  * arithmetic is overflow-free and portable (the DuckDB oracle reproduces it
  * with list_reduce over codepoints).
  *
  * Deterministic per byte of input → usable as a cheap content fingerprint
  * for exact-dup detection and as a shingle hash for near-dup pipelines.
  */
case class RollingHash(
    child: Expression,
    mult: Long = 31L,
    modulus: Long = 1000000007L)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash needs a string argument, got ${child.dataType}")
  }

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    // iterate Unicode CODEPOINTS, not UTF-16 units: the oracle (DuckDB
    // ascii(substr)) sees codepoints, and surrogate pairs would diverge
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * mult + cp) % modulus
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
         |for (int $i = 0; $i < $s.length(); ) {
         |  int $cp = $s.codePointAt($i);
         |  $acc = ($acc * ${mult}L + $cp) % ${modulus}L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash"
}

object RollingHash {
  /** Register `rolling_hash(str)` for SQL + call_function use; idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHash(exprs.head), "built-in")
}
