package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SimHash signature of a text in ONE pass: distinct tokens → 60-bit
  * portable md5 hash each → per-bit ±1 votes → bit b set iff vote > 0.
  *
  * Replaces `(0 until bits).map(b => aggregate(hv, ...)).reduce(_ + _)`
  * over `hv = transform(array_distinct(split(text, ' ')), md5Long)`: each
  * of the 32 aggregates is CodegenFallback and re-evaluates the inlined
  * split+distinct+hash chain, making simhash O(bits × tokens × |text|)
  * interpreted work per row. One eval here splits once, hashes each
  * distinct token once, and accumulates all bit votes in a single walk —
  * turning SimHash into an operator you can run over a full corpus, not
  * just a bounded subset.
  *
  * Value-identical to the replaced expression (and the DuckDB oracle):
  * token hash = first 60 bits of md5(token), votes over DISTINCT tokens,
  * result = Σ (1 << b) over bits with positive vote, as long.
  */
case class SimHashSig(child: Expression, bits: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 60, "bits must be in [1, 60]")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash_sig needs a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    SimHashSig.compute(input.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashSig.compute($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "simhash_sig"
}

object SimHashSig {

  private val digest = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(text: UTF8String, bits: Int): Long = {
    val seen = new java.util.HashSet[String]()
    val votes = new Array[Int](bits)
    val md = digest.get()
    val w = text.toString.split(" ", -1)
    var i = 0
    while (i < w.length) {
      if (seen.add(w(i))) {
        md.reset()
        val d = md.digest(w(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var h = 0L
        var k = 0
        while (k < 7) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
        h = (h << 4) | ((d(7) & 0xf0L) >>> 4)
        var b = 0
        while (b < bits) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** Register `simhash_sig(text, bits)` for SQL use; idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash_sig",
      exprs => SimHashSig(exprs(0),
        Registration.literalInt("simhash_sig", "bits", exprs(1))),
      "built-in")
}
