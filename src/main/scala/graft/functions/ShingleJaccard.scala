package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaccard similarity of the distinct word-shingle sets of two texts in one
  * imperative pass.
  *
  * Replaces `size(array_intersect(sh_a, sh_b)) / size(array_union(...))`
  * over `shingles(text)` higher-order expressions: those are CodegenFallback
  * and re-evaluate the inlined `split(text, ' ')` for every element_at of
  * every shingle — ~1 ms per pair, which dominated LSH verification. One
  * eval here splits each side once and probes a hash set.
  *
  * Value-identical to the replaced expression: shingle sets are DISTINCT
  * sets (array_distinct semantics), jaccard = |A∩B| / |A∪B| as double, NULL
  * when both sides have no shingles (0/0 division yields NULL in Spark).
  */
case class ShingleJaccard(left: Expression, right: Expression, shingleSize: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_jaccard needs string inputs, got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(l: Any, r: Any): Any =
    ShingleJaccard.compute(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String], shingleSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("jac")
      s"""
         |java.lang.Double $tmp = graft.functions.ShingleJaccard.compute($a, $b, $shingleSize);
         |${ev.isNull} = ($tmp == null);
         |${ev.value} = ${ev.isNull} ? -1.0 : $tmp.doubleValue();
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "shingle_jaccard"
}

object ShingleJaccard {

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(a: UTF8String, b: UTF8String, n: Int): java.lang.Double = {
    val sa = shingleSet(a, n)
    val sb = shingleSet(b, n)
    val (small, large) = if (sa.size < sb.size) (sa, sb) else (sb, sa)
    var inter = 0
    val it = small.iterator()
    while (it.hasNext) if (large.contains(it.next())) inter += 1
    val union = sa.size + sb.size - inter
    if (union == 0) null else java.lang.Double.valueOf(inter.toDouble / union)
  }

  private def shingleSet(t: UTF8String, n: Int): java.util.HashSet[String] = {
    // Spark split(text, ' ') keeps empty tokens (limit -1) — match it.
    val w = t.toString.split(" ", -1)
    val set = new java.util.HashSet[String]()
    var i = 0
    val last = w.length - n
    while (i <= last) {
      val sb = new java.lang.StringBuilder(w(i))
      var k = 1
      while (k < n) { sb.append(' ').append(w(i + k)); k += 1 }
      set.add(sb.toString)
      i += 1
    }
    set
  }

  /** Register `shingle_jaccard(a, b, n)` for SQL use; idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_jaccard",
      exprs => ShingleJaccard(exprs(0), exprs(1),
        Registration.literalInt("shingle_jaccard", "n", exprs(2))),
      "built-in")
}
