package graft.functions

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.{ByteType, Decimal, DecimalType, DoubleType, FloatType, IntegerType, LongType, ShortType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Argument validation shared by the SQL `register` shims of the native
  * expressions ([[MinHashSig]], [[SimHashSig]], [[ShingleJaccard]]).
  *
  * The function-registry builder runs at FUNCTION-BUILD time, so a raw
  * `exprs(i).eval().asInstanceOf[Int]` on a column reference or a BIGINT
  * literal surfaces as an unhelpful ClassCastException/NPE deep inside
  * analysis. These helpers check foldability and numeric type first and
  * raise a proper `AnalysisException` (standard `NON_FOLDABLE_ARGUMENT`
  * error condition) naming the function and the offending parameter.
  */
private[functions] object Registration {

  /** Evaluate `e` as a literal Int parameter of `funcName`, widening any
    * integral literal type (TINYINT..BIGINT); analysis error otherwise. */
  def literalInt(funcName: String, paramName: String, e: Expression): Int = {
    def fail(): Nothing = throw new AnalysisException(
      "NON_FOLDABLE_ARGUMENT",
      Map(
        "funcName" -> s"`$funcName`",
        "paramName" -> s"`$paramName`",
        "paramType" -> "\"INT\""))
    val integral = e.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (!e.foldable || !integral) fail()
    e.eval() match {
      case n: Number => n.intValue()
      case _ => fail() // foldable integral evaluating to null
    }
  }

  private def nonFoldable(
      funcName: String, paramName: String, typeName: String): Nothing =
    throw new AnalysisException(
      "NON_FOLDABLE_ARGUMENT",
      Map(
        "funcName" -> s"`$funcName`",
        "paramName" -> s"`$paramName`",
        "paramType" -> s""""$typeName""""))

  /** Evaluate `e` as a literal Long parameter of `funcName`, widening any
    * integral literal type; analysis error otherwise. */
  def literalLong(funcName: String, paramName: String, e: Expression): Long = {
    val integral = e.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (!e.foldable || !integral) nonFoldable(funcName, paramName, "BIGINT")
    e.eval() match {
      case n: Number => n.longValue()
      case _ => nonFoldable(funcName, paramName, "BIGINT")
    }
  }

  /** Evaluate `e` as a literal Double parameter of `funcName`, accepting
    * any numeric literal type (a bare `0.5` parses as DECIMAL(1,1));
    * analysis error otherwise. */
  def literalDouble(funcName: String, paramName: String, e: Expression): Double = {
    val numeric = e.dataType match {
      case ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType | _: DecimalType => true
      case _ => false
    }
    if (!e.foldable || !numeric) nonFoldable(funcName, paramName, "DOUBLE")
    e.eval() match {
      case n: Number => n.doubleValue()
      case d: Decimal => d.toDouble
      case _ => nonFoldable(funcName, paramName, "DOUBLE")
    }
  }

  /** Evaluate `e` as a literal String parameter of `funcName`; analysis
    * error for non-literal or non-string arguments. */
  def literalString(funcName: String, paramName: String, e: Expression): String = {
    if (!e.foldable || e.dataType != StringType)
      nonFoldable(funcName, paramName, "STRING")
    e.eval() match {
      case s: UTF8String => s.toString
      case _ => nonFoldable(funcName, paramName, "STRING")
    }
  }
}
