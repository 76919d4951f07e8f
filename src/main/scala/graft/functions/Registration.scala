package graft.functions

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

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
}
