package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.etl.Extract

/** Table-generating function exposing mixed-content block extraction in SQL
  * (SURVEY §2.9 — the one discretionary Catalyst artifact):
  *
  * {{{
  * SELECT eb.block_type, eb.source_index, eb.payload
  * FROM docs LATERAL VIEW extract_blocks(content) eb
  * }}}
  *
  * One input document row → N typed block rows (the reference's extract()
  * dispatcher, etl_pipeline.py:169-195, as an explode-style Generator).
  * CodegenFallback is standard for generators; the per-row work is the same
  * pure-Scala detector the DataFrame path uses, so SQL and DataFrame callers
  * cannot drift apart.
  */
case class ExtractBlocks(child: Expression)
  extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("block_type", StringType, nullable = false),
    StructField("ordinal", IntegerType, nullable = false),
    StructField("source_index", StringType, nullable = false),
    StructField("payload", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"extract_blocks needs a string document, got ${child.dataType}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else Extract.extractRecords(v.asInstanceOf[UTF8String].toString).map { r =>
      InternalRow(
        UTF8String.fromString(r.kind),
        r.ordinal,
        UTF8String.fromString(r.sourceIndex),
        UTF8String.fromString(r.json))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "extract_blocks"
}

object ExtractBlocks {
  /** Register `extract_blocks(doc)` as a SQL table function; idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "extract_blocks", exprs => ExtractBlocks(exprs.head), "built-in")
}
