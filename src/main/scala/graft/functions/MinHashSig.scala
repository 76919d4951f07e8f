package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All `numPerms` MinHash signature values of a text in ONE pass:
  * split → word shingles → per-shingle salted md5 → running min per perm.
  *
  * Replaces `(0 until p).map(i => array_min(transform(shingles(text), ...)))`:
  * higher-order array functions are CodegenFallback, and the inlined
  * `split(text, ' ')` sub-expression re-evaluates for EVERY element_at of
  * every shingle of every permutation — measured minutes for 5k docs × 16
  * perms where this expression takes well under a second. One eval here
  * does one split, one shingle walk, p digests per shingle.
  *
  * Bit-for-bit identical to the replaced expression and to the DuckDB
  * oracle: hash = first 60 bits (15 hex chars) of md5("<perm>:" + shingle),
  * shingles joined with single spaces, split keeping empty tokens
  * (Spark `split(text, ' ')` semantics). Returns NULL when the text has
  * fewer than `shingleSize` tokens (no shingles exist).
  */
case class MinHashSig(child: Expression, numPerms: Int, shingleSize: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[UTF8String], numPerms, shingleSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinHashSig.compute($c, $numPerms, $shingleSize);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHashSig {

  private val digest = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(text: UTF8String, numPerms: Int, shingleSize: Int): ArrayData = {
    // Spark's split(text, ' ') keeps empty tokens (limit -1) — match it.
    val w = text.toString.split(" ", -1)
    val last = w.length - shingleSize
    if (last < 0) return null
    val md = digest.get()
    val mins = Array.fill(numPerms)(Long.MaxValue)
    val salts = saltBytes(numPerms)
    var i = 0
    while (i <= last) {
      val sb = new java.lang.StringBuilder(w(i))
      var k = 1
      while (k < shingleSize) { sb.append(' ').append(w(i + k)); k += 1 }
      val shingle = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var p = 0
      while (p < numPerms) {
        md.reset()
        md.update(salts(p))
        md.update(shingle)
        val h = first60Bits(md.digest())
        if (h < mins(p)) mins(p) = h
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** First 15 hex chars of the digest as a long — the portable 60-bit hash
    * (PortableHash.md5Long / the oracle's CAST('0x'||substr(md5,1,15))). */
  private def first60Bits(d: Array[Byte]): Long = {
    var v = 0L
    var k = 0
    while (k < 7) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  private val saltCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()
  private def saltBytes(numPerms: Int): Array[Array[Byte]] =
    saltCache.computeIfAbsent(numPerms, n =>
      Array.tabulate(n)(p => s"$p:".getBytes(java.nio.charset.StandardCharsets.UTF_8)))

  /** Register `minhash_sig(text, perms, shingle)` for SQL use; idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig",
      exprs => MinHashSig(exprs(0),
        Registration.literalInt("minhash_sig", "perms", exprs(1)),
        Registration.literalInt("minhash_sig", "shingle", exprs(2))),
      "built-in")
}
