package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit portable hash (SURVEY.md §2.10 tier (b): custom codegen
  * `Expression`). Value-identical to the composed built-in form
  * `conv(substring(md5(c), 1, 15), 16, 10)::long` that the DuckDB oracle
  * twins reproduce — the first 15 hex digits of the MD5 of the UTF-8
  * bytes are exactly the top 60 bits of the first 8 digest bytes read
  * big-endian, so the expression computes `bigEndianLong(digest[0..8]) >>> 4`
  * directly and never materializes the 32-char hex string, the substring,
  * or conv's base-16 parse. Every MinHash / SimHash / fingerprint /
  * LSH-shingle row pays this hash once; at corpus scale it sits inside
  * the explode hot loop, which is why it merits a native expression
  * rather than the 3-built-in chain.
  *
  * Equivalence with the built-in chain is pinned by PortableHashSpec
  * (property test over random strings, plus the oracle hash-matches).
  */
case class Hash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      // binary too: SQL md5(string) carries an implicit string->binary
      // cast, so the NativeHashRewrite capture can hand us either type
      case StringType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hash60 expects string or binary, got $dt")
    }

  override def nullSafeEval(input: Any): Any = java.lang.Long.valueOf(Hash60.hashBytes(
    input match {
      case s: UTF8String => s.getBytes
      case b: Array[Byte] => b
    }))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => child.dataType match {
      case StringType => s"${ev.value} = graft.functions.Hash60.hashBytes($c.getBytes());"
      case _          => s"${ev.value} = graft.functions.Hash60.hashBytes($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Hash60 {
  /** First 60 bits of MD5(bytes): big-endian long of digest[0..7], >>> 4.
    * Called from generated code — keep it static-shaped and allocation-
    * light (one MessageDigest per call is what Spark's own `md5` pays via
    * commons-codec; the win here is skipping hex/substring/conv).
    */
  def hashBytes(bytes: Array[Byte]): Long = {
    val d = org.apache.commons.codec.digest.DigestUtils.md5(bytes)
    val hi =
      ((d(0) & 0xFFL) << 56) | ((d(1) & 0xFFL) << 48) |
      ((d(2) & 0xFFL) << 40) | ((d(3) & 0xFFL) << 32) |
      ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
      ((d(6) & 0xFFL) << 8)  |  (d(7) & 0xFFL)
    hi >>> 4
  }

  import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpr}

  /** Column-level native 60-bit portable hash. */
  def hash60(c: Column): Column = toColumn(Hash60(toExpr(c)))

  /** Register `hash60` for SQL use on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hash60", exprs => Hash60(exprs(0)), "scala_udf")
}
