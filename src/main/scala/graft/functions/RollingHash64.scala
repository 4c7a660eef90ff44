package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit rolling polynomial hash (`h = h * 1000003 + byte`, wrapping
  * — FNV-style) over a string's UTF-8 bytes: the document-fingerprint
  * primitive for exact dedup at scale where a 16-byte md5 hex string
  * is wastefully wide.
  *
  * Implemented as a native Catalyst `Expression` WITH `doGenCode` (not
  * a Scala UDF) so it participates in whole-stage codegen — the hot
  * path stays a single generated loop per row, no boxing, no
  * serialization boundary. Pattern follows Spark's own
  * `o.a.s.sql.catalyst.expressions.XxHash64` (public source).
  */
case class RollingHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash64 requires a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    RollingHash64.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash64"
}

object RollingHash64 {
  final val Seed: Long = 1469598103934665603L // FNV-1a offset basis
  final val Prime: Long = 1000003L

  /** Called from both interpreted eval and generated Java code. */
  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h     = Seed
    var i     = 0
    while (i < bytes.length) {
      h = h * Prime + (bytes(i) & 0xffL)
      i += 1
    }
    h
  }
}
