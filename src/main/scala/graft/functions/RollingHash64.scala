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

/** Engine-portable rolling fingerprint (q43c): two Horner folds mod
  * the prime 1000003 with bases 31/37, combined as `h31·p + h37`
  * (~10^12 space; expected collisions over a 5k-doc corpus ≈ 10^-5).
  * Unlike [[RollingHash64]]'s wrapping 64-bit arithmetic — an ERROR,
  * not a wrap, in DuckDB — every intermediate here stays < 2^63, so
  * the oracle re-derives the exact value relationally: Horner's rule
  * as a power-weighted character sum joined to a recursively built
  * `B^e mod p` table.
  */
case class RollingHashMod(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash_mod requires a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    RollingHashMod.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHashMod.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHashMod =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash_mod"
}

object RollingHashMod {
  final val P: Long = 1000003L

  /** Called from generated code. */
  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h31 = 0L
    var h37 = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xffL
      h31 = (h31 * 31 + b) % P
      h37 = (h37 * 37 + b) % P
      i += 1
    }
    h31 * P + h37
  }
}
