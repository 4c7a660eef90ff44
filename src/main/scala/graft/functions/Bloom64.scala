package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types._

/** Engine-portable Bloom filter over 64-bit double hashing: bit
  * positions for a key are `(h1 + i·h2) mod m` for i < k (Kirsch &
  * Mitzenmacher, "Less Hashing, Same Performance", ESA'06), with
  * h1/h2 taken from the two md5 halves of the key. Because every
  * ingredient (md5, integer arithmetic) is engine-identical, the
  * exact bit pattern — and therefore every membership answer — is
  * reproducible outside Spark, which is what lets the q73 oracle
  * re-derive membership relationally in DuckDB. (Spark's built-in
  * `BloomFilterAggregate` hashes with xxhash64 internals and can't be
  * cross-checked that way.)
  */
object Bloom64 {

  /** Set key (h1,h2)'s k bits in a little-endian long-array bitmap.
    * floorMod (not %): the SQL-registered `bloom_might_contain` accepts
    * arbitrary bigints, and a negative hash (or signed overflow of
    * h1 + i·h2) under Java's signed remainder would index out of
    * bounds. For the 60-bit positive md5 halves the internal callers
    * feed, floorMod ≡ %, so existing bitmaps are unchanged.
    */
  def set(bits: Array[Long], h1: Long, h2: Long, m: Int, k: Int): Unit = {
    var i = 0
    while (i < k) {
      val p = java.lang.Math.floorMod(h1 + i * h2, m.toLong).toInt
      bits(p >> 6) |= 1L << (p & 63)
      i += 1
    }
  }

  /** Called from generated code. */
  def mightContain(bits: ArrayData, h1: Long, h2: Long, m: Int, k: Int): Boolean = {
    var i = 0
    while (i < k) {
      val p = java.lang.Math.floorMod(h1 + i * h2, m.toLong).toInt
      if ((bits.getLong(p >> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** Typed aggregator building an m-bit Bloom filter from (h1, h2) key
  * hashes. Bitwise OR is associative/commutative, so partial
  * aggregation and merge are exact at any parallelism, and the whole
  * blocklist — however many rows — reduces to one `m/8`-byte sketch
  * row that broadcasts for map-side membership tests.
  */
case class BloomAgg(m: Int, k: Int)
    extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
  require(m % 64 == 0, "bloom bit count must be a multiple of 64")

  override def zero: Array[Long] = new Array[Long](m / 64)

  override def reduce(buf: Array[Long], key: (Long, Long)): Array[Long] = {
    Bloom64.set(buf, key._1, key._2, m, k)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

/** `bloom_might_contain(bitmap, h1, h2)` — true iff all k double-hash
  * positions of (h1, h2) are set in the bitmap. Codegen'd bit math;
  * the bitmap side is expected to come from a 1-row broadcast of
  * [[BloomAgg]]'s output.
  */
case class BloomMightContain(
    bitmap: Expression, h1: Expression, h2: Expression, m: Int, k: Int)
    extends TernaryExpression {

  override def first: Expression = bitmap
  override def second: Expression = h1
  override def third: Expression = h2

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (bitmap.dataType, h1.dataType, h2.dataType) match {
      case (ArrayType(LongType, _), LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires (array<bigint>, bigint, bigint), got $other")
    }

  override def nullSafeEval(bits: Any, a: Any, b: Any): Any =
    Bloom64.mightContain(bits.asInstanceOf[ArrayData],
      a.asInstanceOf[Long], b.asInstanceOf[Long], m, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (bits, a, b) =>
      s"graft.functions.Bloom64.mightContain($bits, $a, $b, $m, $k)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BloomMightContain =
    copy(bitmap = newFirst, h1 = newSecond, h2 = newThird)

  override def prettyName: String = "bloom_might_contain"
}
