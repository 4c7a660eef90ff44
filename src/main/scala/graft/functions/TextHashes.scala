package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared 64-bit string hashing for the sketch expressions: FNV-1a
  * over UTF-8 bytes + murmur3 finalizer avalanche. The per-permutation
  * MinHash family is the standard affine re-mix of one strong base
  * hash (one byte-scan per shingle, k cheap mixes) instead of k full
  * hashes — the difference between O(len·k) and O(len + k) per
  * element.
  */
object TextHash {
  def base64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    fmix64(h)
  }

  /** murmur3 64-bit finalizer. */
  def fmix64(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33
    k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33
    k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33
    k
  }
}

/** MinHash signature of an array of strings (shingles): for
  * permutation k, `min over shingles of fmix64(base ^ SEED[k])`.
  * Returns `array<long>` of length `numHashes`.
  *
  * A native expression (vs the transform/array_min/hash built-in
  * composition) because higher-order functions evaluate interpreted —
  * measured 982s → sub-second at sf0.1 for the q46 pipeline. The
  * static `compute` runs one tight loop per row from generated code.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<string>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSignature.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}

object MinHashSignature {
  /** Per-permutation seeds from a splitmix64 stream (deterministic,
    * no RNG state at eval time).
    */
  private def seeds(n: Int): Array[Long] = {
    val out = new Array[Long](n)
    var x = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < n) {
      x += 0x9e3779b97f4a7c15L
      out(i) = TextHash.fmix64(x)
      i += 1
    }
    out
  }
  private val MaxSeeds = 512
  private val Seeds = seeds(MaxSeeds)

  /** Called from generated code — one pass over the shingles, k mixes
    * per shingle.
    */
  def compute(arr: ArrayData, numHashes: Int): ArrayData = {
    require(numHashes <= MaxSeeds)
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val base = TextHash.base64(arr.getUTF8String(i))
      var k = 0
      while (k < numHashes) {
        val h = TextHash.fmix64(base ^ Seeds(k))
        if (h < mins(k)) mins(k) = h
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** 64-bit SimHash of an array of strings (tokens): majority vote per
  * bit over the tokens' 64-bit hashes. Native for the same reason as
  * [[MinHashSignature]] — the built-in fold is a 64-wide interpreted
  * lambda per token.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash64 requires array<string>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {
  def compute(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = TextHash.base64(arr.getUTF8String(i))
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) sim |= (1L << j)
      j += 1
    }
    sim
  }
}
