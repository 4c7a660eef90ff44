package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Random-hyperplane LSH bucket keys for one `array<double>` vector:
  * `numTables` independent tables of `planesPerTable` sign bits each —
  * returns `array<int>` of length `numTables`.
  *
  * BIT-IDENTICAL to the interpreted
  * `transform(aggregate(zip_with(...)))` composition it replaces
  * (ext/Similarity.scala): hyperplane component (t, p, d) is
  * `pmod(murmur3(t·65536 + p·1024 + d, seed=42), 1000)/1000 − 0.5` —
  * the same derivation Spark's `hash()` built-in performs on an int —
  * and the projection folds left-to-right over d in double precision,
  * so every bucket key (and therefore q49/q51b candidate set and the
  * ExtSpec recall numbers) is unchanged. Native because the lambda
  * soup evaluates interpreted: tables × planes × 64 dims of boxed ops
  * per vector (the CollapseRuns / MinHashSignature precedent — those
  * measured 7.7× and ~3 orders respectively). The hyperplane family
  * additionally hoists out of the per-row loop entirely: weights
  * depend only on (numTables, planesPerTable), so they are computed
  * once per JVM and the per-row cost drops to tables × planes dot
  * products.
  */
case class LshBuckets(child: Expression, numTables: Int, planesPerTable: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lsh_buckets requires array<double>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    LshBuckets.compute(input.asInstanceOf[ArrayData], numTables, planesPerTable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LshBuckets.compute($c, $numTables, $planesPerTable)")

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)

  override def prettyName: String = "lsh_buckets"
}

object LshBuckets {

  /** Embedding dimensionality the hyperplane family covers (matches
    * the `sequence(0, 63)` in the interpreted original).
    */
  private val Dims = 64

  /** Hyperplane weights for one (numTables, planesPerTable) config,
    * laid out [t][p·Dims + d]. Deterministic in the parameters, so the
    * per-JVM cache is safe across executors and across queries.
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  private def planes(numTables: Int, planesPerTable: Int): Array[Array[Double]] =
    cache.computeIfAbsent((numTables, planesPerTable), { case (nt, pp) =>
      Array.tabulate(nt) { t =>
        val w = new Array[Double](pp * Dims)
        var p = 0
        while (p < pp) {
          var d = 0
          while (d < Dims) {
            val h = Murmur3_x86_32.hashInt(t * 65536 + p * 1024 + d, 42)
            // pmod(h, 1000)/1000 − 0.5, exactly as the hash()-derived
            // column formulation computed it
            w(p * Dims + d) = (((h % 1000) + 1000) % 1000) / 1000.0 - 0.5
            d += 1
          }
          p += 1
        }
        w
      }
    })

  /** Called from generated code. Left-to-right double folds — do NOT
    * reorder: bucket parity with the interpreted original depends on
    * the exact accumulation order.
    *
    * The hyperplane family is defined over exactly [[Dims]]-dim
    * vectors; any other length throws rather than silently diverging
    * from the interpreted reference (which null-poisons short vectors
    * to bucket 0 and mixes hash(null) terms into long ones — garbage
    * either way, so loud beats quiet).
    */
  def compute(vec: ArrayData, numTables: Int, planesPerTable: Int): ArrayData = {
    val n = vec.numElements()
    if (n != Dims)
      throw new IllegalArgumentException(
        s"lsh_buckets requires $Dims-dim vectors, got $n elements")
    val w = planes(numTables, planesPerTable)
    val out = new Array[Int](numTables)
    var t = 0
    while (t < numTables) {
      val wt = w(t)
      var key = 0
      var p = 0
      while (p < planesPerTable) {
        var proj = 0.0
        var d = 0
        while (d < Dims) {
          proj += vec.getDouble(d) * wt(p * Dims + d)
          d += 1
        }
        if (proj >= 0) key += (1 << p)
        p += 1
      }
      out(t) = key
      t += 1
    }
    new GenericArrayData(out)
  }
}
