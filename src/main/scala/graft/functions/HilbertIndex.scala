package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of a 2-D point (order 21: coordinates in
  * [0, 2^21) — matching the 21-bit-per-dimension Morton interleave it
  * is benchmarked against in q242, and covering TPC-H part keys to
  * sf10; order 16 threw on l_partkey past sf≈0.33) — the
  * space-filling curve with strictly better
  * locality than Morton/Z (no Z-seam jumps: consecutive curve
  * positions are always grid neighbors), which is why Delta/Iceberg
  * offer Hilbert clustering next to Z-ORDER. Standard xy2d bit
  * transform (rotate-and-reflect per quadrant, cf. the public-domain
  * formulation on the Hilbert-curve Wikipedia page); pure integer
  * ops, codegen'd via a static call, and mirrored relationally in
  * DuckDB as an (Order+1)-level recursive CTE over the identical
  * recurrence (q242's oracle) so the engine value is hash-verified
  * bit-for-bit.
  */
case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hilbert_index requires (bigint, bigint), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    HilbertIndex.compute(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.HilbertIndex.compute($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  /** Bits per dimension; 2^21 × 2^21 grid, 42-bit curve positions
    * (the same per-dimension width as q104's Morton `Bits`).
    */
  val Order = 21

  def compute(x0: Long, y0: Long): Long = computeAtOrder(Order, x0, y0)

  /** Order-parametric form; the spec proves the order-3 curve is
    * bijective with unit-step adjacency, which pins the recurrence.
    */
  def computeAtOrder(order: Int, x0: Long, y0: Long): Long = {
    require(x0 >= 0 && x0 < (1L << order) && y0 >= 0 && y0 < (1L << order),
      s"hilbert_index: coordinate ($x0, $y0) outside [0, 2^$order = ${1L << order}) — " +
        s"the order-$order grid covers TPC-H part keys to ~sf${(1L << order) / 200000} " +
        "(200k parts/sf); raise HilbertIndex.Order (≤ 31 for a 62-bit curve position) " +
        "to cover a larger key domain")
    var x = x0; var y = y0; var d = 0L
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
