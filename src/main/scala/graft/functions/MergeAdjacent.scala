package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One BPE merge application: greedy left-to-right replacement of
  * every non-overlapping adjacent (a, b) token pair with the single
  * merged token `a_b` — the apply step that follows q101's pair
  * counting in a byte-pair-encoding training round (Sennrich et al.
  * 2016; greedy left-to-right is the published scan order, so
  * "x x x" under pair (x,x) merges the FIRST two tokens only).
  * A single generated-code O(len) pass per row, shuffle-free — the
  * window/lag formulation would shuffle every token twice and still
  * need a sequential tie-break for overlaps, which windows cannot
  * express (each merge consumes the next position).
  */
case class MergeAdjacent(tokens: Expression, left: Expression, right: Expression)
    extends TernaryExpression {

  override def first: Expression = tokens
  override def second: Expression = left
  override def third: Expression = right

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult =
    (tokens.dataType, left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), StringType, StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"merge_adjacent requires (array<string>, string, string), got $other")
    }

  override def nullSafeEval(ws: Any, a: Any, b: Any): Any =
    MergeAdjacent.compute(ws.asInstanceOf[ArrayData],
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (ws, a, b) =>
      s"graft.functions.MergeAdjacent.compute($ws, $a, $b)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): MergeAdjacent =
    copy(tokens = newFirst, left = newSecond, right = newThird)

  override def prettyName: String = "merge_adjacent"
}

object MergeAdjacent {
  private val Underscore = UTF8String.fromString("_")

  /** Called from generated code. Greedy left-to-right: a match at i
    * consumes positions i and i+1, so an overlapping match at i+1 is
    * never considered (the BPE scan order).
    */
  def compute(ws: ArrayData, a: UTF8String, b: UTF8String): ArrayData = {
    val n = ws.numElements()
    val out = new java.util.ArrayList[Any](n)
    var i = 0
    while (i < n) {
      val cur = ws.getUTF8String(i)
      if (i < n - 1 && cur != null && cur.equals(a)) {
        val nxt = ws.getUTF8String(i + 1)
        if (nxt != null && nxt.equals(b)) {
          out.add(UTF8String.concat(a, Underscore, b))
          i += 2
        } else { out.add(cur); i += 1 }
      } else { out.add(cur); i += 1 }
    }
    new GenericArrayData(out.toArray)
  }
}
